"""Pre-convert torch BLIP/CLIP checkpoints to vidil_tpu npz pytrees.

The CLIs convert .pth lazily at load time; this tool materializes the
converted pytree once so subsequent loads skip torch entirely.

Usage:
  python tools/convert_checkpoints.py --kind blip_decoder \
      --ckpt ckpt/finetuned/model_base_caption_capfilt_large.pth \
      --vit base --image_size 384 --out ckpt/converted/captioner
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vidil_tpu.config import CLIPConfig, MedConfig, ViTConfig
from vidil_tpu.models import convert
from vidil_tpu.utils.checkpoint import save_checkpoint

KINDS = {
    "blip_decoder": convert.convert_blip_decoder,
    "blip_itm": convert.convert_blip_itm,
    "blip_retrieval": convert.convert_blip_retrieval,
    "blip_vqa": convert.convert_blip_vqa,
}

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--kind", choices=list(KINDS) + ["clip"], required=True)
    parser.add_argument("--ckpt", required=True, help="torch .pth/.bin path")
    parser.add_argument("--out", required=True, help="output npz path (no ext)")
    parser.add_argument("--vit", default="base")
    parser.add_argument("--image_size", type=int, default=384)
    parser.add_argument("--med_config", default="configs/med_config.json")
    parser.add_argument("--clip_arch", default="vit_l_14", choices=["vit_l_14", "vit_b_32"])
    args = parser.parse_args()

    sd = convert.load_torch_state_dict(args.ckpt)
    if args.kind == "clip":
        cfg = getattr(CLIPConfig, args.clip_arch)()
        params = convert.convert_clip(sd, cfg)
    else:
        vit_cfg = ViTConfig.from_name(args.vit, args.image_size)
        med_cfg = MedConfig.from_json(args.med_config, encoder_width=vit_cfg.hidden_size)
        params = KINDS[args.kind](sd, vit_cfg, med_cfg)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_checkpoint(args.out, params, meta={"kind": args.kind, "src": args.ckpt})
    print("wrote", args.out + ".npz")
