"""Config system: YAML pipeline/train configs + model architecture configs.

Mirrors the reference's three-tier config scheme (yaml files loaded per
entry point and echoed back into the output dir for provenance —
reference: run_video_CapFilt.py:304-308 — plus JSON model-architecture
configs like configs/med_config.json), with dataclasses for the model
side so shapes are static and jit-friendly.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass

import yaml


def load_yaml_config(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def dump_yaml_config(config: dict, out_dir: str, name: str = "config.yaml") -> None:
    """Echo the resolved config into the output dir for provenance."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, name), "w") as f:
        yaml.safe_dump(config, f, sort_keys=False)


def compute_dtype_from_config(config: dict, override=None):
    """Tower compute dtype for the pipeline CLIs: bf16 by default (MXU-rate
    matmuls with fp32 LN/softmax islands inside the models);
    `compute_dtype: float32` pins full-fp32 towers for
    maximum-conservatism parity runs. A non-None `override` (a jnp dtype)
    wins over the config; override=None defers to the config (to force
    fp32 programmatically, set config['compute_dtype'] = 'float32')."""
    if override is not None:
        return override
    import jax.numpy as jnp

    name = config.get("compute_dtype", "bfloat16")
    table = {"bfloat16": jnp.bfloat16, "float32": None}
    if name not in table:
        raise ValueError(
            f"compute_dtype: {name!r} — expected one of {sorted(table)}")
    return table[name]


@dataclass(frozen=True)
class ViTConfig:
    """BLIP vision transformer (reference: models/blip.py:298-326).

    base: 768d/12L/12H, large: 1024d/24L/16H; patch 16, pre-LN, GELU.
    """

    image_size: int = 384
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-6
    in_channels: int = 3
    remat: bool = False  # jax.checkpoint on blocks (>= remat_from_layer)
    remat_from_layer: int = 0
    remat_policy: str | None = None  # None = recompute everything;
    # "dots" = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    # (save plain-GEMM outputs, recompute attention einsums/elementwise —
    # trades HBM for ~1x fewer forward GEMM recomputes in the backward)
    use_flash: bool = True  # Pallas flash kernel where measured faster (384px encode);
    # dispatch is shape-aware — small shapes stay on XLA (ops/flash_attention.py)
    use_fused_mlp: bool = False  # Pallas fused MLP (ops/fused_mlp.py): 1.34x
    # ISOLATED at encode shapes but a wash IN SITU (full encode ±1%,
    # tools/ab_encode_mlp.py in_situ phase) — XLA hides the (M,4D) HBM
    # round-trip behind adjacent work; kept available, off by default
    use_fused_block: bool = False  # whole-layer Pallas kernel
    # (ops/fused_vit_block.py): LN1->QKV->MHA->proj->res->LN2->MLP->res in
    # one program, weights VMEM-resident. OFF by default: it wins the
    # ISOLATED/in-situ encode A/B (1.65x at 384px, 467->283 ms / 256 frm,
    # 30.9%->50.9% MFU; benchmarks/fused_block_ab.jsonl) but LOSES on the
    # flagship CapFilt chunk program — the path production runs — by ~13%
    # canary-normalized (fused-ON 130.5 f/s @ canary 69.2 vs fused-OFF
    # 167.4 f/s @ canary 76.9, benchmarks/capfilt.jsonl 2026-08-18/19;
    # see benchmarks/fused_block_chunk_ab.jsonl for the same-session
    # settle). Opt in per-run via ViTConfig(use_fused_block=True) or
    # bench.py's BENCH_FUSED_BLOCK=1 where encode-only throughput is the
    # workload. Dispatch self-gates: off under remat (training-with-ckpt
    # needs the unfused body) and off-TPU (models/vit.py). Only ViT-B
    # shapes are measured; ViT-L runs the same kernel unmeasured.
    fused_block_frames: int = 8  # frames per fused-block grid program
    # (isolated sweep: 8 best at 384px, within noise of 4)
    use_fused_block_bwd: bool = False  # whole-block Pallas BACKWARD kernel
    # (ops/fused_vit_block.py _block_bwd_kernel): recomputes the forward
    # inside VMEM from the saved residual input and emits dx + all 12
    # param grads in one program — full-remat memory profile without a
    # jax.checkpoint wrapper, none of the XLA-recompute vjp's HBM
    # boundaries. Requires use_fused_block; when set, the fused dispatch
    # runs even under cfg.remat (the kernel IS the remat). The dataclass
    # default stays False (inference encodes never take the bwd path);
    # trainers default the fwd+bwd PAIR ON via training_cfgs — measured
    # faster than classic remat at every trainer shape (caption b64
    # 46.6% vs 38.8% MFU; benchmarks/misc_train_steps.jsonl fusedbwd
    # rows). VIDIL_TPU_TRAIN_FUSED_BLOCK=0 opts a training run out.
    fused_block_bwd_frames: int = 1  # frames per backward grid program
    # (backward holds ~4x the forward's live VMEM: keep 1 at 384px)
    fused_block_interpret: bool = False  # test-only: interpret-mode kernel

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # + [CLS]

    @classmethod
    def from_name(cls, vit: str, image_size: int, **kw) -> "ViTConfig":
        if vit == "base":
            return cls(image_size=image_size, hidden_size=768, num_layers=12, num_heads=12, **kw)
        if vit == "large":
            return cls(image_size=image_size, hidden_size=1024, num_layers=24, num_heads=16, **kw)
        raise ValueError(f"unknown vit size: {vit}")


@dataclass(frozen=True)
class MedConfig:
    """MED — BERT with optional cross-attention + causal LM
    (reference: configs/med_config.json, models/med.py)."""

    vocab_size: int = 30524
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    layer_norm_eps: float = 1e-12
    encoder_width: int = 768
    add_cross_attention: bool = True
    pad_token_id: int = 0
    hidden_act: str = "gelu"
    label_smoothing: float = 0.1
    remat: bool = False  # jax.checkpoint on the scanned layer body
    # (training-time memory/compute trade; train steps enable it)
    remat_policy: str | None = None  # None / "dots" — see ViTConfig.remat_policy
    use_fused_mlp: bool = False  # Pallas fused MLP: 1.48x ISOLATED on the ITM
    # text shape but a wash in the real grouped-ITM program (±1.4%,
    # tools/ab_encode_mlp.py in_situ phase); kept available, off by default

    @classmethod
    def from_json(cls, path: str, **overrides) -> "MedConfig":
        with open(path) as f:
            raw = json.load(f)
        mapped = dict(
            vocab_size=raw.get("vocab_size", 30524),
            hidden_size=raw.get("hidden_size", 768),
            num_layers=raw.get("num_hidden_layers", 12),
            num_heads=raw.get("num_attention_heads", 12),
            intermediate_size=raw.get("intermediate_size", 3072),
            max_position_embeddings=raw.get("max_position_embeddings", 512),
            layer_norm_eps=raw.get("layer_norm_eps", 1e-12),
            encoder_width=raw.get("encoder_width", 768),
            add_cross_attention=raw.get("add_cross_attention", True),
            pad_token_id=raw.get("pad_token_id", 0),
            hidden_act=raw.get("hidden_act", "gelu"),
        )
        mapped.update(overrides)
        return cls(**mapped)


@dataclass(frozen=True)
class CLIPConfig:
    """OpenAI CLIP dual towers (ViT-L/14 defaults; HF clip-vit-large-patch14)."""

    # vision tower
    image_size: int = 224
    patch_size: int = 14
    vision_hidden_size: int = 1024
    vision_layers: int = 24
    vision_heads: int = 16
    vision_intermediate_size: int = 4096
    # text tower
    vocab_size: int = 49408
    text_hidden_size: int = 768
    text_layers: int = 12
    text_heads: int = 12
    text_intermediate_size: int = 3072
    max_text_len: int = 77
    # shared
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"

    @classmethod
    def vit_b_32(cls) -> "CLIPConfig":
        return cls(
            patch_size=32, vision_hidden_size=768, vision_layers=12, vision_heads=12,
            vision_intermediate_size=3072, text_hidden_size=512, text_heads=8,
            text_intermediate_size=2048, projection_dim=512,
        )

    @classmethod
    def vit_l_14(cls) -> "CLIPConfig":
        return cls()


def asdict(cfg) -> dict:
    return dataclasses.asdict(cfg)
