"""BLIP video captioning fine-tune — TPU-native CLI.

Drop-in equivalent of the reference train_caption_video.py: same argparse
surface and yaml config keys, same loop structure (per-epoch cosine LR,
last-epoch val/test eval, CIDEr+Bleu4-gated checkpoint_best, log.txt /
evaluate.txt json-line appends), with the compute as jitted SPMD steps.

Extra config keys (offline env): bert_vocab, optional vit_config /
med_config for custom sizes; checkpoints are .npz pytrees.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

import numpy as np


def build_model_and_tokenizer(config):
    import jax

    from vidil_tpu.config import MedConfig, ViTConfig
    from vidil_tpu.models import convert
    from vidil_tpu.models.blip import init_blip_decoder
    from vidil_tpu.tokenizer import BlipTokenizer

    if "vit_config" in config:
        vit_cfg = ViTConfig(image_size=config["image_size"], **config["vit_config"])
    else:
        vit_cfg = ViTConfig.from_name(config["vit"], config["image_size"],
                                      remat=config.get("vit_grad_ckpt", False))
    med_cfg_path = config.get("med_config", os.path.join(os.path.dirname(__file__), "configs/med_config.json"))
    med_cfg = MedConfig.from_json(med_cfg_path, encoder_width=vit_cfg.hidden_size)
    tokenizer = BlipTokenizer(config["bert_vocab"])

    pretrained = config.get("pretrained", "")
    if pretrained:
        sd = convert.load_torch_state_dict(pretrained)
        params = convert.convert_blip_decoder(sd, vit_cfg, med_cfg)
    else:
        params = init_blip_decoder(jax.random.PRNGKey(0), vit_cfg, med_cfg)
    return params, tokenizer, vit_cfg, med_cfg


def tokenize_captions(tokenizer, captions, max_length=40):
    """BLIP caption tokenization: [DEC] bos substituted, fixed-length pad
    (reference: models/blip.py:203-205; fixed pad keeps one compiled step)."""
    enc = tokenizer(captions, padding="max_length", truncation=True, max_length=max_length)
    ids = enc.input_ids.copy()
    ids[:, 0] = tokenizer.bos_token_id
    return ids, enc.attention_mask


def evaluate(params, loader, tokenizer, vit_cfg, med_cfg, config):
    import jax
    import jax.numpy as jnp

    from vidil_tpu.models import blip as B
    from vidil_tpu.ops.generation import GenerationConfig

    prompt = config.get("prompt", "a video of ")
    prompt_ids = tokenizer.encode(prompt)
    prompt_ids[0] = tokenizer.bos_token_id
    prompt_arr = np.asarray(prompt_ids[:-1], np.int32)
    gen = GenerationConfig(
        max_length=config.get("max_length", 30), min_length=config.get("min_length", 5),
        num_beams=config.get("num_beams", 3), eos_token_id=tokenizer.sep_token_id,
        pad_token_id=tokenizer.pad_token_id,
    )

    @jax.jit
    def generate(params, video, prompt_b):
        embeds = B.encode_video_frames(params, video, vit_cfg, dtype=jnp.bfloat16)
        return B.blip_generate_ids(params, embeds, prompt_b, med_cfg, gen, dtype=jnp.bfloat16,
                                   beam_group_kv=config.get("beam_group_kv", True))

    result = []
    for video, video_ids in loader:
        Bv = video.shape[0]
        prompt_b = jnp.broadcast_to(jnp.asarray(prompt_arr), (Bv, len(prompt_arr)))
        seqs = generate(params, jnp.asarray(video), prompt_b)
        captions = B.decode_captions(tokenizer, np.asarray(seqs), prompt)
        for vid, cap in zip(video_ids, captions):
            result.append({"video_id": vid, "caption": cap})
    return result


def main(args, config):
    import jax
    import jax.numpy as jnp

    from vidil_tpu import utils
    from vidil_tpu.data.datasets import CaptionEvalDataset, CaptionTrainDataset, PrefetchLoader
    from vidil_tpu.data.text_utils import save_result
    from vidil_tpu.evals.caption import video_caption_eval
    from vidil_tpu.train.caption import create_caption_train_state, make_caption_train_step
    from vidil_tpu.train.retrieval import make_optimizer
    from vidil_tpu.utils.checkpoint import load_train_state, save_checkpoint, save_train_state

    utils.init_distributed_mode(args)
    utils.seed_everything(args.seed)

    params, tokenizer, vit_cfg, med_cfg = build_model_and_tokenizer(config)
    prompt = config.get("prompt", "a video of ")
    prompt_length = len(tokenizer.encode(prompt)) - 1

    ds_cfg = dict(config)
    train_dataset = CaptionTrainDataset(ds_cfg, prompt=prompt)
    val_dataset = CaptionEvalDataset(config["video_root"], config["val_ann_jsonl"],
                                     num_frm=config["num_frm_test"],
                                     frm_sampling_strategy=config["frm_sampling_strategy"],
                                     max_img_size=config["image_size"])
    test_dataset = CaptionEvalDataset(config["video_root"], config["test_ann_jsonl"],
                                      num_frm=config["num_frm_test"],
                                      frm_sampling_strategy=config["frm_sampling_strategy"],
                                      max_img_size=config["image_size"])
    print("train dataset size:", len(train_dataset))

    from vidil_tpu.train.common import resolve_train_batch

    train_B = resolve_train_batch(config, "train_batch_size")
    train_loader = PrefetchLoader(train_dataset, train_B, shuffle=True,
                                  drop_last=True, seed=args.seed)
    val_loader = PrefetchLoader(val_dataset, config["test_batch_size"])
    test_loader = PrefetchLoader(test_dataset, config["test_batch_size"])

    optimizer = make_optimizer(config["init_lr"], config.get("weight_decay", 0.05))
    state = create_caption_train_state(params, optimizer)
    # donated state: old/new train states never coexist in HBM
    train_step = jax.jit(make_caption_train_step(
        vit_cfg, med_cfg, optimizer, prompt_length, dtype=jnp.bfloat16),
        donate_argnums=0)

    # 'single_frame' mode: pick the best-matching frame per caption with the
    # ITM filterer (reference: train_caption_video.py:30-36,137-143)
    single_frame = config.get("video_representation", "concat_frame") == "single_frame"
    if single_frame:
        from vidil_tpu.models import convert as _convert
        from vidil_tpu.train.caption import select_frame_itm

        fil_sd = _convert.load_torch_state_dict(config["filterer_model_ckpt"])
        filterer = _convert.convert_blip_itm(fil_sd, vit_cfg, med_cfg)
        select_jit = jax.jit(lambda f, i, m: select_frame_itm(
            filterer, f, i, m, vit_cfg, med_cfg, dtype=jnp.bfloat16))

        def select_frames(video, ids, mask):
            out = []
            for b in range(video.shape[0]):
                idx = int(select_jit(jnp.asarray(video[b]), jnp.asarray(ids[b]),
                                     jnp.asarray(mask[b])))
                out.append(video[b, idx:idx + 1])
            return np.stack(out)  # (B, 1, S, S, C)

    # full-state resume (params + AdamW moments); reference resumes
    # model+optimizer from its torch.save checkpoint
    start_epoch = 0
    resume_path = config.get("resume", "")
    if resume_path and not args.evaluate:
        state, ck_meta = load_train_state(resume_path, state)
        start_epoch = (ck_meta or {}).get("epoch", -1) + 1
        print(f"resumed full train state from {resume_path} at epoch {start_epoch}")

    # SPMD over local chips (data_parallel / model_parallel config keys)
    from vidil_tpu.parallel import apply_optimizer_sharding, shard_params
    from vidil_tpu.parallel.mesh import mesh_from_config, shard_batch

    mesh = mesh_from_config(config)
    if mesh is not None:
        print(f"training over mesh {dict(mesh.shape)}")
        assert train_B % mesh.shape["data"] == 0
        state = state._replace(params=shard_params(state.params, mesh))
        state = apply_optimizer_sharding(state, mesh, config)  # opt-in ZeRO-1

    best, best_epoch = 0.0, 0
    for epoch in range(start_epoch, config["max_epoch"]):
        if not args.evaluate:
            train_loader.set_epoch(epoch)
            lr = utils.cosine_lr_schedule(epoch, config["max_epoch"], config["init_lr"],
                                          config.get("min_lr", 0))
            state.opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
            logger = utils.MetricLogger(delimiter="  ")
            for video, captions in logger.log_every(train_loader, 50, f"Train epoch {epoch}"):
                ids, mask = tokenize_captions(tokenizer, list(captions))
                if single_frame:
                    video = select_frames(video, ids, mask)
                batch = {"video": np.asarray(video), "input_ids": ids,
                         "attention_mask": mask}
                batch = shard_batch(mesh, batch) if mesh is not None else \
                    {k: jnp.asarray(v) for k, v in batch.items()}
                state, metrics = train_step(state, batch)
                logger.update(loss=float(metrics["loss"]), lr=lr)
            train_stats = {k: f"{m.global_avg:.3f}" for k, m in logger.meters.items()}
            if utils.is_main_process():
                save_train_state(os.path.join(args.output_dir, "checkpoint_last"),
                                 state, meta={"epoch": epoch})

        if epoch == config["max_epoch"] - 1 or args.evaluate:
            skip_val = config.get("skip_val", False)
            log_stats = {}
            if not skip_val:
                val_result = evaluate(state.params, val_loader, tokenizer, vit_cfg, med_cfg, config)
                val_file = save_result(val_result, args.result_dir, f"val_epoch{epoch}",
                                       remove_duplicate="video_id")
            test_result = evaluate(state.params, test_loader, tokenizer, vit_cfg, med_cfg, config)
            test_file = save_result(test_result, args.result_dir, f"test_epoch{epoch}",
                                    remove_duplicate="video_id")
            if utils.is_main_process():
                if not skip_val:
                    video_val = video_caption_eval(config["val_ann_jsonl"], val_file)
                    log_stats.update({f"val_{k}": v for k, v in video_val.items()})
                video_test = video_caption_eval(config["test_ann_jsonl"], test_file)
                log_stats.update({f"test_{k}": v for k, v in video_test.items()})
                if args.evaluate:
                    with open(os.path.join(args.output_dir, "evaluate.txt"), "a") as f:
                        f.write(json.dumps(log_stats) + "\n")
                else:
                    # checkpoint best by val CIDEr + Bleu_4 (reference :216-219)
                    if skip_val or (video_val["CIDEr"] + video_val["Bleu_4"] > best):
                        if not skip_val:
                            best = video_val["CIDEr"] + video_val["Bleu_4"]
                            best_epoch = epoch
                        save_checkpoint(os.path.join(args.output_dir, "checkpoint_best"),
                                        state.params, meta={"epoch": epoch, "config": {k: v for k, v in config.items() if isinstance(v, (str, int, float, bool, type(None)))}})
                    log_stats.update({f"train_{k}": v for k, v in train_stats.items()},
                                     epoch=epoch, best_epoch=best_epoch)
                    with open(os.path.join(args.output_dir, "log.txt"), "a") as f:
                        f.write(json.dumps(log_stats) + "\n")
        if args.evaluate:
            break
        utils.barrier()


if __name__ == "__main__":
    import yaml

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/train_blip_video_captioning_msrvtt.yaml")
    parser.add_argument("--output_dir", default="output/caption_video")
    parser.add_argument("--evaluate", action="store_true")
    parser.add_argument("--device", default="tpu")
    parser.add_argument("--seed", default=42, type=int)
    parser.add_argument("--world_size", default=1, type=int)
    parser.add_argument("--dist_url", default="env://")
    parser.add_argument("--distributed", default=True, type=bool)
    args = parser.parse_args()

    config = yaml.safe_load(open(args.config))
    args.result_dir = os.path.join(args.output_dir, "result")
    Path(args.output_dir).mkdir(parents=True, exist_ok=True)
    Path(args.result_dir).mkdir(parents=True, exist_ok=True)
    yaml.safe_dump(config, open(os.path.join(args.output_dir, "config.yaml"), "w"))
    main(args, config)
