"""BLIP video pretraining (ITA + ITM + LM) — TPU-native CLI.

Drop-in equivalent of the reference pretrain_video.py: warmup-then-step
LR (reference :94-100), alpha ramped over the first 2 epochs (:108),
triple loss with momentum encoders, queues and tied encoder/decoder.
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

import numpy as np


def main(args, config):
    import jax
    import jax.numpy as jnp

    from vidil_tpu import utils
    from vidil_tpu.config import MedConfig, ViTConfig
    from vidil_tpu.data.datasets import PrefetchLoader, RetrievalTrainDataset
    from vidil_tpu.tokenizer import BlipTokenizer
    from vidil_tpu.train.pretrain import create_pretrain_state, make_pretrain_step
    from vidil_tpu.train.retrieval import make_optimizer
    from vidil_tpu.utils.checkpoint import load_train_state, save_checkpoint, save_train_state

    utils.init_distributed_mode(args)
    utils.seed_everything(args.seed)

    if "vit_config" in config:
        vit_cfg = ViTConfig(image_size=config["image_size"], **config["vit_config"])
    else:
        vit_cfg = ViTConfig.from_name(config["vit"], config["image_size"],
                                      remat=config.get("vit_grad_ckpt", False))
    med_cfg_path = config.get("med_config", os.path.join(os.path.dirname(__file__), "configs/bert_config.json"))
    med_cfg = MedConfig.from_json(med_cfg_path, encoder_width=vit_cfg.hidden_size)
    tokenizer = BlipTokenizer(config["bert_vocab"])

    dataset = RetrievalTrainDataset(dict(config), max_words=config.get("max_words", 30))
    from vidil_tpu.train.common import resolve_train_batch

    B = resolve_train_batch(config, "batch_size", 8)
    loader = PrefetchLoader(dataset, B, shuffle=True, drop_last=True, seed=args.seed)

    optimizer = make_optimizer(config["init_lr"], config.get("weight_decay", 0.05))
    queue_size = config.get("queue_size", 57600)
    queue_size -= queue_size % B
    state = create_pretrain_state(jax.random.PRNGKey(args.seed), vit_cfg, med_cfg, optimizer,
                                  queue_size=queue_size)
    # donated state: old/new train states never coexist in HBM
    step_fn = jax.jit(make_pretrain_step(vit_cfg, med_cfg, optimizer, dtype=jnp.bfloat16),
                      donate_argnums=0)

    start_epoch = 0
    resume_path = config.get("resume", "")
    if resume_path:
        state, ck_meta = load_train_state(resume_path, state)
        start_epoch = (ck_meta or {}).get("epoch", -1) + 1
        print(f"resumed full train state from {resume_path} at epoch {start_epoch}")

    # SPMD over local chips (data_parallel / model_parallel config keys)
    from vidil_tpu.parallel import apply_optimizer_sharding, shard_params
    from vidil_tpu.parallel.mesh import mesh_from_config, shard_batch

    mesh = mesh_from_config(config)
    if mesh is not None:
        print(f"training over mesh {dict(mesh.shape)}")
        assert B % mesh.shape["data"] == 0
        state = state._replace(params=shard_params(state.params, mesh),
                               params_m=shard_params(state.params_m, mesh))
        state = apply_optimizer_sharding(state, mesh, config)  # opt-in ZeRO-1

    warmup_steps = config.get("warmup_steps", 3000)
    n_per_epoch = len(loader)
    for epoch in range(start_epoch, config["max_epoch"]):
        loader.set_epoch(epoch)
        logger = utils.MetricLogger(delimiter="  ")
        for i, (video, captions, _) in enumerate(logger.log_every(loader, 50, f"Pretrain epoch {epoch}")):
            step_idx = epoch * n_per_epoch + i
            if step_idx < warmup_steps:
                lr = utils.warmup_lr_schedule(step_idx, warmup_steps,
                                              config.get("warmup_lr", 1e-6), config["init_lr"])
            else:
                lr = utils.step_lr_schedule(epoch, config["init_lr"],
                                            config.get("min_lr", 1e-6),
                                            config.get("lr_decay_rate", 0.9))
            state.opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
            # alpha ramp over the first 2 epochs (reference :108)
            alpha = config["alpha"] * min(1.0, (epoch * n_per_epoch + i) / (2 * n_per_epoch))
            enc = tokenizer(list(captions), padding="max_length", truncation=True, max_length=30)
            enc_ids = enc.input_ids.copy()
            enc_ids[:, 0] = tokenizer.enc_token_id
            dec_ids = enc.input_ids.copy()
            dec_ids[:, 0] = tokenizer.bos_token_id
            batch = {"video": np.asarray(video), "text_ids": enc.input_ids,
                     "enc_ids": enc_ids, "dec_ids": dec_ids,
                     "text_mask": enc.attention_mask}
            batch = shard_batch(mesh, batch) if mesh is not None else \
                {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = step_fn(state, batch, alpha,
                                     jax.random.fold_in(jax.random.PRNGKey(args.seed), step_idx))
            logger.update(loss_ita=float(metrics["loss_ita"]), loss_itm=float(metrics["loss_itm"]),
                          loss_lm=float(metrics["loss_lm"]), lr=lr)
        if utils.is_main_process():
            save_checkpoint(os.path.join(args.output_dir, f"checkpoint_{epoch:02d}"), state.params,
                            meta={"epoch": epoch})
            save_train_state(os.path.join(args.output_dir, "checkpoint_last"),
                             state, meta={"epoch": epoch})
            with open(os.path.join(args.output_dir, "log.txt"), "a") as f:
                stats = {k: m.global_avg for k, m in logger.meters.items()}
                f.write(json.dumps({**stats, "epoch": epoch}) + "\n")
        utils.barrier()


if __name__ == "__main__":
    import yaml

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/pretrain_video.yaml")
    parser.add_argument("--output_dir", default="output/pretrain_video")
    parser.add_argument("--device", default="tpu")
    parser.add_argument("--seed", default=42, type=int)
    parser.add_argument("--world_size", default=1, type=int)
    parser.add_argument("--dist_url", default="env://")
    parser.add_argument("--distributed", default=True, type=bool)
    args = parser.parse_args()

    config = yaml.safe_load(open(args.config))
    Path(args.output_dir).mkdir(parents=True, exist_ok=True)
    yaml.safe_dump(config, open(os.path.join(args.output_dir, "config.yaml"), "w"))
    main(args, config)
