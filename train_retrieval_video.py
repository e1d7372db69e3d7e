"""BLIP video retrieval fine-tune — TPU-native CLI.

Drop-in equivalent of the reference train_retrieval_video.py: ITA + ITM
training on (pseudo-)labeled caption jsonl with momentum encoders and
feature queues, per-epoch cosine LR, alpha warmup during epoch 0
(reference :55-59), r_mean-gated checkpoint_best, k_test ITM-reranked
retrieval evaluation.
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

import numpy as np


def build(config):
    import jax

    from vidil_tpu.config import MedConfig, ViTConfig
    from vidil_tpu.models import convert
    from vidil_tpu.models.blip_retrieval import init_retrieval_params
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
        params = convert.convert_blip_retrieval(sd, vit_cfg, med_cfg, with_momentum=False)
        if "temp" not in params:
            import jax.numpy as jnp

            params["temp"] = jnp.asarray(0.07, jnp.float32)
    else:
        params = init_retrieval_params(jax.random.PRNGKey(0), vit_cfg, med_cfg)
    return params, tokenizer, vit_cfg, med_cfg


def main(args, config):
    import jax
    import jax.numpy as jnp

    from vidil_tpu import utils
    from vidil_tpu.data.datasets import PrefetchLoader, RetrievalEvalDataset, RetrievalTrainDataset
    from vidil_tpu.evals.retrieval import RetrievalEvaluator, itm_eval
    from vidil_tpu.train.retrieval import (
        create_train_state,
        make_optimizer,
        make_retrieval_train_step,
    )
    from vidil_tpu.utils.checkpoint import load_train_state, save_checkpoint, save_train_state

    utils.init_distributed_mode(args)
    utils.seed_everything(args.seed)

    params, tokenizer, vit_cfg, med_cfg = build(config)

    ds_cfg = dict(config)
    ds_cfg.setdefault("num_frm_train", config.get("num_frm_train", 4))
    train_dataset = RetrievalTrainDataset(ds_cfg)
    eval_root = config.get("eval_video_root", config.get("video_root"))
    val_dataset = RetrievalEvalDataset(eval_root, config["val_ann_jsonl"],
                                       num_frm=config["num_frm_test"],
                                       frm_sampling_strategy="uniform",
                                       max_img_size=config["image_size"])
    test_dataset = RetrievalEvalDataset(eval_root, config["test_ann_jsonl"],
                                        num_frm=config["num_frm_test"],
                                        frm_sampling_strategy="uniform",
                                        max_img_size=config["image_size"])

    from vidil_tpu.train.common import resolve_train_batch

    B = resolve_train_batch(config, "batch_size_train")
    train_loader = PrefetchLoader(train_dataset, B, shuffle=True, drop_last=True, seed=args.seed)

    optimizer = make_optimizer(config["init_lr"], config.get("weight_decay", 0.05))
    # queue must be divisible by the global batch (reference :546)
    queue_size = config["queue_size"] - config["queue_size"] % B if config["queue_size"] % B else config["queue_size"]
    state = create_train_state(jax.random.PRNGKey(args.seed), vit_cfg, med_cfg, optimizer,
                               queue_size=queue_size, params=params)
    # donate the state: old and new train states (~3.8 GB at base scale)
    # never coexist in HBM, halving training peak memory
    train_step = jax.jit(make_retrieval_train_step(vit_cfg, med_cfg, optimizer, dtype=jnp.bfloat16),
                         donate_argnums=0)

    # full-state resume: params + optimizer moments + momentum encoder +
    # feature queues (reference resumes model+optimizer from torch.save)
    start_epoch = 0
    resume_path = config.get("resume", "")
    if resume_path and not args.evaluate:
        state, ck_meta = load_train_state(resume_path, state)
        start_epoch = (ck_meta or {}).get("epoch", -1) + 1
        print(f"resumed full train state from {resume_path} at epoch {start_epoch}")

    # SPMD over local chips: dp batch sharding + optional tp param sharding
    # (config keys data_parallel / model_parallel; the reference's NCCL DDP
    # one-process-per-GPU becomes one jitted program over the mesh)
    from vidil_tpu.parallel import apply_optimizer_sharding, shard_params
    from vidil_tpu.parallel.mesh import mesh_from_config, shard_batch

    mesh = mesh_from_config(config)
    if mesh is not None:
        print(f"training over mesh {dict(mesh.shape)}")
        assert B % mesh.shape["data"] == 0, "batch_size_train must divide the data axis"
        state = state._replace(params=shard_params(state.params, mesh),
                               params_m=shard_params(state.params_m, mesh))
        state = apply_optimizer_sharding(state, mesh, config)  # opt-in ZeRO-1

    def tokenize(captions):
        enc = tokenizer(captions, padding="max_length", truncation=True, max_length=35)
        enc_ids = enc.input_ids.copy()
        enc_ids[:, 0] = tokenizer.enc_token_id
        return enc.input_ids, enc_ids, enc.attention_mask

    def run_eval(dataset):
        evaluator = RetrievalEvaluator(state.params, vit_cfg, med_cfg, tokenizer,
                                       k_test=config["k_test"], mesh=mesh)
        text_embeds, text_ids, text_atts = evaluator.compute_text_features(dataset.text)
        loader = PrefetchLoader(dataset, config["batch_size_test"])
        video_feats, video_embeds = evaluator.compute_video_features(
            (video for video, _ in loader))
        v2t, t2v = evaluator.score_matrices(video_feats, video_embeds, text_embeds,
                                            text_ids, text_atts)
        return itm_eval(v2t, t2v, dataset.txt2video, dataset.video2txt)

    best, best_epoch = 0.0, 0
    n_steps_per_epoch = len(train_loader)
    for epoch in range(start_epoch, config["max_epoch"]):
        if not args.evaluate:
            train_loader.set_epoch(epoch)
            lr = utils.cosine_lr_schedule(epoch, config["max_epoch"], config["init_lr"],
                                          config.get("min_lr", 0))
            state.opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
            logger = utils.MetricLogger(delimiter="  ")
            for i, (video, captions, idx) in enumerate(logger.log_every(train_loader, 50, f"Train epoch {epoch}")):
                # alpha ramp during epoch 0 (reference :55-59)
                if epoch > 0:
                    alpha = config["alpha"]
                else:
                    alpha = config["alpha"] * min(1.0, i / n_steps_per_epoch)
                ids, enc_ids, mask = tokenize(list(captions))
                batch = {"video": np.asarray(video), "text_ids": ids,
                         "enc_ids": enc_ids, "text_mask": mask,
                         "idx": np.asarray(idx, np.int32)}
                batch = shard_batch(mesh, batch) if mesh is not None else \
                    {k: jnp.asarray(v) for k, v in batch.items()}
                state, metrics = train_step(state, batch, alpha,
                                            jax.random.fold_in(jax.random.PRNGKey(args.seed), int(state.step)))
                logger.update(loss_ita=float(metrics["loss_ita"]),
                              loss_itm=float(metrics["loss_itm"]), lr=lr)

        val_metrics = run_eval(val_dataset)
        print("val:", val_metrics)
        test_metrics = run_eval(test_dataset)
        print("test:", test_metrics)
        if utils.is_main_process():
            log_stats = {**{f"val_{k}": v for k, v in val_metrics.items()},
                         **{f"test_{k}": v for k, v in test_metrics.items()}, "epoch": epoch}
            if not args.evaluate and val_metrics["r_mean"] > best:
                best = val_metrics["r_mean"]
                best_epoch = epoch
                save_checkpoint(os.path.join(args.output_dir, "checkpoint_best"), state.params,
                                meta={"epoch": epoch})
            log_stats["best_epoch"] = best_epoch
            with open(os.path.join(args.output_dir, "evaluate.txt" if args.evaluate else "log.txt"), "a") as f:
                f.write(json.dumps(log_stats) + "\n")
            if not args.evaluate:
                save_train_state(os.path.join(args.output_dir, "checkpoint_last"),
                                 state, meta={"epoch": epoch})
        if args.evaluate:
            break
        utils.barrier()


if __name__ == "__main__":
    import yaml

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/train_blip_video_retrieval_msrvtt_pseudo.yaml")
    parser.add_argument("--output_dir", default="output/retrieval_video")
    parser.add_argument("--evaluate", action="store_true")
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
