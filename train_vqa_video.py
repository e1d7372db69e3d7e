"""BLIP video VQA fine-tune — TPU-native CLI.

Drop-in equivalent of the reference train_vqa_video.py: weighted answer
LM loss over ragged answers, per-epoch cosine LR, 'generate' or 'rank'
inference at eval time.
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
    from vidil_tpu.models.blip_vqa import init_blip_vqa
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
        params = convert.convert_blip_vqa(sd, vit_cfg, med_cfg)
    else:
        params = init_blip_vqa(jax.random.PRNGKey(0), vit_cfg, med_cfg)
    return params, tokenizer, vit_cfg, med_cfg


def main(args, config):
    import jax
    import jax.numpy as jnp

    from vidil_tpu import utils
    from vidil_tpu.data.datasets import PrefetchLoader, VQADataset, vqa_collate
    from vidil_tpu.data.text_utils import save_result
    from vidil_tpu.models.blip import encode_video_frames
    from vidil_tpu.models.blip_vqa import rank_answer, vqa_generate_ids
    from vidil_tpu.train.retrieval import make_optimizer
    from vidil_tpu.train.vqa import create_vqa_train_state, make_vqa_train_step
    from vidil_tpu.utils.checkpoint import load_train_state, save_checkpoint, save_train_state

    utils.init_distributed_mode(args)
    utils.seed_everything(args.seed)
    params, tokenizer, vit_cfg, med_cfg = build(config)

    train_dataset = VQADataset(config, split="train")
    test_dataset = VQADataset(config, split="test")
    from vidil_tpu.train.common import resolve_train_batch

    train_loader = PrefetchLoader(train_dataset,
                                  resolve_train_batch(config, "batch_size_train", 16),
                                  shuffle=True, drop_last=True, collate_fn=vqa_collate,
                                  seed=args.seed)
    test_loader = PrefetchLoader(test_dataset, config.get("batch_size_test", 16))

    optimizer = make_optimizer(config["init_lr"], config.get("weight_decay", 0.05))
    state = create_vqa_train_state(params, optimizer)
    # donated state: old/new train states never coexist in HBM
    train_step = jax.jit(make_vqa_train_step(vit_cfg, med_cfg, optimizer, dtype=jnp.bfloat16),
                         donate_argnums=0)

    def tokenize_questions(questions):
        enc = tokenizer(questions, padding="max_length", truncation=True, max_length=35)
        ids = enc.input_ids.copy()
        ids[:, 0] = tokenizer.enc_token_id
        return ids, enc.attention_mask

    start_epoch = 0
    resume_path = config.get("resume", "")
    if resume_path and not args.evaluate:
        state, ck_meta = load_train_state(resume_path, state)
        start_epoch = (ck_meta or {}).get("epoch", -1) + 1
        print(f"resumed full train state from {resume_path} at epoch {start_epoch}")

    # SPMD over local chips (data_parallel / model_parallel config keys).
    # Only 'video'/'question_*' batch entries have the dp-divisible batch
    # dim; answers are ragged (answer_question_index), so shard_batch's
    # divisibility fallback replicates them.
    from vidil_tpu.parallel import apply_optimizer_sharding, shard_params
    from vidil_tpu.parallel.mesh import batch_put, mesh_from_config

    mesh = mesh_from_config(config)
    if mesh is not None:
        print(f"training over mesh {dict(mesh.shape)}")
        state = state._replace(params=shard_params(state.params, mesh))
        state = apply_optimizer_sharding(state, mesh, config)  # opt-in ZeRO-1

    for epoch in range(start_epoch, config["max_epoch"]):
        if not args.evaluate:
            train_loader.set_epoch(epoch)
            lr = utils.cosine_lr_schedule(epoch, config["max_epoch"], config["init_lr"],
                                          config.get("min_lr", 0))
            state.opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
            logger = utils.MetricLogger(delimiter="  ")
            for videos, questions, answers, weights, n in logger.log_every(train_loader, 50, f"Train epoch {epoch}"):
                q_ids, q_mask = tokenize_questions(list(questions))
                a_enc = tokenizer(list(answers), padding="max_length", truncation=True, max_length=12)
                a_ids = a_enc.input_ids.copy()
                a_ids[:, 0] = tokenizer.bos_token_id
                aq_index = np.repeat(np.arange(len(n)), n).astype(np.int32)
                batch = {
                    "video": np.asarray(videos),
                    "question_ids": q_ids, "question_mask": q_mask,
                    "answer_ids": a_ids, "answer_mask": a_enc.attention_mask,
                    "answer_question_index": aq_index,
                    "weights": np.asarray(weights),
                }
                batch = ({k: batch_put(mesh, np.asarray(v)) for k, v in batch.items()}
                         if mesh is not None else
                         {k: jnp.asarray(v) for k, v in batch.items()})
                state, metrics = train_step(state, batch)
                logger.update(loss=float(metrics["loss"]), lr=lr)

        # evaluation (reference train_vqa_video.py:65-104)
        result = []
        inference = config.get("inference", "generate")
        if inference == "rank":
            answer_list = json.load(open(config["answer_list_json"]))
            a_enc = tokenizer(answer_list, padding="longest")
            a_ids = a_enc.input_ids.copy()
            a_ids[:, 0] = tokenizer.bos_token_id
        for item in test_loader:
            videos, questions, question_ids = item
            q_ids, q_mask = tokenize_questions(list(questions))
            embeds = encode_video_frames(state.params, jnp.asarray(videos), vit_cfg, dtype=jnp.bfloat16)
            if inference == "generate":
                seqs = vqa_generate_ids(state.params, embeds, jnp.asarray(q_ids),
                                        jnp.asarray(q_mask), med_cfg, tokenizer,
                                        max_length=10, dtype=jnp.bfloat16,
                                        beam_group_kv=config.get("beam_group_kv", True))
                answers = tokenizer.batch_decode(np.asarray(seqs))
            else:
                idxs = rank_answer(state.params, embeds, jnp.asarray(q_ids), jnp.asarray(q_mask),
                                   jnp.asarray(a_ids), jnp.asarray(a_enc.attention_mask),
                                   k=config.get("k_test", 128), med_cfg=med_cfg,
                                   tokenizer=tokenizer, dtype=jnp.bfloat16)
                answers = [answer_list[int(i)] for i in np.asarray(idxs)]
            for qid, ans in zip(question_ids, answers):
                result.append({"question_id": int(qid), "answer": ans})
        save_result(result, args.result_dir, f"vqa_result_epoch{epoch}")
        if utils.is_main_process() and not args.evaluate:
            save_checkpoint(os.path.join(args.output_dir, "checkpoint_best"), state.params,
                            meta={"epoch": epoch})
            save_train_state(os.path.join(args.output_dir, "checkpoint_last"),
                             state, meta={"epoch": epoch})
        if args.evaluate:
            break
        utils.barrier()


if __name__ == "__main__":
    import yaml

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/train_blip_video_vqa_msrvtt.yaml")
    parser.add_argument("--output_dir", default="output/vqa_video")
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
