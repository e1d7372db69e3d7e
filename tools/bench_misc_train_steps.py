"""Benchmark: caption / VQA / pretrain train-step throughput + MFU.

Closes the provenance gap for the three train-step numbers README quotes
without a checked-in artifact (retrieval has tools/bench_train_step.py):
one full donated train step each for

  caption  — LM loss over concat-frame cross-attention
             (reference train_caption_video.py:38-73)
  vqa      — question-conditioned decoder CE with per-answer weights
             (reference train_vqa_video.py:28-62; 2 answers/question)
  pretrain — ITA + ITM + LM triple loss, tied decoder, momentum + queue,
             single-frame (reference pretrain_video.py:66-124)

at the reference per-GPU batch (8 videos; caption/vqa 4 frames @224,
pretrain 1 frame), bf16 with remat, params synthesized on device.

Prints one JSON line per step type; artifacts in
benchmarks/misc_train_steps.jsonl. Env: STEPS (comma list, default all),
BATCH (default 8), ITERS (default 8), REMAT (full | dots | off —
remat policy A/B: "full" recomputes every layer in the backward (the
trainer default), "dots" saves plain-GEMM outputs and recomputes only
attention einsums/elementwise (ViTConfig.remat_policy), "off" saves all
activations; dots/off trade HBM for skipped recompute FLOPs and may OOM
at large batches — that is part of what this measures).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vidil_tpu.utils.bench_artifact import emit

V5E_PEAK_BF16_TFLOPS = 197.0
BATCH = int(os.environ.get("BATCH", 8))
ITERS = int(os.environ.get("ITERS", 8))
STEPS = os.environ.get("STEPS", "caption,vqa,pretrain").split(",")
REMAT = os.environ.get("REMAT", "full")
assert REMAT in ("full", "dots", "off", "fusedblock", "fusedbwd"), REMAT
# analytic backward factor over one forward: fwd 1x + bwd 2x, plus the
# full-remat recompute 1x. "dots" skips the GEMM recompute (only the
# batched attention einsums re-run — excluded like elementwise), "off"
# recomputes nothing, so both count 3x useful FLOPs. "fusedblock" runs
# the whole-layer Pallas kernel forward on the ViT (remat off) whose
# custom-vjp backward recomputes through XLA — same 4x work shape as
# "full" but with the 1.65x-faster fused forward (tools/ab_fused_block.py);
# MED keeps its usual remat. Measured negative (caption/vqa 6-7% slower
# at batch 64) -> training_cfgs strips the flag by default; this mode
# sets VIDIL_TPU_TRAIN_FUSED_BLOCK=1 to force it for re-measurement.
# "fusedbwd" runs the fused forward + the whole-block Pallas BACKWARD
# kernel (ops/fused_vit_block._block_bwd_kernel): the recompute happens
# INSIDE the backward kernel from VMEM (same 4x work shape as "full",
# none of the XLA-recompute HBM boundaries that made "fusedblock" lose).
BWD_FACTOR = 4 if REMAT in ("full", "fusedblock", "fusedbwd") else 3
if REMAT == "fusedblock":
    os.environ["VIDIL_TPU_TRAIN_FUSED_BLOCK"] = "1"
IMAGE_SIZE = 224
NUM_FRM = 4
VOCAB = 30524
LT = 35   # caption/text ids length
LQ = 35   # vqa question length
LA = 10   # vqa answer length (reference generate max_len=10)


# -- analytic matmul FLOPs (2*m*n*k per GEMM; elementwise excluded) --------

def _vit_fwd(D=768, layers=12, m=16, patch=16, image_size=IMAGE_SIZE):
    P = (image_size // patch) ** 2 + 1
    return 2 * P * D * (patch * patch * 3) + layers * ((8 + m) * P * D * D + 4 * P * P * D)


def _bert_self(L, D=768, layers=12, m=16):
    """Text-only encoder rows (self-attn + MLP)."""
    return layers * ((8 + m) * L * D * D + 4 * L * L * D)


def _bert_cross(L, Mem, D=768, layers=12, m=16):
    """Text rows with cross-attention over an Mem-token memory (q/out
    projections; the K/V projections are in _cross_kv, counted once per
    memory)."""
    return layers * ((8 + m) * L * D * D + 4 * L * D * D
                     + 4 * L * L * D + 4 * L * Mem * D)


def _cross_kv(Mem, D=768, layers=12):
    return layers * 2 * 2 * Mem * D * D


def _lm_head(L, D=768, vocab=VOCAB):
    return 2 * L * D * vocab


def caption_tflops(B, num_frm=NUM_FRM, D=768):
    P = (IMAGE_SIZE // 16) ** 2 + 1
    fwd = B * (num_frm * _vit_fwd() + _cross_kv(num_frm * P)
               + _bert_cross(LT, num_frm * P) + _lm_head(LT))
    return fwd * BWD_FACTOR / 1e12  # fwd + bwd(2x) [+ remat recompute 1x]


def vqa_tflops(B, num_frm=NUM_FRM, answers_per_q=2, D=768):
    P = (IMAGE_SIZE // 16) ** 2 + 1
    A = B * answers_per_q
    fwd = (B * (num_frm * _vit_fwd() + _cross_kv(num_frm * P)
                + _bert_cross(LQ, num_frm * P))
           + A * (_cross_kv(LQ) + _bert_cross(LA, LQ) + _lm_head(LA)))
    return fwd * BWD_FACTOR / 1e12


def pretrain_tflops(B, D=768):
    P = (IMAGE_SIZE // 16) ** 2 + 1
    online = (B * (_vit_fwd() + _bert_self(LT))                  # towers
              + 3 * B * (_cross_kv(P) + _bert_cross(LT, P))      # ITM pos+2neg
              # LM decoder: tied-except-attention, so it projects its OWN
              # cross K/V from the image memory each forward
              + B * (_cross_kv(P) + _bert_cross(LT, P) + _lm_head(LT)))
    momentum = B * (_vit_fwd() + _bert_self(LT))
    return (online * BWD_FACTOR + momentum) / 1e12


def log(msg):
    print(f"[bench_misc_train] {msg}", file=sys.stderr, flush=True)


def _synth_state(shapes):
    import jax

    from vidil_tpu.utils.synth import synth_tree

    state = jax.jit(lambda: synth_tree(shapes, amplitude=0.02))()
    jax.block_until_ready(state)
    return state


def main():
    from vidil_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()  # jax ignores the env var; see jaxcache.py
    import jax
    import jax.numpy as jnp

    from vidil_tpu.config import MedConfig, ViTConfig
    from vidil_tpu.models.blip import init_blip_decoder
    from vidil_tpu.models.blip_vqa import init_blip_vqa
    from vidil_tpu.train.caption import create_caption_train_state, make_caption_train_step
    from vidil_tpu.train.pretrain import create_pretrain_state, make_pretrain_step
    from vidil_tpu.train.retrieval import make_optimizer
    from vidil_tpu.train.vqa import create_vqa_train_state, make_vqa_train_step

    policy = "dots" if REMAT == "dots" else None
    vit_cfg = ViTConfig.from_name(
        "base", IMAGE_SIZE, remat=(REMAT in ("full", "dots")),
        remat_policy=policy,
        use_fused_block=(REMAT in ("fusedblock", "fusedbwd")),
        use_fused_block_bwd=(REMAT == "fusedbwd"),
        fused_block_frames=8,
        fused_block_bwd_frames=int(os.environ.get("BWD_FRAMES", 1)))
    med_cfg = MedConfig(vocab_size=VOCAB, remat_policy=policy)
    med_remat = REMAT != "off"
    opt = make_optimizer(1e-5)
    log(f"device: {jax.devices()[0]}; batch={BATCH}; remat={REMAT}")
    rng = np.random.RandomState(0)
    B = BATCH

    def run(name, state, step_fn, batch, extra_args, fl):
        t = time.time()
        state, metrics = step_fn(state, batch, *extra_args)
        log(f"{name} warmup (compile): {time.time()-t:.1f}s "
            f"loss={float(metrics['loss']):.3f}")
        ts = []
        for it in range(ITERS):
            t0 = time.perf_counter()
            state, metrics = step_fn(state, batch, *extra_args)
            _ = float(metrics["loss"])  # sync (block_until_ready is a no-op here)
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        frames = B * (1 if name == "pretrain" else NUM_FRM)
        emit("misc_train_steps", {
            "metric": f"{name}_train_step",
            "batch_videos": B,
            "num_frm": 1 if name == "pretrain" else NUM_FRM,
            "image_size": IMAGE_SIZE,
            "s_per_step": round(dt, 4),
            "frames_per_sec": round(frames / dt, 1),
            "videos_per_sec": round(B / dt, 1),
            "tflops_per_step": round(fl, 2),
            "mfu": round(fl / dt / V5E_PEAK_BF16_TFLOPS, 4),
            "remat": REMAT,
            "mfu_note": "analytic matmul FLOPs (fwd+bwd 2x"
                        + ("+recompute 1x" if BWD_FACTOR == 4 else ", recompute excluded")
                        + ("+momentum 1x" if name == "pretrain" else "")
                        + ") / measured step time / v5e bf16 peak",
            "device": str(jax.devices()[0]),
        })

    if "caption" in STEPS:
        shapes = jax.eval_shape(lambda: create_caption_train_state(
            init_blip_decoder(jax.random.PRNGKey(0), vit_cfg, med_cfg), opt))
        state = _synth_state(shapes)
        step = jax.jit(make_caption_train_step(vit_cfg, med_cfg, opt, prompt_length=4,
                                               dtype=jnp.bfloat16,
                                               med_remat=med_remat), donate_argnums=0)
        ids = rng.randint(4, VOCAB, size=(B, LT)).astype(np.int32)
        batch = {
            "video": jnp.asarray(rng.randn(B, NUM_FRM, IMAGE_SIZE, IMAGE_SIZE, 3)
                                 .astype(np.float32) * 0.1),
            "input_ids": jnp.asarray(ids),
            "attention_mask": jnp.ones((B, LT), jnp.int32),
        }
        run("caption", state, step, batch, (), caption_tflops(B))

    if "vqa" in STEPS:
        shapes = jax.eval_shape(lambda: create_vqa_train_state(
            init_blip_vqa(jax.random.PRNGKey(1), vit_cfg, med_cfg), opt))
        state = _synth_state(shapes)
        step = jax.jit(make_vqa_train_step(vit_cfg, med_cfg, opt, dtype=jnp.bfloat16,
                                       med_remat=med_remat),
                       donate_argnums=0)
        A = 2 * B
        batch = {
            "video": jnp.asarray(rng.randn(B, NUM_FRM, IMAGE_SIZE, IMAGE_SIZE, 3)
                                 .astype(np.float32) * 0.1),
            "question_ids": jnp.asarray(rng.randint(4, VOCAB, size=(B, LQ)).astype(np.int32)),
            "question_mask": jnp.ones((B, LQ), jnp.int32),
            "answer_ids": jnp.asarray(rng.randint(4, VOCAB, size=(A, LA)).astype(np.int32)),
            "answer_mask": jnp.ones((A, LA), jnp.int32),
            "answer_question_index": jnp.asarray(np.repeat(np.arange(B), 2).astype(np.int32)),
            "weights": jnp.full((A,), 0.2, jnp.float32),
        }
        run("vqa", state, step, batch, (), vqa_tflops(B))

    if "pretrain" in STEPS:
        shapes = jax.eval_shape(lambda: create_pretrain_state(
            jax.random.PRNGKey(2), vit_cfg, med_cfg, opt,
            embed_dim=256, queue_size=57600))
        state = _synth_state(shapes)
        step = jax.jit(make_pretrain_step(vit_cfg, med_cfg, opt, dtype=jnp.bfloat16,
                                      med_remat=med_remat),
                       donate_argnums=0)
        ids = rng.randint(4, VOCAB, size=(B, LT)).astype(np.int32)
        enc, dec = ids.copy(), ids.copy()
        enc[:, 0] = 3
        dec[:, 0] = 1
        batch = {
            "video": jnp.asarray(rng.randn(B, 1, IMAGE_SIZE, IMAGE_SIZE, 3)
                                 .astype(np.float32) * 0.1),
            "text_ids": jnp.asarray(ids), "enc_ids": jnp.asarray(enc),
            "dec_ids": jnp.asarray(dec),
            "text_mask": jnp.ones((B, LT), jnp.int32),
        }
        run("pretrain", state, step, batch, (0.4, jax.random.PRNGKey(0)),
            pretrain_tflops(B))


if __name__ == "__main__":
    main()
