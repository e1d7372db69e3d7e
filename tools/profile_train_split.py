"""Phase split of the caption train step: forward / +backward / +optimizer.

The trainer MFU rows (benchmarks/misc_train_steps.jsonl) quote one
number per step; this decomposes WHERE the non-MXU time goes by timing
three nested jitted programs at the same batch:

  loss   — forward only (analytic 1x forward FLOPs)
  grad   — value_and_grad, remat on (4x: fwd + 2x bwd + 1x recompute)
  step   — grad + AdamW update + state rebuild (adds ~zero FLOPs but a
           full fp32 read/write pass over params + moments + grads:
           ~250M params -> ~7 GB => ~9 ms HBM floor on a v5e)

Per-phase MFU uses the same analytic accounting as
tools/bench_misc_train_steps.py; the deltas (grad - loss, step - grad)
attribute time to backward+remat and to the optimizer/state pass.

Run on the real chip: python tools/profile_train_split.py
Artifacts: benchmarks/train_profile.jsonl. Env: BATCH (64), ITERS (6).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vidil_tpu.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()  # jax ignores the env var; see jaxcache.py
from vidil_tpu.utils.bench_artifact import emit

from tools.bench_misc_train_steps import (  # analytic FLOPs, one source
    LT,
    NUM_FRM,
    V5E_PEAK_BF16_TFLOPS,
    VOCAB,
    caption_tflops,
)

BATCH = int(os.environ.get("BATCH", 64))
ITERS = int(os.environ.get("ITERS", 6))
IMAGE_SIZE = 224


def log(msg):
    print(f"[profile_train] {msg}", file=sys.stderr, flush=True)


def timed(fn, *args, sync):
    t = time.time()
    sync(fn(*args))
    log(f"  compile+1st: {time.time()-t:.1f}s")
    ts = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from vidil_tpu.config import MedConfig, ViTConfig
    from vidil_tpu.models import blip as Bm
    from vidil_tpu.models.blip import init_blip_decoder
    from vidil_tpu.train.caption import create_caption_train_state, make_caption_train_step
    from vidil_tpu.train.common import training_cfgs
    from vidil_tpu.train.retrieval import make_optimizer
    from vidil_tpu.utils.synth import synth_tree

    B = BATCH
    vit_cfg = ViTConfig.from_name("base", IMAGE_SIZE, remat=True)
    med_cfg = MedConfig(vocab_size=VOCAB)
    opt = make_optimizer(1e-5)
    log(f"device: {jax.devices()[0]}; caption batch={B}")

    shapes = jax.eval_shape(lambda: create_caption_train_state(
        init_blip_decoder(jax.random.PRNGKey(0), vit_cfg, med_cfg), opt))
    state = jax.jit(lambda: synth_tree(shapes, amplitude=0.02))()
    jax.block_until_ready(state)

    rng = np.random.RandomState(0)
    batch = {
        "video": jnp.asarray(rng.randn(B, NUM_FRM, IMAGE_SIZE, IMAGE_SIZE, 3)
                             .astype(np.float32) * 0.1),
        "input_ids": jnp.asarray(rng.randint(4, VOCAB, size=(B, LT)).astype(np.int32)),
        "attention_mask": jnp.ones((B, LT), jnp.int32),
    }
    jax.block_until_ready(batch)

    tv, tm = training_cfgs(vit_cfg, med_cfg)

    def loss_fn(params, batch):
        embeds = Bm.encode_video_frames(params, batch["video"], tv,
                                        dtype=jnp.bfloat16)
        return Bm.blip_caption_loss(params, embeds, batch["input_ids"],
                                    batch["attention_mask"], tm,
                                    prompt_length=4, dtype=jnp.bfloat16)

    loss_j = jax.jit(loss_fn)
    grad_j = jax.jit(lambda p, b: jax.value_and_grad(loss_fn)(p, b))
    step_j = jax.jit(make_caption_train_step(vit_cfg, med_cfg, opt,
                                             prompt_length=4,
                                             dtype=jnp.bfloat16),
                     donate_argnums=0)

    t_loss = timed(loss_j, state.params, batch, sync=lambda r: float(r))
    log(f"loss-only: {t_loss*1e3:.1f} ms")
    t_grad = timed(grad_j, state.params, batch, sync=lambda r: float(r[0]))
    log(f"value_and_grad: {t_grad*1e3:.1f} ms")

    # full step: thread the donated state; sync on the loss scalar
    holder = {"state": state}

    def step_once(batch):
        s, m = step_j(holder["state"], batch)
        holder["state"] = s
        return m["loss"]

    t_step = timed(step_once, batch, sync=lambda r: float(r))
    log(f"full step: {t_step*1e3:.1f} ms")

    fwd_fl = caption_tflops(B) / 4.0
    grad_fl = caption_tflops(B)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(state.params))
    emit("train_profile", {
        "metric": "caption_train_step_phase_split",
        "batch_videos": B, "num_frm": NUM_FRM, "image_size": IMAGE_SIZE,
        "loss_ms": round(t_loss * 1e3, 1),
        "loss_mfu": round(fwd_fl / t_loss / V5E_PEAK_BF16_TFLOPS, 4),
        "grad_ms": round(t_grad * 1e3, 1),
        "grad_mfu": round(grad_fl / t_grad / V5E_PEAK_BF16_TFLOPS, 4),
        "step_ms": round(t_step * 1e3, 1),
        "step_mfu": round(grad_fl / t_step / V5E_PEAK_BF16_TFLOPS, 4),
        "bwd_plus_remat_ms": round((t_grad - t_loss) * 1e3, 1),
        "optimizer_state_ms": round((t_step - t_grad) * 1e3, 1),
        "n_params": n_params,
        "optimizer_hbm_floor_ms_est": round(
            n_params * 4 * 7 / 819e9 * 1e3, 1),
        "note": "loss/grad run un-donated (params+grads co-resident); "
                "step is the donated production program synced on the "
                "loss scalar. bwd_plus_remat = grad - loss; "
                "optimizer_state = step - grad (includes AdamW moment "
                "reads/writes and the state rebuild).",
        "device": str(jax.devices()[0]),
    })


if __name__ == "__main__":
    main()
