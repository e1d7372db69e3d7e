"""Benchmark: retrieval fine-tune train-step throughput vs batch size.

One full BLIP retrieval training step (ViT-B/224 with remat, ITA + ITM +
momentum distillation + queue update, AdamW) at the reference's per-GPU
batch (8 videos x 4 frames; reference:
configs/train_blip_video_retrieval_msrvtt_pseudo.yaml) and at larger
batches to show the single-chip scaling headroom.

Prints one JSON line per batch size. Env: BATCHES (comma list, default
"8,16,32"), ITERS (default 8).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vidil_tpu.utils.bench_artifact import emit

V5E_PEAK_BF16_TFLOPS = 197.0


def analytic_train_tflops(B: int, num_frm: int = 4, image_size: int = 224,
                          Lt: int = 35, D: int = 768, layers: int = 12,
                          mlp_ratio: int = 4, patch: int = 16) -> float:
    """Analytic matmul FLOPs of one retrieval train step (ITA + ITM +
    momentum towers), counting 2*m*n*k per GEMM:

    online fwd (ViT per frame + text encoder per caption + 3B ITM rows
    each with its own (num_frm*P)-token cross-K/V), backward ~2x fwd,
    remat recompute ~1x fwd (ViT + MED scans both rematerialize), plus
    the stop-grad momentum towers (1x fwd). Elementwise excluded."""
    P = (image_size // patch) ** 2 + 1
    d2 = D * D
    m = 4 * mlp_ratio
    vit_fwd = num_frm * (2 * P * D * (patch * patch * 3)
                         + layers * ((8 + m) * P * d2 + 4 * P * P * D))
    text_fwd = layers * ((8 + m) * Lt * d2 + 4 * Lt * Lt * D)
    Mem = num_frm * P
    itm_row = layers * ((8 + m) * Lt * d2 + 4 * Lt * d2
                        + 4 * Lt * Lt * D + 4 * Lt * Mem * D)
    itm_kv = layers * 2 * 2 * Mem * d2
    online = B * (vit_fwd + text_fwd) + 3 * B * (itm_row + itm_kv)
    return (online * 4 + B * (vit_fwd + text_fwd)) / 1e12  # fwd+bwd(2x)+remat + momentum


BATCHES = [int(b) for b in os.environ.get("BATCHES", "8,16,32").split(",")]
ITERS = int(os.environ.get("ITERS", 8))
NUM_FRM = 4
# IMAGE_SIZE=384 benches the reference's commented-out 384px retrieval
# option (configs/train_blip_video_retrieval_*.yaml); USE_FLASH=0 A/Bs the
# Pallas fwd+bwd attention pair against pure XLA at that size (at 224 the
# shape gate keeps the kernel off either way).
IMAGE_SIZE = int(os.environ.get("IMAGE_SIZE", 224))
USE_FLASH = os.environ.get("USE_FLASH", "1") == "1"


def log(msg):
    import sys

    print(f"[bench_train] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from vidil_tpu.config import MedConfig, ViTConfig
    from vidil_tpu.train.retrieval import (
        create_train_state,
        make_optimizer,
        make_retrieval_train_step,
    )

    vit_cfg = ViTConfig.from_name("base", IMAGE_SIZE, remat=True,
                                  use_flash=USE_FLASH)
    med_cfg = MedConfig(vocab_size=30524)
    log(f"device: {jax.devices()[0]}")

    opt = make_optimizer(1e-5)
    t = time.time()
    state_shapes = jax.eval_shape(
        lambda: create_train_state(jax.random.PRNGKey(0), vit_cfg, med_cfg, opt,
                                   embed_dim=256, queue_size=57600))
    from vidil_tpu.utils.synth import synth_tree

    # salt=0.0 + amplitude=0.02 reproduces the original inline fill
    # bit-for-bit (synth_tree formula: sin(arange*12.9898 + 0 + i) * amp)
    synth_state = jax.jit(lambda: synth_tree(state_shapes, 0.0, amplitude=0.02))
    state = synth_state()
    jax.block_until_ready(state)
    log(f"on-device state synth: {time.time()-t:.1f}s")
    # donated state (as the trainer CLIs run it): old/new states never
    # coexist — without this the ~3.8 GB state exists 2-3x and B=8 OOMs
    step = jax.jit(make_retrieval_train_step(vit_cfg, med_cfg, opt), donate_argnums=0)

    first = True
    for B in BATCHES:
        if not first:
            # fresh state per batch size: the synthetic weights diverge to
            # nan after a few optimizer steps (timings are unaffected, but
            # the logged losses should stay meaningful); synth_tree's
            # per-call leaf counter makes every synthesis identical
            state = synth_state()
        first = False
        rng = np.random.RandomState(0)
        ids = rng.randint(4, 30000, size=(B, 35)).astype(np.int32)
        enc = ids.copy()
        enc[:, 0] = 3
        batch = {
            "video": jnp.asarray(rng.randn(B, NUM_FRM, IMAGE_SIZE, IMAGE_SIZE, 3)
                                 .astype(np.float32) * 0.1),
            "text_ids": jnp.asarray(ids),
            "enc_ids": jnp.asarray(enc),
            "text_mask": jnp.ones((B, 35), jnp.int32),
            "idx": jnp.arange(B, dtype=jnp.int32),
        }
        t = time.time()
        state, metrics = step(state, batch, 0.4, jax.random.PRNGKey(0))
        loss0 = float(metrics["loss"])
        log(f"B={B} warmup (compile): {time.time()-t:.1f}s loss={loss0:.3f}")
        ts = []
        for it in range(ITERS):
            t0 = time.perf_counter()
            state, metrics = step(state, batch, 0.4, jax.random.PRNGKey(it))
            _ = float(metrics["loss"])  # sync
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        fl = analytic_train_tflops(B, NUM_FRM, IMAGE_SIZE)
        emit("retrieval_train_step", {
            "metric": "retrieval_train_step",
            "batch_videos": B, "num_frm": NUM_FRM, "image_size": IMAGE_SIZE,
            "use_flash": USE_FLASH,
            "s_per_step": round(dt, 4),
            "frames_per_sec": round(B * NUM_FRM / dt, 1),
            "tflops_per_step": round(fl, 2),
            "mfu": round(fl / dt / V5E_PEAK_BF16_TFLOPS, 4),
            "device": str(jax.devices()[0]),
        })


if __name__ == "__main__":
    main()
