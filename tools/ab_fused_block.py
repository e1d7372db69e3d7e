"""A/B: the production encode path (XLA + flash attention) vs the
whole-layer fused Pallas ViT block (ops/fused_vit_block.py).

Motivation (ARCHITECTURE "per-program split"): the ViT-B/384 encode runs
~18 ms/layer at 128 frames against a ~6 ms bf16-GEMM floor; the losses
are fusion boundaries. Two single-op kernels measured the boundary
economics — flash attention wins isolated AND in situ (1.3-1.45x),
fused MLP wins isolated (1.34-1.48x) but is a wash in situ because XLA
overlaps the MLP's HBM intermediate with adjacent work. The fused block
removes the adjacent work entirely: one Pallas program per frame
(grid-resident weights) covers LN1->QKV->MHA->proj->res->LN2->MLP->res.

Phases:
  isolated  — one layer, (128, 640, 768): production XLA+flash body vs
              the kernel, sweeping frames_per_program.
  in_situ   — the full ViT-B/384 encode program (256 frames), classic
              scan vs use_fused_block=True. This is the decision number.

Timing: data-dependent reps chained in one jit + scalar readback with
the RTT subtracted (tools/bench_attention.py pattern; block_until_ready
returns at enqueue-ack on axon).

Run on the real chip: python tools/ab_fused_block.py
Artifacts: benchmarks/fused_block_ab.jsonl (one line per phase/shape).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vidil_tpu.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()  # jax ignores the env var; see jaxcache.py

import jax
import jax.numpy as jnp

from vidil_tpu.config import ViTConfig
from vidil_tpu.models import vit as V
from vidil_tpu.ops.fused_vit_block import fused_vit_block
from vidil_tpu.utils.bench_artifact import emit
from vidil_tpu.utils.synth import synth_tree

ITERS = 20
V5E_PEAK_BF16_TFLOPS = 197.0
FRAMES_SWEEP = (1, 2, 4, 8)


def log(msg):
    print(f"[ab_fused_block] {msg}", file=sys.stderr, flush=True)


def _rtt():
    one = jax.jit(lambda: jnp.float32(1.0))()
    float(one)
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(one + 0.0)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def timed_chain(fn, params, x, rtt, iters=ITERS):
    """Median per-iteration ms of `fn(params, x)` chained data-dependently."""

    @jax.jit
    def chained(params, x):
        def body(h, _):
            return fn(params, h).astype(x.dtype), ()

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(out.astype(jnp.float32))

    t0 = time.time()
    float(chained(params, x))
    log(f"  compile+1st: {time.time()-t0:.1f}s")
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(chained(params, x))
        reps.append((time.perf_counter() - t0 - rtt) / iters)
    return float(np.median(reps) * 1e3)


def _layer_tflops(B, L, D, Dm, H):
    """Analytic matmul FLOPs of one block at the TRUE token count."""
    gemms = 2 * B * L * D * (3 * D + D + 2 * Dm)
    attn = 2 * B * H * L * L * (D // H) * 2
    return (gemms + attn) / 1e12


def isolated(dev, rtt):
    B, L, D, H, Dm = 128, 577, 768, 12, 3072
    lp = 640
    shapes = jax.eval_shape(lambda: V.init_block(jax.random.PRNGKey(0), D, Dm))
    params = jax.jit(lambda s=shapes: synth_tree(s))()
    x = jax.jit(lambda: (jnp.sin(jnp.arange(B * lp * D, dtype=jnp.float32)
                                 * 0.119).reshape(B, lp, D) * 0.5)
                .astype(jnp.bfloat16))()
    # zero the pad rows like the real padded input
    x = x.at[:, L:, :].set(0)
    jax.block_until_ready((params, x))
    tflops = _layer_tflops(B, L, D, Dm, H)

    # production body: XLA + flash attention on the TRUE 577 tokens
    xt = x[:, :L]
    xla_ms = timed_chain(
        lambda p, h: V.block_forward(p, h, H, 1e-6, dtype=jnp.bfloat16,
                                     use_flash=True), params, xt, rtt)
    row = {"phase": "isolated", "B": B, "L": L, "D": D,
           "tflops": round(tflops, 3), "xla_flash_ms": round(xla_ms, 3),
           "xla_flash_mfu": round(
               tflops / (xla_ms / 1e3) / V5E_PEAK_BF16_TFLOPS, 3),
           "device": dev}
    log(f"one layer XLA+flash: {xla_ms:.2f} ms "
        f"({row['xla_flash_mfu']*100:.0f}% MFU)")
    best = None
    for F in FRAMES_SWEEP:
        try:
            ms = timed_chain(
                lambda p, h, F=F: fused_vit_block(p, h, H, 1e-6, true_len=L,
                                                  frames_per_program=F),
                params, x, rtt)
        except Exception as e:
            row[f"fused_f{F}_error"] = f"{type(e).__name__}: {e}"[:200]
            log(f"fused F={F} FAILED {type(e).__name__}: {e}")
            continue
        row[f"fused_f{F}_ms"] = round(ms, 3)
        log(f"fused F={F}: {ms:.2f} ms "
            f"({tflops/(ms/1e3)/V5E_PEAK_BF16_TFLOPS*100:.0f}% MFU)")
        if best is None or ms < best[1]:
            best = (F, ms)
    if best is not None:
        row["best_frames"] = best[0]
        row["fused_ms"] = round(best[1], 3)
        row["fused_mfu"] = round(
            tflops / (best[1] / 1e3) / V5E_PEAK_BF16_TFLOPS, 3)
        row["speedup"] = round(xla_ms / best[1], 3)
    emit("fused_block_ab", row)
    return best[0] if best else 1


def _median_readback_ms(fn, args, reps=7):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def in_situ(dev, best_frames, image_size: int = 384, frames: int = 256):
    """Full ViT-B encode, classic vs fused-block, at `image_size`."""
    F = frames
    row = {"phase": "in_situ", "frames": F, "best_frames": best_frames,
           "image_size": image_size, "device": dev}
    imgs = jax.jit(lambda: (jnp.sin(
        jnp.arange(F * image_size * image_size * 3, dtype=jnp.float32) * 1e-3)
        .reshape(F, image_size, image_size, 3) * 0.5))()
    base_cfg = ViTConfig.from_name("base", image_size=image_size,
                                   use_fused_block=False)
    shapes = jax.eval_shape(lambda: V.init_vit(jax.random.PRNGKey(0), base_cfg))
    params = jax.jit(lambda s=shapes: synth_tree(s))()
    jax.block_until_ready((params, imgs))
    # analytic encode FLOPs: 12 layers + patch embed
    L, D, Dm, H = base_cfg.seq_len, 768, 3072, 12
    tflops = 12 * _layer_tflops(F, L, D, Dm, H) \
        + 2 * F * (L - 1) * (16 * 16 * 3) * D / 1e12
    variants = [("classic", base_cfg),
                ("fused", ViTConfig.from_name(
                    "base", image_size=image_size, use_fused_block=True,
                    fused_block_frames=best_frames))]
    for key, cfg in variants:
        enc = jax.jit(lambda p, x, c=cfg: jnp.sum(
            V.vit_forward(p, x, c, dtype=jnp.bfloat16).astype(jnp.float32)))
        ms = _median_readback_ms(enc, (params, imgs))
        row[f"encode_{key}_ms"] = round(ms, 1)
        row[f"encode_{key}_mfu"] = round(
            tflops / (ms / 1e3) / V5E_PEAK_BF16_TFLOPS, 3)
        log(f"in-situ encode (256 frm) {key}: {ms:.1f} ms "
            f"({row[f'encode_{key}_mfu']*100:.0f}% MFU)")
    row["in_situ_speedup"] = round(
        row["encode_classic_ms"] / row["encode_fused_ms"], 3)
    # numeric drift at the real scale: cosine between variants' outputs
    out_c = jax.jit(lambda p, x: V.vit_forward(
        p, x, variants[0][1], dtype=jnp.bfloat16).astype(jnp.float32))(
            params, imgs[:8])
    out_f = jax.jit(lambda p, x: V.vit_forward(
        p, x, variants[1][1], dtype=jnp.bfloat16).astype(jnp.float32))(
            params, imgs[:8])
    num = float(jnp.sum(out_c * out_f))
    den = float(jnp.linalg.norm(out_c) * jnp.linalg.norm(out_f))
    row["output_cosine_vs_classic"] = round(num / den, 6)
    emit("fused_block_ab", row)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["all", "isolated", "in_situ"],
                    default="all")
    ap.add_argument("--best-frames", type=int, default=None,
                    help="frames_per_program for in_situ when skipping the "
                         "isolated sweep (use the recorded best_frames)")
    ap.add_argument("--image-size", type=int, default=384)
    ap.add_argument("--frames", type=int, default=256)
    a = ap.parse_args()
    dev = str(jax.devices()[0])
    log(f"device: {dev}")
    best = a.best_frames
    if a.phase in ("all", "isolated"):
        rtt = _rtt()
        log(f"readback rtt: {rtt*1e3:.2f} ms")
        best = isolated(dev, rtt)
    if a.phase in ("all", "in_situ"):
        in_situ(dev, best if best is not None else 8,
                image_size=a.image_size, frames=a.frames)


if __name__ == "__main__":
    main()
