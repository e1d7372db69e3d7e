"""Microbenchmark: attention fwd+bwd — XLA vs the Pallas flash kernel pair.

VERDICT r3 #1: the trainers' backward previously recomputed through XLA
attention; this measures whether the Pallas backward kernel
(ops/flash_attention.py:_flash_backward) plus the flash forward beats
XLA's fused fwd+bwd at the shapes the trainers actually run
(224px ViT, L=197, batches 8/32/64 videos x 4 frames) and at the 384px
encode shape. Timing: data-dependent chained reps inside one jit closed
by a scalar readback (block_until_ready is a no-op on axon), RTT
subtracted — the tools/bench_attention.py pattern.

Run on the real chip:  python tools/bench_attention_bwd.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vidil_tpu.models.layers import dot_product_attention
from vidil_tpu.ops.flash_attention import flash_attention
from vidil_tpu.utils.bench_artifact import emit

ITERS = 30

# (name, B, H, Lq, Lk, D): frame batches of the train steps (videos x 4 frm)
SHAPES = [
    ("train224_b8", 32, 12, 197, 197, 64),
    ("train224_b32", 128, 12, 197, 197, 64),
    ("train224_b64", 256, 12, 197, 197, 64),
    ("encode384_b32", 128, 12, 577, 577, 64),
]


def _rtt():
    one = jax.jit(lambda: jnp.float32(1.0))()
    float(one)
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(one + 0.0)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


RTT = None


def timed_grad(fn, q, k, v):
    """Median ms per fwd+bwd over ITERS data-dependent reps in one jit:
    dq feeds the next rep's q so nothing is elided."""
    global RTT
    if RTT is None:
        RTT = _rtt()
        print(f"# readback rtt: {RTT*1e3:.2f} ms", flush=True)

    def loss(q, k, v):
        return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

    grad = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def chained(q, k, v):
        def body(x, _):
            dq, dk, dv = grad(x, k, v)
            nxt = (dq + jnp.mean(dk) + jnp.mean(dv)).astype(q.dtype)
            return nxt, ()

        out, _ = jax.lax.scan(body, q, None, length=ITERS)
        return jnp.sum(out).astype(jnp.float32)

    float(chained(q, k, v))
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(chained(q, k, v))
        reps.append((time.perf_counter() - t0 - RTT) / ITERS)
    return float(np.median(reps) * 1e3)


def main():
    print(f"# device: {jax.devices()[0]}", flush=True)
    xla = jax.jit(dot_product_attention)
    for name, B, H, Lq, Lk, D in SHAPES:
        # inputs synthesized ON DEVICE: a 113 MB host device_put can hang
        # >15 min in a tunnel stall trough (CLAUDE.md measurement rule)
        synth = jax.jit(lambda L, salt: (jnp.sin(
            jnp.arange(B * H * L * D, dtype=jnp.float32) * 0.219 + salt)
            .reshape(B, H, L, D)).astype(jnp.bfloat16), static_argnums=0)
        q, k, v = synth(Lq, 0.0), synth(Lk, 1.0), synth(Lk, 2.0)
        jax.block_until_ready((q, k, v))
        row = {"shape": name, "B": B, "H": H, "Lq": Lq, "Lk": Lk, "D": D,
               "iters": ITERS}
        row["xla_ms"] = timed_grad(xla, q, k, v)
        try:
            row["pallas_ms"] = timed_grad(flash_attention, q, k, v)
            row["speedup"] = round(row["xla_ms"] / row["pallas_ms"], 3)
        except Exception as e:
            row["pallas_ms"] = None
            row["error"] = f"{type(e).__name__}: {e}"[:200]
        emit("attention_bwd_sweep", row)


if __name__ == "__main__":
    main()
