"""Micro-benchmark: KV-cache reorder+update cost per decode step, by layout.

Decision record for vidil_tpu/models/med.py:init_self_cache — layout C
(heads folded into the feature axis) measured 1.8x faster than the
original layout A and was adopted round 3 (real decode program:
274 -> 203 ms at 128 frames). Results append to
benchmarks/cache_layout.jsonl.

Replicates the beam-decode loop's cache traffic at bench shapes
(128 frames x 3 beams = 384 rows, 12 layers, L=20, H=12, Dh=64, bf16)
without the model: per step, gather the cache by beam index and write one
slot, inside one jitted lax.fori_loop of 16 steps. Timing closes with a
scalar readback (axon block_until_ready is a no-op).

Layouts:
  A (current): (layers, B, H, L, Dh)  — gather dim 1, DUS at dim 3
  B (carry):   (B, layers, H, L, Dh)  — gather dim 0 (contiguous rows)
  C (folded):  (layers, B, L, H*Dh)   — gather dim 1, DUS at dim 2 (row-contiguous)
"""

import os
import time

import numpy as np

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vidil_tpu.utils.bench_artifact import emit
from vidil_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()  # jax ignores the env var; see jaxcache.py

LAYERS, B, H, L, Dh = 12, 384, 12, 20, 64
STEPS = 16
REPS = 20


def run(label, make, step_fn):
    k = make()
    v = make()
    idx0 = jnp.asarray(np.random.RandomState(0).permutation(B).astype(np.int32))
    new_k = jnp.asarray(np.random.RandomState(1).randn(B, H, Dh).astype(np.float32),
                        jnp.bfloat16)

    @jax.jit
    def loop(k, v, idx, new):
        def body(t, carry):
            k, v = carry
            k, v = step_fn(k, v, idx, new, t)
            return (k, v)

        k, v = jax.lax.fori_loop(0, STEPS, body, (k, v))
        return jnp.sum(k[..., :1].astype(jnp.float32)) + jnp.sum(v[..., :1].astype(jnp.float32))

    float(loop(k, v, idx0, new_k))  # compile
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(loop(k, v, idx0, new_k))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    per_step = dt / STEPS * 1e3
    print(f"{label}: {dt*1e3:.1f} ms / {STEPS} steps = {per_step:.2f} ms/step")
    emit("cache_layout", {"layout": label, "ms_per_step": round(per_step, 3),
                          "steps": STEPS, "rows": B, "layers": LAYERS,
                          "max_len": L, "head_dim": Dh, "heads": H},
         print_line=False)
    return dt


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    bytes_cache = LAYERS * B * H * L * Dh * 2
    print(f"cache bytes per tensor: {bytes_cache/1e6:.0f} MB")

    # A: current layout
    def make_a():
        return jnp.zeros((LAYERS, B, H, L, Dh), jnp.bfloat16)

    def step_a(k, v, idx, new, t):
        k = k[:, idx]
        v = v[:, idx]
        upd = jnp.broadcast_to(new.astype(k.dtype), (LAYERS, B, H, Dh))[:, :, :, None]
        k = jax.lax.dynamic_update_slice(k, upd, (0, 0, 0, t % L, 0))
        v = jax.lax.dynamic_update_slice(v, upd, (0, 0, 0, t % L, 0))
        return k, v

    # B: batch-leading (gather contiguous rows)
    def make_b():
        return jnp.zeros((B, LAYERS, H, L, Dh), jnp.bfloat16)

    def step_b(k, v, idx, new, t):
        k = k[idx]
        v = v[idx]
        upd = jnp.broadcast_to(new.astype(k.dtype)[:, None], (B, LAYERS, H, Dh))[:, :, :, None]
        k = jax.lax.dynamic_update_slice(k, upd, (0, 0, 0, t % L, 0))
        v = jax.lax.dynamic_update_slice(v, upd, (0, 0, 0, t % L, 0))
        return k, v

    # C: heads folded, L before features (row-contiguous writes)
    def make_c():
        return jnp.zeros((LAYERS, B, L, H * Dh), jnp.bfloat16)

    def step_c(k, v, idx, new, t):
        k = k[:, idx]
        v = v[:, idx]
        upd = jnp.broadcast_to(new.reshape(B, H * Dh).astype(k.dtype),
                               (LAYERS, B, H * Dh))[:, :, None]
        k = jax.lax.dynamic_update_slice(k, upd, (0, 0, t % L, 0))
        v = jax.lax.dynamic_update_slice(v, upd, (0, 0, t % L, 0))
        return k, v

    run("A (layers,B,H,L,Dh)", make_a, step_a)
    run("B (B,layers,H,L,Dh)", make_b, step_b)
    run("C (layers,B,L,H*Dh)", make_c, step_c)


if __name__ == "__main__":
    main()
