"""Microbenchmark: lax.top_k vs exact_top_k at the beam-step score shape.

The beam step selects top-(2*nb) from (rows, nb*vocab) scores every
decode step — (256, 91572) fp32 at CapFilt bench shapes. lax.top_k is
sort-based over the full width; exact_top_k tiles first (ops/topk.py).
Emits one JSON line to benchmarks/topk_ab.jsonl.

Timing uses the data-dependent chained-reps pattern (bench_attention.py):
each rep perturbs the input with the previous output so nothing is
elided, one scalar readback closes the chain, RTT subtracted.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 30


def exact_top_k(x, k, tile=2048):
    """Tiled exact top-k (per-tile top-k then top-k of candidates).

    MEASURED 6-15x SLOWER than lax.top_k at the beam shapes on v5e
    (benchmarks/topk_ab.jsonl) - XLA already lowers small-k top_k to a
    fast variable-k reduction, and the 3D per-tile top_k relayouts eat
    any win. Kept here as the measured negative; NOT used by the
    framework (ops/generation.py stays on lax.top_k).
    """
    import jax
    import jax.numpy as jnp
    B, N = x.shape
    T = (N + tile - 1) // tile
    pad = T * tile - N
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    xt = x.reshape(B, T, tile)
    tv, ti = jax.lax.top_k(xt, k)
    gidx = ti + (jnp.arange(T, dtype=ti.dtype) * tile)[None, :, None]
    fv, fj = jax.lax.top_k(tv.reshape(B, T * k), k)
    fi = jnp.take_along_axis(gidx.reshape(B, T * k), fj, axis=1)
    return fv, fi




def main():
    from vidil_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()  # jax ignores the env var; see jaxcache.py
    import jax
    import jax.numpy as jnp

    from vidil_tpu.utils.bench_artifact import emit

    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)

    one = jax.jit(lambda: jnp.float32(1.0))()
    float(one)
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(one + 0.0)
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"# rtt {rtt*1e3:.2f} ms", file=sys.stderr, flush=True)

    def timed(fn, x, k):
        @jax.jit
        def chained(x):
            def body(c, _):
                v, i = fn(c, k)
                # data-dependent perturbation: forces serial reps, value
                # change is 1e-30-scale (timing only, results unused)
                c = c + i.astype(c.dtype)[:, :1] * jnp.asarray(1e-30, c.dtype)
                return c, ()
            out, _ = jax.lax.scan(body, x, None, length=ITERS)
            return jnp.sum(out[:, :4]).astype(jnp.float32)

        float(chained(x))
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(chained(x))
            reps.append((time.perf_counter() - t0 - rtt) / ITERS)
        return float(np.median(reps) * 1e3)

    rows_list = [(256, 3 * 30524, 6), (384, 3 * 30524, 6), (96, 3 * 30524, 6)]
    results = []
    for B, N, k in rows_list:
        # on-device sin-fill synthesis (CLAUDE.md: measurement tools must
        # not device_put ~100 MB host buffers over the stall-prone tunnel)
        x = jax.jit(lambda B=B, N=N: jnp.sin(
            jnp.arange(B * N, dtype=jnp.float32) * 0.731).reshape(B, N))()
        float(jnp.sum(x[:1, :4]))
        row = {"B": B, "N": N, "k": k}
        row["lax_top_k_ms"] = round(timed(jax.lax.top_k, x, k), 3)
        for tile in (1024, 2048, 4096):
            row[f"exact2stage_t{tile}_ms"] = round(
                timed(lambda a, kk, t=tile: exact_top_k(a, kk, tile=t), x, k), 3)
        print(row, file=sys.stderr, flush=True)
        results.append(row)

    emit("topk_ab", {
        "metric": "beam_topk_ab", "iters": ITERS, "shapes": results,
        "note": "chained data-dependent reps in one jit, scalar readback "
                "close, rtt subtracted; fp32 scores like the beam step",
        "device": str(jax.devices()[0]),
    })


if __name__ == "__main__":
    main()
