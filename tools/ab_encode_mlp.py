"""A/B: XLA MLP chain vs the fused Pallas MLP kernel at encode shapes.

The ViT-B/384 encode is the dominant CapFilt program (951 ms of the
1.59 s iteration at batch 64) and its MLP measured ~65% of the bf16-GEMM
floor under XLA (ARCHITECTURE per-program split) — the (M, 4D)
intermediate round-trips HBM between the two GEMMs. This tool measures
whether vidil_tpu/ops/fused_mlp.py (weights VMEM-resident, one pass over
row blocks) beats the XLA fusion at the shapes the framework actually
runs, sweeping the row-block size.

Timing: data-dependent reps chained in one jit + scalar readback with
the RTT subtracted (block_until_ready returns at enqueue-ack on axon —
see tools/bench_attention.py).

Run on the real chip: python tools/ab_encode_mlp.py
Artifacts: benchmarks/encode_mlp_ab.jsonl (one line per variant).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/vidil_tpu_jaxcache"))

import jax
import jax.numpy as jnp

from vidil_tpu.models.layers import init_mlp, mlp
from vidil_tpu.ops.fused_mlp import fused_mlp
from vidil_tpu.utils.bench_artifact import emit
from vidil_tpu.utils.synth import synth_tree

ITERS = 30
V5E_PEAK_BF16_TFLOPS = 197.0

# (name, rows M, D, Dh) — rows = frames x tokens of the actual programs.
#  encode_384_b256: ViT-B/384 MLP at the bench batch (256 frames x 577)
#  encode_384_b128: half batch (the profile's 128-frame shape)
#  med_itm_text: ITM text rows (512 pairs x 35 tokens, MED 768/3072)
SHAPES = [
    ("encode_384_b256", 256 * 577, 768, 3072),
    ("encode_384_b128", 128 * 577, 768, 3072),
    ("med_itm_text", 512 * 35, 768, 3072),
]

BLOCKS = [256, 512, 1024]


def log(msg):
    print(f"[ab_encode_mlp] {msg}", file=sys.stderr, flush=True)


def _rtt():
    one = jax.jit(lambda: jnp.float32(1.0))()
    float(one)
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(one + 0.0)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def timed(fn, params, x, rtt):
    @jax.jit
    def chained(params, x):
        def body(h, _):
            o = fn(params, h)
            return o.astype(x.dtype), ()

        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return jnp.sum(out.astype(jnp.float32))

    t0 = time.time()
    float(chained(params, x))  # compile + execute
    log(f"  compile+1st: {time.time()-t0:.1f}s")
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(chained(params, x))
        reps.append((time.perf_counter() - t0 - rtt) / ITERS)
    return float(np.median(reps) * 1e3)


def main():
    dev = str(jax.devices()[0])
    log(f"device: {dev}")
    rtt = _rtt()
    log(f"readback rtt: {rtt*1e3:.2f} ms")

    for name, M, D, Dh in SHAPES:
        shapes = jax.eval_shape(
            lambda D=D, Dh=Dh: init_mlp(jax.random.PRNGKey(0), D, Dh))
        params = jax.jit(lambda s=shapes: jax.tree.map(
            lambda a: a.astype(jnp.bfloat16), synth_tree(s)))()
        x = jax.jit(lambda: (jnp.sin(
            jnp.arange(M * D, dtype=jnp.float32) * 0.173).reshape(M, D)
            * 0.5).astype(jnp.bfloat16))()
        jax.block_until_ready((params, x))
        tflops = 4 * M * D * Dh / 1e12

        xla_ms = timed(lambda p, h: mlp(p, h), params, x, rtt)
        row = {"shape": name, "M": M, "D": D, "Dh": Dh,
               "tflops": round(tflops, 3), "xla_ms": round(xla_ms, 3),
               "xla_mfu": round(tflops / (xla_ms / 1e3) / V5E_PEAK_BF16_TFLOPS, 3),
               "device": dev}
        log(f"{name}: xla {xla_ms:.2f} ms ({row['xla_mfu']*100:.0f}% MFU)")
        best = None
        for bm in BLOCKS:
            try:
                ms = timed(lambda p, h, bm=bm: fused_mlp(p, h, block_m=bm),
                           params, x, rtt)
            except Exception as e:
                row[f"pallas_bm{bm}_error"] = f"{type(e).__name__}: {e}"[:160]
                log(f"{name}: pallas bm={bm} FAILED {type(e).__name__}")
                continue
            row[f"pallas_bm{bm}_ms"] = round(ms, 3)
            log(f"{name}: pallas bm={bm} {ms:.2f} ms")
            if best is None or ms < best[1]:
                best = (bm, ms)
        if best is not None:
            row["best_block_m"] = best[0]
            row["pallas_ms"] = round(best[1], 3)
            row["pallas_mfu"] = round(
                tflops / (best[1] / 1e3) / V5E_PEAK_BF16_TFLOPS, 3)
            row["speedup"] = round(xla_ms / best[1], 3)
        emit("encode_mlp_ab", row)


if __name__ == "__main__":
    main()
