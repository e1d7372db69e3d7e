"""Microbenchmark: XLA attention vs the Pallas flash kernel on the hot shapes.

Resolves SURVEY §2b's Apex-FMHA row with measured numbers (VERDICT round-1
item 6): either the Pallas kernel wins on the shapes the framework actually
runs — ViT-B/384 self-attention (577 tokens) in CapFilt/ITM/retrieval, the
MED multimodal encoder attention, the beam-decode cross-attention over the
N*(P+1)-token video memory — or the XLA fusion does and the kernel stays off.

Run on the real chip:  python tools/bench_attention.py
Emits one JSON line per (shape, impl) with median ms over ITERS reps.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vidil_tpu.utils.bench_artifact import emit

from vidil_tpu.models.layers import dot_product_attention
from vidil_tpu.ops.flash_attention import flash_attention

ITERS = 50

# (name, B, H, Lq, Lk, D) — the shapes the framework actually executes.
#  vit_selfattn_384: ViT-B/384 self-attn, 128 frames/batch (bench.py default:
#    32 videos x 4 frames).  reference: models/vit.py:44
#  vit_selfattn_224: train-time 224px ViT (197 tokens), 32 frames.
#  med_enc_selfattn: ITM multimodal encoder self-attn over 35-token captions,
#    batched over (texts x frames) pairs.  reference: models/med.py:97
#  med_crossattn_itm: ITM cross-attn, 35 query tokens over the 577-token
#    frame memory.  reference: models/med.py:112-114
#  med_crossattn_decode: one grouped-KV beam-decode step — 96 rows
#    (32 videos x 3 beams), 1 query over the 2308-token concat-frame memory
#    (4 frames x 577).  reference: models/blip.py:197-201
SHAPES = [
    ("vit_selfattn_384", 128, 12, 577, 577, 64),
    ("vit_selfattn_224", 32, 12, 197, 197, 64),
    ("med_enc_selfattn", 512, 12, 35, 35, 64),
    ("med_crossattn_itm", 512, 12, 35, 577, 64),
    ("med_crossattn_decode", 96, 12, 1, 2308, 64),
]


def _rtt():
    """Host<->device readback latency (the only real sync on axon —
    block_until_ready returns at enqueue-ack, before execution)."""
    one = jax.jit(lambda: jnp.float32(1.0))()
    float(one)
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(one + 0.0)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


RTT = None


def timed(fn, q, k, v):
    """Median ms/op over ITERS data-dependent reps inside one jit.

    Each rep feeds the previous output back into q so nothing can be
    elided; a scalar readback (the only true sync on this platform)
    closes the timing, with the measured readback RTT subtracted."""
    global RTT
    if RTT is None:
        RTT = _rtt()
        print(f"# readback rtt: {RTT*1e3:.2f} ms", flush=True)

    @jax.jit
    def chained(q, k, v):
        def body(x, _):
            o = fn(x, k, v)
            # output becomes next q: forces serialization, same shape
            return o.astype(q.dtype), ()

        out, _ = jax.lax.scan(body, q, None, length=ITERS)
        return jnp.sum(out).astype(jnp.float32)

    float(chained(q, k, v))  # compile + execute once
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(chained(q, k, v))
        reps.append((time.perf_counter() - t0 - RTT) / ITERS)
    # ops far below the ~30 ms readback RTT can subtract to <= 0 on RTT
    # jitter (a -0.04 ms xla row shipped in r04's sweep): clamp to a 1 µs
    # floor so artifact rows stay sane — anything at the floor just means
    # "below this harness's measurement floor".
    return max(float(np.median(reps) * 1e3), 1e-3)


def main():
    dev = str(jax.devices()[0])
    print(f"# device: {dev}", flush=True)
    xla = jax.jit(dot_product_attention)
    results = []
    for name, B, H, Lq, Lk, D in SHAPES:
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, H, Lq, D).astype(np.float32), jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, H, Lk, D).astype(np.float32), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, H, Lk, D).astype(np.float32), jnp.bfloat16)
        row = {"shape": name, "B": B, "H": H, "Lq": Lq, "Lk": Lk, "D": D}
        row["xla_ms"] = timed(xla, q, k, v)
        try:
            row["pallas_ms"] = timed(flash_attention, q, k, v)
            row["speedup"] = round(row["xla_ms"] / row["pallas_ms"], 3)
        except Exception as e:  # kernel limits (shape/VMEM)
            row["pallas_ms"] = None
            row["error"] = f"{type(e).__name__}: {e}"[:200]
        emit("attention_sweep", row)
        results.append(row)
    return results


if __name__ == "__main__":
    main()
