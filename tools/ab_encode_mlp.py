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

OUTCOME (v5e, 2026-08-17): the kernel wins 1.34-1.48x ISOLATED (79-85%
MFU vs XLA's 57-59%) but is a WASH IN SITU — the full ViT-B/384 encode
and the grouped-ITM program measure within ±1.4% with the kernel wired
in (the in_situ phase below reproduces this). XLA hides the (M, 4D)
round-trip behind adjacent program work, and an opaque Pallas call
removes that scheduling freedom; so `use_fused_mlp` defaults to False
and the kernel stays available as a measured option.
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

    in_situ(dev)


def _median_readback_ms(fn, args, reps=7):
    float(fn(*args))  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def in_situ(dev):
    """The decision measurement: the same MLP inside the two real
    programs (full ViT-B/384 encode; grouped-ITM filter), fused on/off.
    Isolated wins that vanish here do not justify the dispatch."""
    import jax.numpy as jnp

    from vidil_tpu.config import MedConfig, ViTConfig
    from vidil_tpu.models import blip as Bm
    from vidil_tpu.models import vit as V

    F, Vv, Fr, T, L, P, D = 256, 64, 4, 5, 35, 577, 768
    row = {"phase": "in_situ", "device": dev}
    for fused in (False, True):
        key = "fused" if fused else "xla"
        vit_cfg = ViTConfig.from_name("base", image_size=384,
                                      use_fused_mlp=fused)
        shapes = jax.eval_shape(lambda: V.init_vit(jax.random.PRNGKey(0), vit_cfg))
        params = jax.jit(lambda s=shapes: synth_tree(s))()
        imgs = jax.jit(lambda: (jnp.sin(
            jnp.arange(F * 384 * 384 * 3, dtype=jnp.float32) * 1e-3)
            .reshape(F, 384, 384, 3) * 0.5))()
        jax.block_until_ready((params, imgs))
        enc = jax.jit(lambda p, x, c=vit_cfg: jnp.sum(
            V.vit_forward(p, x, c, dtype=jnp.bfloat16).astype(jnp.float32)))
        ms = _median_readback_ms(enc, (params, imgs))
        row[f"encode256_{key}_ms"] = round(ms, 1)
        log(f"in-situ encode (256 frm) {key}: {ms:.1f} ms")

        med_cfg = MedConfig(use_fused_mlp=fused)
        ishapes = jax.eval_shape(lambda: Bm.init_blip_itm(
            jax.random.PRNGKey(0), vit_cfg, med_cfg))
        iparams = jax.jit(lambda s=ishapes: synth_tree(s))()
        emb = jax.jit(lambda: (jnp.sin(
            jnp.arange(Vv * Fr * P * D, dtype=jnp.float32) * 1e-4)
            .reshape(Vv, Fr, P, D) * 0.3).astype(jnp.bfloat16))()
        rng = np.random.RandomState(0)
        ids = jnp.asarray(rng.randint(4, 30000, size=(Vv, T, L)).astype(np.int32))
        mask = jnp.ones((Vv, T, L), jnp.int32)
        jax.block_until_ready((iparams, emb))

        @jax.jit
        def itm(p, fe, ti, tm, c=med_cfg):
            img = fe.reshape((Vv * Fr,) + fe.shape[2:])
            idsb = jnp.broadcast_to(ti[:, None], (Vv, Fr, T, L)).reshape(-1, L)
            maskb = jnp.broadcast_to(tm[:, None], (Vv, Fr, T, L)).reshape(-1, L)
            logits = Bm.blip_itm_scores(p, img, idsb, maskb, c,
                                        dtype=jnp.bfloat16, group_size=T)
            return jnp.sum(jax.nn.softmax(logits, axis=1)[:, 1])

        ms = _median_readback_ms(itm, (iparams, emb, ids, mask))
        row[f"grouped_itm_{key}_ms"] = round(ms, 1)
        log(f"in-situ grouped ITM {key}: {ms:.1f} ms")
    row["encode_in_situ_speedup"] = round(
        row["encode256_xla_ms"] / row["encode256_fused_ms"], 3)
    row["itm_in_situ_speedup"] = round(
        row["grouped_itm_xla_ms"] / row["grouped_itm_fused_ms"], 3)
    emit("encode_mlp_ab", row)


if __name__ == "__main__":
    main()
