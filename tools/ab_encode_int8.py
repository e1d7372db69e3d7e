"""A/B: bf16 encode GEMMs vs dynamic-int8 quantized GEMMs (v5e int8 MXU).

The ViT-B/384 encode sits at ~30% MFU against the bf16 peak and is
GEMM-dominated (ARCHITECTURE.md per-program split). The v5e MXU runs
int8xint8->int32 at 2x the bf16 rate (394 TOPS), so dynamic-range
quantization — per-token activation scales, per-output-channel weight
scales, symmetric int8 — is the one lever that raises the encode's
*compute ceiling* rather than chasing fusion crumbs. This measures:

  phase "isolated": each encode linear shape (QKV/proj/fc1/fc2) as
    bf16 `jnp.dot` vs the full quantize->int8 dot->dequant chain (the
    quant overhead is part of the measurement; if XLA doesn't lower the
    int8 dot to the MXU the chain simply loses and that is the result).
  phase "in_situ": the full ViT-B/384 encode with (a) bf16 linears,
    (b) int8 MLP only (post-LN and post-GELU activations), (c) int8
    everything (QKV + proj + MLP); plus output-error accounting vs the
    fp32 encode (bf16-vs-fp32 error printed as the noise floor).

Run on the real chip: python tools/ab_encode_int8.py
Artifacts: benchmarks/encode_int8_ab.jsonl (one line per phase/shape).
Env: FRAMES (in-situ batch, default 128), ITERS (isolated reps, 30).

OUTCOME (v5e, 2026-08-18): MEASURED NEGATIVE. Isolated, only fc1 wins
(1.245x); qkv is 0.83x, fc2 0.80x, proj 0.96x — the per-row quantize
(two VPU passes over the fp32 activations) plus the int32->fp32 dequant
epilogue cost more than the MXU saves, and XLA's bf16 GEMMs at these
(74k, 768/3072) shapes already measure ~56-100% of the bf16 peak
(nothing like 2x headroom). In situ the full ViT-B/384 encode moves
1.002x (int8 MLP) / 1.032x (int8 everything) while output fidelity
drops (cosine vs fp32: 0.9915 bf16 -> 0.9546/0.9483; max-rel-err is
outlier-dominated under synth weights, cosine is the comparable
number). int8 stays an inference-accuracy trade with no speed to buy
it; the encode's remaining gap to peak is elementwise/attention HBM
traffic, not GEMM rate. Nothing promoted to the package.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vidil_tpu.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()  # jax ignores the env var; see jaxcache.py

import jax
import jax.numpy as jnp

from vidil_tpu.config import ViTConfig
from vidil_tpu.models import vit as V
from vidil_tpu.models.layers import (
    gelu,
    layer_norm,
    linear,
    merge_heads,
    split_heads,
)
from vidil_tpu.ops.flash_attention import attention_auto
from vidil_tpu.utils.bench_artifact import emit
from vidil_tpu.utils.synth import synth_tree

ITERS = int(os.environ.get("ITERS", 30))
FRAMES = int(os.environ.get("FRAMES", 128))
V5E_PEAK_BF16_TFLOPS = 197.0
V5E_PEAK_INT8_TOPS = 394.0


def log(msg):
    print(f"[ab_int8] {msg}", file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# dynamic int8 linear
# ---------------------------------------------------------------------------

def linear_int8(params, x):
    """y = dequant(int8(x) @ int8(W)) + b.

    Per-token (row) activation scales, per-output-channel weight scales,
    symmetric round-to-nearest clipped to +/-127. The weight quant is
    loop-invariant under scan (weights are tiny next to the (M, D)
    activations at encode batch sizes); accumulation is int32 on the
    MXU, dequant is one fp32 multiply fused into the epilogue.
    """
    w = params["kernel"].astype(jnp.float32)
    b = params["bias"].astype(jnp.float32)
    sw = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0          # (1, out)
    sw = jnp.maximum(sw, 1e-12)
    wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
    x32 = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0       # (..., 1)
    sx = jnp.maximum(sx, 1e-12)
    xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * sx * sw + b).astype(x.dtype)


# ---------------------------------------------------------------------------
# int8 ViT block (tool-local; promoted to the package only if it wins)
# ---------------------------------------------------------------------------

def _attention_q(params, x, num_heads, dtype, quant_qkv):
    lin = linear_int8 if quant_qkv else partial(linear, dtype=dtype)
    qkv = lin(params["qkv"], x)
    q, k, v = jnp.split(qkv.astype(dtype), 3, axis=-1)
    q, k, v = (split_heads(t, num_heads) for t in (q, k, v))
    out = attention_auto(q, k, v, use_flash=True)
    merged = merge_heads(out)
    if quant_qkv:
        return linear_int8(params["proj"], merged)
    return linear(params["proj"], merged, dtype=dtype)


def _block_q(params, x, num_heads, eps, dtype, quant_qkv, quant_mlp):
    h = layer_norm(params["norm1"], x, eps)
    x = x + _attention_q(params["attn"], h, num_heads, dtype, quant_qkv)
    h = layer_norm(params["norm2"], x, eps)
    if quant_mlp:
        h = linear_int8(params["mlp"]["fc1"], h)
        h = gelu(h.astype(dtype))
        h = linear_int8(params["mlp"]["fc2"], h)
    else:
        h = linear(params["mlp"]["fc1"], h, dtype=dtype)
        h = gelu(h)
        h = linear(params["mlp"]["fc2"], h, dtype=dtype)
    return x + h.astype(x.dtype)


def vit_forward_q(params, images, cfg, dtype, quant_qkv, quant_mlp):
    B = images.shape[0]
    x = V.patchify(images, cfg.patch_size)
    x = linear(params["patch_embed"], x, dtype=dtype)
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"][:, : x.shape[1], :].astype(x.dtype)

    def body(carry, layer_params):
        return _block_q(layer_params, carry, cfg.num_heads, cfg.layer_norm_eps,
                        dtype, quant_qkv, quant_mlp), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return layer_norm(params["norm"], x, cfg.layer_norm_eps)


# ---------------------------------------------------------------------------
# timing helpers (axon: readback-closed, RTT-subtracted for small ops)
# ---------------------------------------------------------------------------

def _rtt():
    one = jax.jit(lambda: jnp.float32(1.0))()
    float(one)
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(one + 0.0)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def timed_chain(fn, params, x, rtt):
    """Serialized reps via a SCALAR data dependency (the linears here are
    not shape-preserving, so output-as-next-input doesn't type-check):
    each rep's input is nudged by the previous output's full sum, which
    forces the whole GEMM before the next rep (a column-slice dep would
    let XLA narrow the dot). Both variants pay the same reduction, so
    the ratio is clean; absolute ms carries ~1 output-pass of overhead."""
    @jax.jit
    def chained(params, x):
        def body(h, _):
            o = fn(params, h)
            dep = (jnp.sum(o.astype(jnp.float32)) * 1e-20).astype(h.dtype)
            return h + dep, ()

        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return jnp.sum(out.astype(jnp.float32))

    t0 = time.time()
    float(chained(params, x))
    log(f"  compile+1st: {time.time()-t0:.1f}s")
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(chained(params, x))
        reps.append((time.perf_counter() - t0 - rtt) / ITERS)
    return max(float(np.median(reps) * 1e3), 1e-3)


def _median_readback_ms(fn, args, reps=7):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


# ---------------------------------------------------------------------------

def isolated(dev, rtt):
    """Per-linear-shape: bf16 dot vs quant->int8 dot->dequant chain."""
    M = FRAMES * 577
    for name, D, Dh in [("qkv", 768, 2304), ("proj", 768, 768),
                        ("fc1", 768, 3072), ("fc2", 3072, 768)]:
        pshape = {"kernel": jax.ShapeDtypeStruct((D, Dh), jnp.float32),
                  "bias": jax.ShapeDtypeStruct((Dh,), jnp.float32)}
        params = jax.jit(lambda s=pshape: synth_tree(s))()
        x = jax.jit(lambda D=D: (jnp.sin(
            jnp.arange(M * D, dtype=jnp.float32) * 0.173).reshape(M, D)
            * 0.5).astype(jnp.bfloat16))()
        jax.block_until_ready((params, x))
        tflops = 2 * M * D * Dh / 1e12

        bf16_ms = timed_chain(lambda p, h: linear(p, h, dtype=jnp.bfloat16),
                              params, x, rtt)
        int8_ms = timed_chain(linear_int8, params, x, rtt)
        row = {"phase": "isolated", "shape": name, "M": M, "D": D, "Dh": Dh,
               "tflops": round(tflops, 3),
               "bf16_ms": round(bf16_ms, 3),
               "bf16_mfu": round(tflops / (bf16_ms / 1e3) / V5E_PEAK_BF16_TFLOPS, 3),
               "int8_ms": round(int8_ms, 3),
               "int8_eff_vs_int8_peak": round(
                   tflops / (int8_ms / 1e3) / V5E_PEAK_INT8_TOPS, 3),
               "speedup": round(bf16_ms / int8_ms, 3),
               "device": dev}
        log(f"{name}: bf16 {bf16_ms:.2f} ms ({row['bf16_mfu']*100:.0f}%) "
            f"int8 {int8_ms:.2f} ms -> {row['speedup']}x")
        emit("encode_int8_ab", row)


def in_situ(dev):
    cfg = ViTConfig.from_name("base", image_size=384)
    shapes = jax.eval_shape(lambda: V.init_vit(jax.random.PRNGKey(0), cfg))
    params = jax.jit(lambda s=shapes: synth_tree(s))()
    imgs = jax.jit(lambda: (jnp.sin(
        jnp.arange(FRAMES * 384 * 384 * 3, dtype=jnp.float32) * 1e-3)
        .reshape(FRAMES, 384, 384, 3) * 0.5))()
    jax.block_until_ready((params, imgs))

    variants = {
        "bf16": (False, False),
        "int8_mlp": (False, True),
        "int8_all": (True, True),
    }
    row = {"phase": "in_situ", "frames": FRAMES, "image_size": 384,
           "device": dev}
    outs = {}
    for name, (qq, qm) in variants.items():
        fwd = jax.jit(lambda p, x, qq=qq, qm=qm: vit_forward_q(
            p, x, cfg, jnp.bfloat16, qq, qm))
        ms = _median_readback_ms(
            lambda p, x, f=fwd: jnp.sum(f(p, x).astype(jnp.float32)),
            (params, imgs))
        row[f"{name}_ms"] = round(ms, 1)
        log(f"in-situ encode ({FRAMES} frm) {name}: {ms:.1f} ms")
        outs[name] = np.asarray(fwd(params, imgs), np.float32)

    # error accounting vs the fp32 encode (chained jit per CLAUDE.md:
    # one program, scalar readback; fp32 run is timing-irrelevant)
    fp32 = np.asarray(jax.jit(lambda p, x: V.vit_forward(p, x, cfg))(
        params, imgs), np.float32)
    scale = float(np.abs(fp32).max())
    for name in variants:
        err = float(np.abs(outs[name] - fp32).max()) / scale
        cos = float(np.sum(outs[name] * fp32)
                    / (np.linalg.norm(outs[name]) * np.linalg.norm(fp32)))
        row[f"{name}_max_rel_err_vs_fp32"] = round(err, 5)
        row[f"{name}_cosine_vs_fp32"] = round(cos, 6)
    row["speedup_int8_mlp"] = round(row["bf16_ms"] / row["int8_mlp_ms"], 3)
    row["speedup_int8_all"] = round(row["bf16_ms"] / row["int8_all_ms"], 3)
    emit("encode_int8_ab", row)


def main():
    dev = str(jax.devices()[0])
    log(f"device: {dev}")
    rtt = _rtt()
    log(f"readback rtt: {rtt*1e3:.2f} ms")
    isolated(dev, rtt)
    in_situ(dev)


if __name__ == "__main__":
    main()
