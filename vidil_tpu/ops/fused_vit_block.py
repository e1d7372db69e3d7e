"""Fully-fused ViT transformer block as ONE Pallas TPU kernel.

Why: the ViT-B/384 encode is the dominant CapFilt program (ARCHITECTURE
"per-program split": 951 ms of the 1.74 s sum) and runs ~18 ms/layer
against a ~6 ms bf16-GEMM floor. The losses are fusion boundaries — the
fp32 LN stat passes, the flash-attention kernel handoff, and the MLP's
(M, 4D) HBM intermediate. Two earlier single-op kernels measured the
boundary cost precisely: the fused MLP wins 1.34-1.48x ISOLATED but is a
wash in situ because XLA overlaps the intermediate's HBM traffic with
adjacent program work (benchmarks/encode_mlp_ab.jsonl). Fusing the
ENTIRE pre-LN residual block (reference: models/vit.py:89-110 —
x + attn(LN1(x)); x + mlp(LN2(x))) removes the escape hatch: there is no
adjacent XLA work left to overlap, HBM sees x once in and once out per
layer, and all four weight matrices stay VMEM-resident across the whole
grid (Mosaic skips re-copying blocks whose index map is constant between
consecutive grid steps).

Kernel structure: grid = (B/frames_per_program,); each program runs
`frames_per_program` full frames through LN1 -> QKV -> per-head softmax
attention -> proj -> +residual -> LN2 -> fc1 -> GELU -> fc2 -> +residual.
The per-frame score matrix (Lp x Lp fp32, 1.6 MB at ViT-B/384's padded
640) fits VMEM outright, so attention is a plain per-head softmax — no
online-softmax machinery needed.

Numerics (matches the XLA path of models/vit.py:block_forward):
fp32 LayerNorm statistics; bf16 MXU dots with fp32 accumulation
(preferred_element_type) rounded to the input dtype between ops exactly
where the unfused path rounds (qkv/proj/fc1/fc2 outputs, softmax probs);
fp32 softmax; GELU evaluated on the bf16-rounded fc1 output in fp32 via
the A&S erf approximation shared with ops/fused_mlp.py (lax.erf has no
Pallas TPU lowering; max err ~1.5e-7, invisible at bf16).

The query/key length must arrive padded to a 128 multiple (the caller
pads ONCE before the 12-layer scan and slices after — per-layer padding
would re-buy the copies this kernel exists to kill). Padded rows beyond
`true_len` are masked as attention KEYS with an additive -1e30 bias row;
as queries/rows they produce garbage that stays row-isolated (every
non-attention op is rowwise) and is sliced off by the caller.

Differentiable via custom_vjp with an XLA-recompute backward (same
formulas as block_forward); the kernel is forward-only. Training shapes
keep the classic path anyway (ViTConfig.remat gates the fused dispatch
off — remat needs the unfused body).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vidil_tpu.ops.fused_mlp import _gelu_exact_f32

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _block_kernel(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                  wproj_ref, bproj_ref, ln2s_ref, ln2b_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                  true_len: int, num_heads: int, eps: float):
    F, Lp, D = x_ref.shape
    Dh = D // num_heads
    scale = 1.0 / math.sqrt(Dh)

    key_bias = None
    if Lp != true_len:
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, Lp), 1)
        key_bias = jnp.where(pos < true_len, 0.0, NEG_INF).astype(jnp.float32)

    ln1s = ln1s_ref[:].astype(jnp.float32)
    ln1b = ln1b_ref[:].astype(jnp.float32)
    ln2s = ln2s_ref[:].astype(jnp.float32)
    ln2b = ln2b_ref[:].astype(jnp.float32)

    def layer_norm32(x32, s, b):
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        return (x32 - mean) * jax.lax.rsqrt(var + eps) * s + b

    for f in range(F):  # static unroll: frames share the resident weights
        x = x_ref[f]  # (Lp, D), input dtype (bf16 on the hot path)
        h1 = layer_norm32(x.astype(jnp.float32), ln1s, ln1b).astype(x.dtype)
        qkv = (jnp.dot(h1, wqkv_ref[:], preferred_element_type=jnp.float32)
               + bqkv_ref[:].astype(jnp.float32)).astype(x.dtype)  # (Lp, 3D)

        attn_cols = []
        for h in range(num_heads):  # static: per-head (Lp, Dh) MXU dots
            qh = qkv[:, h * Dh:(h + 1) * Dh]
            kh = qkv[:, D + h * Dh:D + (h + 1) * Dh]
            vh = qkv[:, 2 * D + h * Dh:2 * D + (h + 1) * Dh]
            s = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32) * scale
            if key_bias is not None:
                s = s + key_bias
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
            attn_cols.append(jnp.dot(p, vh, preferred_element_type=jnp.float32)
                             .astype(x.dtype))
        attn = jnp.concatenate(attn_cols, axis=-1)  # (Lp, D) = merged heads
        proj = (jnp.dot(attn, wproj_ref[:], preferred_element_type=jnp.float32)
                + bproj_ref[:].astype(jnp.float32)).astype(x.dtype)
        y = x + proj

        h2 = layer_norm32(y.astype(jnp.float32), ln2s, ln2b).astype(x.dtype)
        hh = (jnp.dot(h2, w1_ref[:], preferred_element_type=jnp.float32)
              + b1_ref[:].astype(jnp.float32)).astype(x.dtype)
        # GELU on the bf16-rounded fc1 output, like the unfused path
        a = _gelu_exact_f32(hh.astype(jnp.float32)).astype(x.dtype)
        mo = (jnp.dot(a, w2_ref[:], preferred_element_type=jnp.float32)
              + b2_ref[:].astype(jnp.float32)).astype(x.dtype)
        o_ref[f] = y + mo


@functools.partial(jax.jit, static_argnames=(
    "true_len", "num_heads", "eps", "frames_per_program", "interpret"))
def _fused_block_forward(x, ln1s, ln1b, wqkv, bqkv, wproj, bproj,
                         ln2s, ln2b, w1, b1, w2, b2, *,
                         true_len: int, num_heads: int, eps: float,
                         frames_per_program: int = 1,
                         interpret: bool = False):
    B, Lp, D = x.shape
    Dh3 = wqkv.shape[1]
    Dm = w1.shape[1]
    F = frames_per_program
    b_pad = _round_up(B, F)
    if b_pad != B:
        x = jnp.pad(x, ((0, b_pad - B), (0, 0), (0, 0)))

    const = lambda i: (0, 0)
    row = lambda shape: pl.BlockSpec(shape, const, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_block_kernel, true_len=true_len,
                          num_heads=num_heads, eps=eps),
        grid=(b_pad // F,),
        in_specs=[
            pl.BlockSpec((F, Lp, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            row((1, D)), row((1, D)),            # ln1 scale/bias
            row((D, Dh3)), row((1, Dh3)),        # qkv
            row((D, D)), row((1, D)),            # proj
            row((1, D)), row((1, D)),            # ln2
            row((D, Dm)), row((1, Dm)),          # fc1
            row((Dm, D)), row((1, D)),           # fc2
        ],
        out_specs=pl.BlockSpec((F, Lp, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, Lp, D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * Lp * D * (3 * D + D + 2 * Dm + 2 * Lp),
            bytes_accessed=(2 * b_pad * Lp * D
                            + 4 * D * D + 2 * D * Dm) * x.dtype.itemsize,
            transcendentals=b_pad * Lp * (num_heads * Lp + Dm),
        ),
        interpret=interpret,
    )(x, ln1s.reshape(1, D), ln1b.reshape(1, D), wqkv, bqkv.reshape(1, Dh3),
      wproj, bproj.reshape(1, D), ln2s.reshape(1, D), ln2b.reshape(1, D),
      w1, b1.reshape(1, Dm), w2, b2.reshape(1, D))
    return out[:B]


def _block_ref_xla(x, ln1s, ln1b, wqkv, bqkv, wproj, bproj,
                   ln2s, ln2b, w1, b1, w2, b2, *,
                   true_len: int, num_heads: int, eps: float):
    """XLA re-statement of the kernel math (same rounding points), used as
    the custom-vjp recompute backward. Operates on the padded block; pad
    keys masked, pad rows left as the garbage the kernel also produces."""
    from vidil_tpu.models.layers import dot_product_attention

    B, Lp, D = x.shape

    def ln(x_, s, b):
        x32 = x_.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        return (y * s.astype(jnp.float32) + b.astype(jnp.float32)).astype(x_.dtype)

    h1 = ln(x, ln1s, ln1b)
    qkv = (jnp.dot(h1, wqkv) + bqkv).astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    split = lambda t: jnp.swapaxes(
        t.reshape(B, Lp, num_heads, D // num_heads), 1, 2)
    bias = None
    if Lp != true_len:
        pos = jnp.arange(Lp)
        bias = jnp.where(pos < true_len, 0.0, NEG_INF)[None, None, None, :]
    o = dot_product_attention(split(q), split(k), split(v), bias=bias)
    o = jnp.swapaxes(o, 1, 2).reshape(B, Lp, D)
    y = x + (jnp.dot(o, wproj) + bproj).astype(x.dtype)
    h2 = ln(y, ln2s, ln2b)
    hh = (jnp.dot(h2, w1) + b1).astype(x.dtype)
    a = jax.nn.gelu(hh, approximate=False)
    return y + (jnp.dot(a, w2) + b2).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17))
def _fused_block_diff(x, ln1s, ln1b, wqkv, bqkv, wproj, bproj,
                      ln2s, ln2b, w1, b1, w2, b2,
                      true_len, num_heads, eps, frames_per_program, interpret):
    return _fused_block_forward(
        x, ln1s, ln1b, wqkv, bqkv, wproj, bproj, ln2s, ln2b, w1, b1, w2, b2,
        true_len=true_len, num_heads=num_heads, eps=eps,
        frames_per_program=frames_per_program, interpret=interpret)


def _fused_block_fwd(x, ln1s, ln1b, wqkv, bqkv, wproj, bproj,
                     ln2s, ln2b, w1, b1, w2, b2,
                     true_len, num_heads, eps, frames_per_program, interpret):
    out = _fused_block_diff(x, ln1s, ln1b, wqkv, bqkv, wproj, bproj,
                            ln2s, ln2b, w1, b1, w2, b2,
                            true_len, num_heads, eps, frames_per_program,
                            interpret)
    return out, (x, ln1s, ln1b, wqkv, bqkv, wproj, bproj,
                 ln2s, ln2b, w1, b1, w2, b2)


def _fused_block_bwd(true_len, num_heads, eps, frames_per_program, interpret,
                     res, g):
    ref = functools.partial(_block_ref_xla, true_len=true_len,
                            num_heads=num_heads, eps=eps)
    _, vjp = jax.vjp(ref, *res)
    return vjp(g)


_fused_block_diff.defvjp(_fused_block_fwd, _fused_block_bwd)


def fused_vit_block(params, x, num_heads: int, eps: float, true_len: int,
                    frames_per_program: int = 1, interpret: bool = False):
    """One pre-LN ViT block (reference: models/vit.py:89-110) as a single
    Pallas program. `x` must be (B, Lp, D) with Lp a multiple of 128;
    rows at positions >= true_len are padding (masked as keys, garbage as
    rows — caller slices them off after the layer stack). Params follow
    the models/vit.py block pytree; weights are cast to x.dtype (the MXU
    dtype), LN params kept fp32 inside the kernel."""
    dt = x.dtype
    a = params["attn"]
    m = params["mlp"]
    args = (x,
            params["norm1"]["scale"], params["norm1"]["bias"],
            a["qkv"]["kernel"].astype(dt), a["qkv"]["bias"].astype(dt),
            a["proj"]["kernel"].astype(dt), a["proj"]["bias"].astype(dt),
            params["norm2"]["scale"], params["norm2"]["bias"],
            m["fc1"]["kernel"].astype(dt), m["fc1"]["bias"].astype(dt),
            m["fc2"]["kernel"].astype(dt), m["fc2"]["bias"].astype(dt))
    return _fused_block_diff(*args, true_len, num_heads, eps,
                             frames_per_program, interpret)
