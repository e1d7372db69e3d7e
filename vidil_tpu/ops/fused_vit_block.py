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

Differentiable via custom_vjp, with TWO backward strategies:

* default: XLA-recompute vjp through `_block_ref_xla`. That recompute
  re-buys every HBM boundary the forward fusion removed, so the fused
  path measured NEGATIVE inside autodiff this way (r4: caption 0.621 vs
  0.578 s/step).
* `pallas_bwd=True`: a SECOND Pallas kernel (`_block_bwd_kernel`) — the
  flash-attention fwd+bwd playbook applied to the whole block. It
  recomputes the forward inside the kernel from the saved residual input
  x (VMEM-resident: the recompute costs no HBM round-trips), then
  backpropagates through the entire block, emitting dx plus all 12
  weight/bias grads. Weight-grad outputs use constant index maps and
  accumulate in fp32 across the sequential TPU grid (zero-initialized at
  program 0 — the flash `_flash_bwd_kernel` accumulation pattern).
  Memory profile equals FULL per-layer rematerialization (only x is
  saved per layer) — exactly what the trainers' remat policy saves — so
  the fused path is usable under training without a jax.checkpoint
  wrapper (models/vit.py dispatches it when ViTConfig.use_fused_block_bwd
  is set, even under cfg.remat).
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


def _dgelu_exact_f32(h):
    """d/dh gelu(h) = Phi(h) + h * phi(h), fp32, kernel-lowerable (same
    A&S erf approximation as the forward's _gelu_exact_f32)."""
    from vidil_tpu.ops.fused_mlp import _erf_f32

    phi = jnp.exp(-0.5 * h * h) * 0.3989422804014327  # N(0,1) pdf
    cdf = 0.5 * (1.0 + _erf_f32(h * 0.7071067811865476))
    return cdf + h * phi


def _block_bwd_kernel(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                      wproj_ref, bproj_ref, ln2s_ref, ln2b_ref,
                      w1_ref, b1_ref, w2_ref, b2_ref, g_ref,
                      dx_ref, dln1s_ref, dln1b_ref, dwqkv_ref, dbqkv_ref,
                      dwproj_ref, dbproj_ref, dln2s_ref, dln2b_ref,
                      dw1_ref, db1_ref, dw2_ref, db2_ref, *,
                      true_len: int, num_heads: int, eps: float):
    """Whole-block backward: recompute the forward from x (same rounding
    points as _block_kernel), then reverse-mode by hand. All per-frame
    intermediates live in VMEM; weight/bias grads accumulate in fp32
    across the sequential grid."""
    F, Lp, D = x_ref.shape
    Dh = D // num_heads
    scale = 1.0 / math.sqrt(Dh)
    f32 = jnp.float32

    grad_refs = (dln1s_ref, dln1b_ref, dwqkv_ref, dbqkv_ref, dwproj_ref,
                 dbproj_ref, dln2s_ref, dln2b_ref, dw1_ref, db1_ref,
                 dw2_ref, db2_ref)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in grad_refs:
            r[...] = jnp.zeros_like(r)

    key_bias = None
    if Lp != true_len:
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, Lp), 1)
        key_bias = jnp.where(pos < true_len, 0.0, NEG_INF).astype(f32)

    ln1s = ln1s_ref[:].astype(f32)
    ln1b = ln1b_ref[:].astype(f32)
    ln2s = ln2s_ref[:].astype(f32)
    ln2b = ln2b_ref[:].astype(f32)

    def ln_stats(x32):
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        r = jax.lax.rsqrt(var + eps)
        return (x32 - mean) * r, r

    def ln_bwd(dh, xhat, r, s):
        # d/dx of xhat(x)*s+b given upstream dh (all fp32)
        dxhat = dh * s
        return r * (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True)
                    - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))

    def rowsum(t32):
        return jnp.sum(t32, axis=0, keepdims=True)  # (1, X) fp32

    def dot_tn(a, b):  # a^T @ b with MXU fp32 accumulation
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    def dot_nt(a, b):  # a @ b^T
        return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    acc = [None] * 12  # python-level per-program accumulators (fp32)

    def add(i, v):
        acc[i] = v if acc[i] is None else acc[i] + v

    for f in range(F):  # static unroll: frames share the resident weights
        x = x_ref[f]
        dt = x.dtype
        g32 = g_ref[f].astype(f32)

        # ---- forward recompute (rounding points match _block_kernel) ----
        x32 = x.astype(f32)
        xhat1, r1 = ln_stats(x32)
        h1 = (xhat1 * ln1s + ln1b).astype(dt)
        qkv = (jnp.dot(h1, wqkv_ref[:], preferred_element_type=f32)
               + bqkv_ref[:].astype(f32)).astype(dt)

        def head_fwd(h):
            qh = qkv[:, h * Dh:(h + 1) * Dh]
            kh = qkv[:, D + h * Dh:D + (h + 1) * Dh]
            vh = qkv[:, 2 * D + h * Dh:2 * D + (h + 1) * Dh]
            s = jnp.dot(qh, kh.T, preferred_element_type=f32) * scale
            if key_bias is not None:
                s = s + key_bias
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p32 = e / jnp.sum(e, axis=-1, keepdims=True)
            return qh, kh, vh, p32

        attn_cols = []
        for h in range(num_heads):
            _, _, vh, p32 = head_fwd(h)
            attn_cols.append(
                jnp.dot(p32.astype(dt), vh,
                        preferred_element_type=f32).astype(dt))
        attn = jnp.concatenate(attn_cols, axis=-1)
        proj = (jnp.dot(attn, wproj_ref[:], preferred_element_type=f32)
                + bproj_ref[:].astype(f32)).astype(dt)
        y = x + proj
        y32 = y.astype(f32)
        xhat2, r2 = ln_stats(y32)
        h2 = (xhat2 * ln2s + ln2b).astype(dt)
        hh = (jnp.dot(h2, w1_ref[:], preferred_element_type=f32)
              + b1_ref[:].astype(f32)).astype(dt)
        hh32 = hh.astype(f32)
        a = _gelu_exact_f32(hh32).astype(dt)

        # ---- backward ----
        gb = g32.astype(dt)
        add(11, rowsum(g32))                        # db2
        add(10, dot_tn(a, gb))                      # dw2
        da = dot_nt(gb, w2_ref[:])                  # (Lp, Dm) f32
        dhh32 = da * _dgelu_exact_f32(hh32)
        dhh = dhh32.astype(dt)
        add(9, rowsum(dhh32))                       # db1
        add(8, dot_tn(h2, dhh))                     # dw1
        dh2 = dot_nt(dhh, w1_ref[:])                # (Lp, D) f32
        add(6, rowsum(dh2 * xhat2))                 # dln2s
        add(7, rowsum(dh2))                         # dln2b
        dy = g32 + ln_bwd(dh2, xhat2, r2, ln2s)
        dyb = dy.astype(dt)
        add(5, rowsum(dy))                          # dbproj
        add(4, dot_tn(attn, dyb))                   # dwproj
        dattn = dot_nt(dyb, wproj_ref[:])           # (Lp, D) f32

        dq_cols, dk_cols, dv_cols = [], [], []
        for h in range(num_heads):
            qh, kh, vh, p32 = head_fwd(h)  # recompute: cheaper than storing
            doh = dattn[:, h * Dh:(h + 1) * Dh].astype(dt)
            dv_cols.append(dot_tn(p32.astype(dt), doh))     # (Lk, Dh)
            dp = dot_nt(doh, vh)                            # (Lq, Lk) f32
            ds = p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))
            dsb = (ds * scale).astype(dt)
            dq_cols.append(jnp.dot(dsb, kh, preferred_element_type=f32))
            dk_cols.append(dot_tn(dsb, qh))                 # (Lk, Dh)
        dqkv32 = jnp.concatenate(dq_cols + dk_cols + dv_cols, axis=-1)
        dqkvb = dqkv32.astype(dt)
        add(3, rowsum(dqkv32))                      # dbqkv
        add(2, dot_tn(h1, dqkvb))                   # dwqkv
        dh1 = dot_nt(dqkvb, wqkv_ref[:])            # (Lp, D) f32
        add(0, rowsum(dh1 * xhat1))                 # dln1s
        add(1, rowsum(dh1))                         # dln1b
        dx = dy + ln_bwd(dh1, xhat1, r1, ln1s)
        dx_ref[f] = dx.astype(dt)

    for i, r in enumerate(grad_refs):
        r[...] += acc[i].astype(r.dtype)


@functools.partial(jax.jit, static_argnames=(
    "true_len", "num_heads", "eps", "frames_per_program", "interpret"))
def _fused_block_backward(x, ln1s, ln1b, wqkv, bqkv, wproj, bproj,
                          ln2s, ln2b, w1, b1, w2, b2, g, *,
                          true_len: int, num_heads: int, eps: float,
                          frames_per_program: int = 1,
                          interpret: bool = False):
    """Dispatch the whole-block backward kernel; returns cotangents in the
    primal argument order/shapes/dtypes of _fused_block_diff."""
    B, Lp, D = x.shape
    Dh3 = wqkv.shape[1]
    Dm = w1.shape[1]
    F = frames_per_program
    b_pad = _round_up(B, F)
    if b_pad != B:
        # zero-padded cotangent frames contribute zero to every grad
        x = jnp.pad(x, ((0, b_pad - B), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, b_pad - B), (0, 0), (0, 0)))

    const = lambda i: (0, 0)
    row = lambda shape: pl.BlockSpec(shape, const, memory_space=pltpu.VMEM)
    grad_shape = lambda shape: jax.ShapeDtypeStruct(shape, jnp.float32)
    frames = pl.BlockSpec((F, Lp, D), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_block_bwd_kernel, true_len=true_len,
                          num_heads=num_heads, eps=eps),
        grid=(b_pad // F,),
        in_specs=[
            frames,                              # x
            row((1, D)), row((1, D)),            # ln1 scale/bias
            row((D, Dh3)), row((1, Dh3)),        # qkv
            row((D, D)), row((1, D)),            # proj
            row((1, D)), row((1, D)),            # ln2
            row((D, Dm)), row((1, Dm)),          # fc1
            row((Dm, D)), row((1, D)),           # fc2
            frames,                              # g
        ],
        out_specs=[
            frames,                              # dx
            row((1, D)), row((1, D)),            # dln1
            row((D, Dh3)), row((1, Dh3)),        # dqkv
            row((D, D)), row((1, D)),            # dproj
            row((1, D)), row((1, D)),            # dln2
            row((D, Dm)), row((1, Dm)),          # dfc1
            row((Dm, D)), row((1, D)),           # dfc2
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, Lp, D), x.dtype),
            grad_shape((1, D)), grad_shape((1, D)),
            grad_shape((D, Dh3)), grad_shape((1, Dh3)),
            grad_shape((D, D)), grad_shape((1, D)),
            grad_shape((1, D)), grad_shape((1, D)),
            grad_shape((D, Dm)), grad_shape((1, Dm)),
            grad_shape((Dm, D)), grad_shape((1, D)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            # ~3x the forward: recompute (1x) + two grad GEMMs per fwd GEMM
            flops=6 * b_pad * Lp * D * (3 * D + D + 2 * Dm + 2 * Lp),
            bytes_accessed=(3 * b_pad * Lp * D * x.dtype.itemsize
                            + (4 * D * D + 2 * D * Dm)
                            * (x.dtype.itemsize + 4)),
            transcendentals=2 * b_pad * Lp * (num_heads * Lp + Dm),
        ),
        interpret=interpret,
    )(x, ln1s.reshape(1, D), ln1b.reshape(1, D), wqkv, bqkv.reshape(1, Dh3),
      wproj, bproj.reshape(1, D), ln2s.reshape(1, D), ln2b.reshape(1, D),
      w1, b1.reshape(1, Dm), w2, b2.reshape(1, D), g)
    (dx, dln1s, dln1b, dwqkv, dbqkv, dwproj, dbproj,
     dln2s, dln2b, dw1, db1, dw2, db2) = outs
    return (dx[:B],
            dln1s.reshape(D).astype(ln1s.dtype),
            dln1b.reshape(D).astype(ln1b.dtype),
            dwqkv.astype(wqkv.dtype),
            dbqkv.reshape(Dh3).astype(bqkv.dtype),
            dwproj.astype(wproj.dtype),
            dbproj.reshape(D).astype(bproj.dtype),
            dln2s.reshape(D).astype(ln2s.dtype),
            dln2b.reshape(D).astype(ln2b.dtype),
            dw1.astype(w1.dtype),
            db1.reshape(Dm).astype(b1.dtype),
            dw2.astype(w2.dtype),
            db2.reshape(D).astype(b2.dtype))


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17, 18, 19))
def _fused_block_diff(x, ln1s, ln1b, wqkv, bqkv, wproj, bproj,
                      ln2s, ln2b, w1, b1, w2, b2,
                      true_len, num_heads, eps, frames_per_program, interpret,
                      pallas_bwd, bwd_frames):
    return _fused_block_forward(
        x, ln1s, ln1b, wqkv, bqkv, wproj, bproj, ln2s, ln2b, w1, b1, w2, b2,
        true_len=true_len, num_heads=num_heads, eps=eps,
        frames_per_program=frames_per_program, interpret=interpret)


def _fused_block_fwd(x, ln1s, ln1b, wqkv, bqkv, wproj, bproj,
                     ln2s, ln2b, w1, b1, w2, b2,
                     true_len, num_heads, eps, frames_per_program, interpret,
                     pallas_bwd, bwd_frames):
    out = _fused_block_diff(x, ln1s, ln1b, wqkv, bqkv, wproj, bproj,
                            ln2s, ln2b, w1, b1, w2, b2,
                            true_len, num_heads, eps, frames_per_program,
                            interpret, pallas_bwd, bwd_frames)
    return out, (x, ln1s, ln1b, wqkv, bqkv, wproj, bproj,
                 ln2s, ln2b, w1, b1, w2, b2)


def _fused_block_bwd(true_len, num_heads, eps, frames_per_program, interpret,
                     pallas_bwd, bwd_frames, res, g):
    if pallas_bwd:
        return _fused_block_backward(
            *res, g, true_len=true_len, num_heads=num_heads, eps=eps,
            frames_per_program=bwd_frames, interpret=interpret)
    ref = functools.partial(_block_ref_xla, true_len=true_len,
                            num_heads=num_heads, eps=eps)
    _, vjp = jax.vjp(ref, *res)
    return vjp(g)


_fused_block_diff.defvjp(_fused_block_fwd, _fused_block_bwd)


def fused_vit_block(params, x, num_heads: int, eps: float, true_len: int,
                    frames_per_program: int = 1, interpret: bool = False,
                    pallas_bwd: bool = False, bwd_frames: int = 1):
    """One pre-LN ViT block (reference: models/vit.py:89-110) as a single
    Pallas program. `x` must be (B, Lp, D) with Lp a multiple of 128;
    rows at positions >= true_len are padding (masked as keys, garbage as
    rows — caller slices them off after the layer stack). Params follow
    the models/vit.py block pytree; weights are cast to x.dtype (the MXU
    dtype), LN params kept fp32 inside the kernel. `pallas_bwd` selects
    the whole-block Pallas backward kernel (recompute-inside-VMEM;
    `bwd_frames` frames per backward grid program) instead of the
    XLA-recompute vjp."""
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
                             frames_per_program, interpret,
                             pallas_bwd, bwd_frames)
