"""Fused transformer MLP (fc1 -> GELU -> fc2) as one Pallas TPU kernel.

Why: in the ViT-B/384 encode — the dominant CapFilt program (ARCHITECTURE
"per-program split") — the XLA MLP runs at ~65% of the bf16-GEMM floor.
XLA materializes the (M, 4D) intermediate in HBM between the two GEMMs
(write + read ≈ 2×M·4D·2 bytes; at the 147k-token bench shape that is
~1.8 GB of avoidable traffic per layer). This kernel keeps both weight
matrices VMEM-resident and streams row blocks of x through
fc1 -> GELU -> fc2 in one pass, so HBM sees x once in and out once.

Numerics: fp32 MXU accumulation for both GEMMs and fp32 GELU; the erf
inside GELU is the A&S 7.1.26 rational-exp approximation (lax.erf/erfc
have no Pallas TPU lowering), max error ~6e-7 in fp32 — invisible after
the output cast to the input dtype (bf16 on the hot paths). Differentiable via custom_vjp with an
XLA-recompute backward (same formulas as vidil_tpu/models/layers.py mlp,
reference models/vit.py:23-41) — the kernel is forward-only.

Shapes: x (..., D), fc1 kernel (D, Dh), fc2 kernel (Dh, D). Rows are
flattened to (M, D) and padded to a multiple of the row block; weights
must fit VMEM twice over (ViT-B: 768x3072 bf16 = 4.5 MB each — fine on
v5e's 128 MB with the explicit vmem limit below).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# fp32 erf via Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7; uses only
# mul/exp, both Pallas-TPU-lowerable — lax.erf/erfc are not). The error
# vanishes under the kernel's bf16 output cast (bf16 eps ~ 8e-3); accuracy
# vs lax.erf is pinned in tests/test_fused_mlp.py.
_AS_P = 0.3275911
_AS_A = (1.061405429, -1.453152027, 1.421413741, -0.284496736, 0.254829592)


def _erf_f32(x):
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + _AS_P * a)
    poly = ((((_AS_A[0] * t + _AS_A[1]) * t + _AS_A[2]) * t
             + _AS_A[3]) * t + _AS_A[4]) * t
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact_f32(h):
    """Exact (erf-based) GELU in fp32, kernel-lowerable."""
    return 0.5 * h * (1.0 + _erf_f32(h * 0.7071067811865476))


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    h = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    a = _gelu_exact_f32(h).astype(x_ref.dtype)
    o = jnp.dot(a, w2_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = (o + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def _fused_mlp_forward(x, w1, b1, w2, b2, block_m: int = 512,
                       interpret: bool = False):
    orig_shape = x.shape
    D = orig_shape[-1]
    Dh = w1.shape[1]
    xm = x.reshape(-1, D)
    M = xm.shape[0]
    m_pad = _round_up(max(M, block_m), block_m)
    if m_pad != M:
        xm = jnp.pad(xm, ((0, m_pad - M), (0, 0)))
    b1r = b1.reshape(1, Dh)
    b2r = b2.reshape(1, D)

    out = pl.pallas_call(
        _mlp_kernel,
        grid=(m_pad // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, Dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Dh, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * m_pad * D * Dh,
            bytes_accessed=(2 * m_pad * D + 2 * D * Dh) * x.dtype.itemsize,
            transcendentals=m_pad * Dh,
        ),
        interpret=interpret,
    )(xm, w1, b1r, w2, b2r)
    return out[:M].reshape(orig_shape)


def _mlp_ref(x, w1, b1, w2, b2):
    """XLA reference used for the backward pass (matches layers.mlp with
    everything pre-cast: dot -> +bias -> exact gelu -> dot -> +bias)."""
    h = jnp.dot(x, w1) + b1
    a = jax.nn.gelu(h, approximate=False)
    return jnp.dot(a, w2) + b2


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_mlp_diff(x, w1, b1, w2, b2, block_m):
    return _fused_mlp_forward(x, w1, b1, w2, b2, block_m=block_m)


def _fused_mlp_vjp_fwd(x, w1, b1, w2, b2, block_m):
    return _fused_mlp_forward(x, w1, b1, w2, b2, block_m=block_m), (
        x, w1, b1, w2, b2)


def _fused_mlp_vjp_bwd(block_m, res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(_mlp_ref, x, w1, b1, w2, b2)
    return vjp(g.astype(x.dtype))


_fused_mlp_diff.defvjp(_fused_mlp_vjp_fwd, _fused_mlp_vjp_bwd)


def fused_mlp(params, x, block_m: int = 512, interpret: bool = False):
    """Drop-in for layers.mlp(params, x) with pre-cast inputs: params is
    {'fc1': {'kernel','bias'}, 'fc2': {...}}; cast x/params to the
    compute dtype BEFORE calling (layers.mlp_auto does this)."""
    if interpret:  # debug/CPU path, never differentiated
        return _fused_mlp_forward(x, params["fc1"]["kernel"],
                                  params["fc1"]["bias"],
                                  params["fc2"]["kernel"],
                                  params["fc2"]["bias"],
                                  block_m=block_m, interpret=True)
    return _fused_mlp_diff(x, params["fc1"]["kernel"], params["fc1"]["bias"],
                           params["fc2"]["kernel"], params["fc2"]["bias"],
                           block_m)
