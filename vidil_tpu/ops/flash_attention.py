"""Flash attention (Pallas TPU kernel).

Online-softmax tiled attention for the framework's hot attention ops —
the ViT self-attention over 577 patch tokens and the MED cross-attention
over the N*(P+1)-token video memory (the reference environment's
equivalents are Apex's fused FMHA/softmax CUDA kernels; SURVEY §2b).

Forward-only (inference paths: CapFilt captioning, ITM filtering,
retrieval eval). Training paths keep the XLA attention (autodiff'd);
a custom VJP can be added when profiling justifies it.

Usage: `flash_attention(q, k, v)` with shapes (B, H, L, D); falls back to
the XLA path when shapes don't fit the kernel's constraints.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vidil_tpu.models.layers import dot_product_attention

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, block_k: int, scale: float):
    """One (batch*head, q-block) program: stream K/V blocks with online softmax.

    q_ref: (block_q, D), k_ref/v_ref: (kv_len_padded, D), o_ref: (block_q, D).
    """
    q = q_ref[:].astype(jnp.float32) * scale
    block_q, d = q.shape
    kv_padded = k_ref.shape[0]
    num_kv_blocks = kv_padded // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (block_q, block_k)
        # mask out padded kv positions
        kv_pos = i * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(kv_pos < kv_len, s, NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_kv_blocks, body, (m0, l0, acc0))
    o_ref[:] = (acc / l).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(q, k, v, block_q: int = 256, block_k: int = 512,
                    interpret: bool = False):
    """Tiled attention: q (B, H, Lq, D), k/v (B, H, Lk, D) -> (B, H, Lq, D).

    No mask support (the framework's hot paths attend full all-ones masks);
    fp32 softmax accumulation, output in q.dtype.
    """
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    scale = 1.0 / math.sqrt(D)

    block_q = min(block_q, _round_up(Lq, 128))
    block_k = min(block_k, _round_up(Lk, 128))
    lq_pad = _round_up(Lq, block_q)
    lk_pad = _round_up(Lk, block_k)

    qf = q.reshape(B * H, Lq, D)
    kf = k.reshape(B * H, Lk, D)
    vf = v.reshape(B * H, Lk, D)
    if lq_pad != Lq:
        qf = jnp.pad(qf, ((0, 0), (0, lq_pad - Lq), (0, 0)))
    if lk_pad != Lk:
        kf = jnp.pad(kf, ((0, 0), (0, lk_pad - Lk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, lk_pad - Lk), (0, 0)))

    grid = (B * H, lq_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, kv_len=Lk, block_k=block_k, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, lk_pad, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, lk_pad, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, lq_pad, D), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :Lq, :].reshape(B, H, Lq, D)


def attention_auto(q, k, v, bias=None, use_flash: bool = True, interpret: bool = False):
    """flash_attention when applicable (no bias), XLA otherwise."""
    if use_flash and bias is None and q.shape[-1] <= 256:
        return flash_attention(q, k, v, interpret=interpret)
    return dot_product_attention(q, k, v, bias=bias)
