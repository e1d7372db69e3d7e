"""Flash attention (Pallas TPU kernel).

Online-softmax tiled attention for the framework's hot attention op — the
ViT-B/384 self-attention over 577 patch tokens (CapFilt captioning, ITM
filtering, BLIP-mode tokenization, retrieval eval). The reference
environment's equivalents are Apex's fused FMHA/softmax CUDA kernels
(SURVEY §2b; docker/apex/apex/contrib/csrc/fmha/).

Design (measured on TPU v5e, tools/bench_attention.py):
- XLA's unfused attention materializes the fp32 logits in HBM; at the
  ViT-B/384 shape (128 frames x 12 heads x 577^2) that is ~2 GB of traffic
  per layer and XLA runs ~7.4 ms. When the logits fit in VMEM (224px
  training shapes, short text attention, single-query decode steps) XLA
  fuses everything on-chip and is essentially at the roofline — the kernel
  cannot win there, so `attention_auto` only dispatches to Pallas when the
  logits would spill.
- All heads of one batch item are processed inside ONE grid program
  (static python loop): grid programs run sequentially on the TensorCore
  with ~2 us of per-program overhead, so a (B*H, q-blocks) grid at ViT
  scale (4.6k programs) pays ~10 ms in overhead alone.
- Matmuls run on the MXU in the input dtype (bf16) with fp32 accumulation
  (`preferred_element_type`); softmax statistics are fp32. An fp32 matmul
  here would halve MXU throughput for no accuracy the bf16 inputs can use.
- Block sizes round up to the 128-lane granularity of the actual sequence
  lengths instead of fixed power-of-two tiles: 577 -> one 640 block, not
  two 512 blocks (a 78% padding blowup on the K side).

Differentiable: a custom VJP recomputes the backward through the XLA
attention (same math to ~1 bf16 ulp), so training shapes that cross the
dispatch gate (batches >= ~29 videos at 224px) get the kernel forward and
a correct gradient; small training shapes stay entirely on XLA's fused
path, which wins there (ARCHITECTURE.md records the measurements).
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

# fp32 logits below this spill threshold => XLA keeps the whole attention
# fused in VMEM and is faster than any custom kernel (measured: 59 MB logits
# at 224px/32 frames -> XLA 0.03 ms; 2 GB at 384px/128 frames -> XLA 7.4 ms
# vs Pallas ~2.5 ms).  v5e VMEM is 128 MB.
_LOGITS_SPILL_BYTES = 128 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref=None, *, kv_len: int,
                  block_k: int, num_heads: int):
    """One (batch, q-block) program: all heads, online softmax over K blocks.

    q_ref/o_ref: (H, block_q, D);  k_ref/v_ref: (H, kv_padded, D).
    q arrives pre-scaled by 1/sqrt(D) (cheaper on (Lq, D) than on the
    (block_q, block_k) scores). The kernel is VPU-bound on fp32 score
    passes, so masking is minimized: KV blocks that are entirely real skip
    it, and the single tail block adds a precomputed (1, block_k) bias row
    (one broadcast add) instead of an iota/compare/where chain.
    """
    kv_padded = k_ref.shape[1]
    num_kv_blocks = kv_padded // block_k
    block_q = q_ref.shape[1]
    d = q_ref.shape[2]
    # blocks [0, full_blocks) have no padded keys; only the last block can
    full_blocks = kv_len // block_k

    tail_bias = None
    if kv_padded != kv_len:
        tail_pos = (full_blocks * block_k
                    + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1))
        tail_bias = jnp.where(tail_pos < kv_len, 0.0, NEG_INF).astype(jnp.float32)

    for h in range(num_heads):  # static unroll: heads share the program
        q = q_ref[h]  # (block_q, D), input dtype — bf16 feeds the MXU

        def step(i, carry, bias):
            m_prev, l_prev, acc = carry
            k = k_ref[h, pl.ds(i * block_k, block_k), :]
            v = v_ref[h, pl.ds(i * block_k, block_k), :]
            # bf16 MXU dot, fp32 accumulation
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            if bias is not None:
                s = s + bias

            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            # bf16 inputs: materialize probabilities directly in bf16 (one
            # fp32 pass saved; the bf16 term rounding in the l-sum is below
            # the bf16 output rounding). fp32 inputs keep fp32 probs.
            p = jnp.exp(s - m_new).astype(v.dtype)
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True,
                                             dtype=jnp.float32)
            acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
            return m_new, l_new, acc

        carry = (jnp.full((block_q, 1), NEG_INF, jnp.float32),
                 jnp.zeros((block_q, 1), jnp.float32),
                 jnp.zeros((block_q, d), jnp.float32))
        if full_blocks == 1:
            carry = step(0, carry, None)
        elif full_blocks > 1:
            carry = jax.lax.fori_loop(0, full_blocks,
                                      lambda i, c: step(i, c, None), carry)
        if full_blocks < num_kv_blocks:  # the (single) partially-padded block
            carry = step(full_blocks, carry, tail_bias)
        m, l, acc = carry
        o_ref[h] = (acc / l).astype(o_ref.dtype)
        if lse_ref is not None:
            # logsumexp rows for the backward kernel's softmax
            # reconstruction (p = exp(s - lse)); only the differentiable
            # path pays for this output — inference compiles without it
            lse_ref[h] = (m + jnp.log(l))[:, 0]


def flash_attention(q, k, v, interpret: bool = False):
    """Tiled attention: q (B, H, Lq, D), k/v (B, H, Lk, D) -> (B, H, Lq, D).

    No mask support (the framework's hot path — ViT self-attention —
    attends a full all-ones mask); fp32 softmax statistics, bf16 MXU
    matmuls, output in q.dtype.

    Differentiable: a Pallas backward kernel (``_flash_backward``)
    computes dq/dk/dv from the saved output + logsumexp rows when the
    whole query axis fits one block (every framework shape: ViT-384's
    577, train-224's 197); longer-query shapes fall back to recomputing
    through the XLA attention. Gradients match XLA's to bf16 rounding
    (tests/test_flash_attention.py pins the tolerance).
    """
    if interpret:  # debug/CPU path, never differentiated
        return _flash_forward(q, k, v, interpret=True)
    return _flash_diff(q, k, v)


@jax.custom_vjp
def _flash_diff(q, k, v):
    return _flash_forward(q, k, v)


def _flash_vjp_fwd(q, k, v):
    o, lse = _flash_forward(q, k, v, with_stats=True)
    return o, (q, k, v, o, lse)


def _flash_vjp_bwd(res, g):
    q, k, v, o, lse = res
    Lq, Lk = q.shape[2], k.shape[2]
    # Pallas backward needs the whole padded q axis in one block (no dk/dv
    # accumulation across q blocks) AND k/v/dk/dv all VMEM-resident —
    # twice the forward's KV footprint — so gate BOTH axes; shapes the
    # forward kernel handles but the backward can't (very long Lk) fall
    # back to recomputing through XLA, the pre-kernel behavior.
    if _round_up(Lq, 128) <= 1024 and _round_up(Lk, 128) <= 8192:
        return _flash_backward(q, k, v, o, lse, g.astype(q.dtype))
    _, vjp = jax.vjp(lambda q, k, v: dot_product_attention(q, k, v), q, k, v)
    return vjp(g.astype(q.dtype))


_flash_diff.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def _flash_bwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, g_ref,
                      dq_ref, dk_ref, dv_ref, *,
                      kv_len: int, block_k: int, num_heads: int):
    """One batch item per program, all heads static-unrolled, whole q axis
    in one block (the framework's shapes: 197/577 padded to 256/640).

    Standard flash backward from saved (o, lse):
      D  = rowsum(g * o)                (fp32)
      p  = exp(s - lse)                 (s = q_scaled @ k^T, fp32 stats)
      dv = p^T @ g
      dp = g @ v^T
      ds = p * (dp - D)
      dq = (ds @ k) * scale ; dk = ds^T @ q_scaled
    q arrives PRE-scaled (like the forward); the chain rule through that
    prescale is the trailing *scale on dq. p/ds round to the input dtype
    before their MXU dots — the same rounding the forward applies to p,
    so gradients track the kernel's own forward to ~1 bf16 ulp. KV blocks
    that are entirely real skip masking; the single padded tail block
    adds the precomputed bias row (p -> 0 there, so padded dk/dv rows
    stay zero). Padded q rows carry g = 0, zeroing their dk/dv
    contributions; their dq rows are sliced off outside.
    """
    kv_padded = k_ref.shape[1]
    num_kv_blocks = kv_padded // block_k
    d = q_ref.shape[2]
    full_blocks = kv_len // block_k

    tail_bias = None
    if kv_padded != kv_len:
        tail_pos = (full_blocks * block_k
                    + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1))
        tail_bias = jnp.where(tail_pos < kv_len, 0.0, NEG_INF).astype(jnp.float32)

    for h in range(num_heads):
        q = q_ref[h]          # (block_q, D) pre-scaled, input dtype
        g = g_ref[h]          # (block_q, D)
        o = o_ref[h]
        lse = lse_ref[h][:, None]  # (block_q, 1) fp32
        delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)  # (block_q, 1)

        def block(i, dq_acc, bias):
            k = k_ref[h, pl.ds(i * block_k, block_k), :]
            v = v_ref[h, pl.ds(i * block_k, block_k), :]
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            if bias is not None:
                s = s + bias
            p = jnp.exp(s - lse)                      # fp32 (block_q, block_k)
            pb = p.astype(v.dtype)
            dv_ref[h, pl.ds(i * block_k, block_k), :] = jnp.dot(
                pb.T, g, preferred_element_type=jnp.float32).astype(dv_ref.dtype)
            dp = jnp.dot(g, v.T, preferred_element_type=jnp.float32)
            ds = (p * (dp - delta)).astype(q.dtype)   # rounded for the MXU
            dk_ref[h, pl.ds(i * block_k, block_k), :] = jnp.dot(
                ds.T, q, preferred_element_type=jnp.float32).astype(dk_ref.dtype)
            return dq_acc + jnp.dot(ds, k, preferred_element_type=jnp.float32)

        dq_acc = jnp.zeros((q.shape[0], d), jnp.float32)
        if full_blocks == 1:
            dq_acc = block(0, dq_acc, None)
        elif full_blocks > 1:
            dq_acc = jax.lax.fori_loop(0, full_blocks,
                                       lambda i, a: block(i, a, None), dq_acc)
        if full_blocks < num_kv_blocks:
            dq_acc = block(full_blocks, dq_acc, tail_bias)
        dq_ref[h] = dq_acc.astype(dq_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _flash_backward(q, k, v, o, lse, g, interpret: bool = False):
    """dq/dk/dv via one Pallas pass. Requires the padded query axis to fit
    a single block (<= 1024); caller falls back to XLA otherwise."""
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    scale = 1.0 / math.sqrt(D)
    qs = q * jnp.asarray(scale, q.dtype)

    lq_pad = _round_up(Lq, 128)
    lk_pad = _round_up(Lk, 128)
    block_k = lk_pad if lk_pad <= 2048 else 512
    lk_pad = _round_up(lk_pad, block_k)

    if lq_pad != Lq:
        pad_q = ((0, 0), (0, 0), (0, lq_pad - Lq), (0, 0))
        qs = jnp.pad(qs, pad_q)
        o = jnp.pad(o, pad_q)
        g = jnp.pad(g, pad_q)  # zero g rows zero the padded dk/dv terms
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, lq_pad - Lq)))
    if lk_pad != Lk:
        pad_k = ((0, 0), (0, 0), (0, lk_pad - Lk), (0, 0))
        k = jnp.pad(k, pad_k)
        v = jnp.pad(v, pad_k)

    grid = (B,)
    row = lambda b: (b, 0, 0, 0)
    qspec = pl.BlockSpec((None, H, lq_pad, D), row, memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((None, H, lk_pad, D), row, memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_kernel, kv_len=Lk, block_k=block_k,
                          num_heads=H),
        grid=grid,
        in_specs=[qspec, kspec, kspec, qspec,
                  pl.BlockSpec((None, H, lq_pad), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  qspec],
        out_specs=(qspec, kspec, kspec),
        out_shape=(jax.ShapeDtypeStruct((B, H, lq_pad, D), q.dtype),
                   jax.ShapeDtypeStruct((B, H, lk_pad, D), k.dtype),
                   jax.ShapeDtypeStruct((B, H, lk_pad, D), v.dtype)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(qs, k, v, o, lse, g)
    dq = dq[:, :, :Lq, :] * jnp.asarray(scale, q.dtype)
    return dq, dk[:, :, :Lk, :], dv[:, :, :Lk, :]


@functools.partial(jax.jit, static_argnames=("interpret", "with_stats"))
def _flash_forward(q, k, v, interpret: bool = False, with_stats: bool = False):
    """with_stats=False (inference): output O only. with_stats=True (the
    custom-vjp forward): additionally output the fp32 logsumexp rows the
    Pallas backward consumes — returns (O, lse)."""
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    q = q * jnp.asarray(1.0 / math.sqrt(D), q.dtype)  # pre-scale on (Lq, D)

    # One block when the padded length is modest (640 for ViT's 577);
    # stream 512-wide blocks with online softmax for long sequences.
    lq_pad = _round_up(Lq, 128)
    block_q = lq_pad if lq_pad <= 1024 else 512
    lq_pad = _round_up(lq_pad, block_q)
    lk_pad = _round_up(Lk, 128)
    block_k = lk_pad if lk_pad <= 2048 else 512
    lk_pad = _round_up(lk_pad, block_k)

    if lq_pad != Lq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, lq_pad - Lq), (0, 0)))
    if lk_pad != Lk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, lk_pad - Lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, lk_pad - Lk), (0, 0)))

    # The compiler's default 16 MB scoped-VMEM limit rejects the ViT-384
    # shape (~34 MB demand with double-buffered q/K/V/o blocks plus the
    # unrolled per-head score buffers); v5e has 128 MB physical VMEM, so
    # grant a generous fixed cap and let the pipeliner use it.
    vmem_limit = 96 * 1024 * 1024

    grid = (B, lq_pad // block_q)
    o_spec = pl.BlockSpec((None, H, block_q, D), lambda b, i: (b, 0, i, 0),
                          memory_space=pltpu.VMEM)
    o_shape = jax.ShapeDtypeStruct((B, H, lq_pad, D), q.dtype)
    out_specs, out_shape = o_spec, o_shape
    if with_stats:
        out_specs = (o_spec, pl.BlockSpec((None, H, block_q),
                                          lambda b, i: (b, 0, i),
                                          memory_space=pltpu.VMEM))
        out_shape = (o_shape, jax.ShapeDtypeStruct((B, H, lq_pad), jnp.float32))
    res = pl.pallas_call(
        functools.partial(_flash_kernel, kv_len=Lk, block_k=block_k, num_heads=H),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, H, block_q, D), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, H, lk_pad, D), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, H, lk_pad, D), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(q, k, v)
    if not with_stats:
        return res[:, :, :Lq, :] if lq_pad != Lq else res
    out, lse = res
    if lq_pad != Lq:
        out = out[:, :, :Lq, :]
        lse = lse[:, :, :Lq]
    return out, lse


def _flash_profitable(q, k, bias) -> bool:
    """Kernel dispatch rule, from measurement (tools/bench_attention.py):
    Pallas wins only when the fp32 logits would spill out of VMEM AND the
    query axis is long enough that the 128-lane padding doesn't dominate
    (ViT-B/384's 577 and the grouped-rerank folds win; CLIP-L's 257x257
    measured slower than XLA even at 541 MB of spilled logits, while the
    CapFilt filter fold — 140 queries over a 577-token memory — wins).
    Empirical rule: spilled logits AND a >=512-long axis on either side.
    XLA wins otherwise (including every Lq==1 decode step)."""
    B, H, Lq, _ = q.shape
    Lk = k.shape[2]
    return (bias is None and Lq >= 128 and (Lq >= 512 or Lk >= 512)
            and q.shape[-1] <= 256
            and B * H * Lq * Lk * 4 >= _LOGITS_SPILL_BYTES)


def attention_auto(q, k, v, bias=None, use_flash: bool = True, interpret: bool = False):
    """flash_attention when measured-profitable (no bias, logits would
    spill VMEM), XLA otherwise. Off-TPU placements always take the XLA
    path unless interpret=True: the kernel carries TPU CompilerParams and
    fails to lower elsewhere, and the profitability table was measured on
    a v5e anyway (placement-aware: a computation explicitly placed on the
    coexisting CPU backend must not dispatch the TPU kernel)."""
    from vidil_tpu.models.layers import on_tpu

    if use_flash and _flash_profitable(q, k, bias):
        if interpret or on_tpu(q):
            return flash_attention(q, k, v, interpret=interpret)
    return dot_product_attention(q, k, v, bias=bias)
