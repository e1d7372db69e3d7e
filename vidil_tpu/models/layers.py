"""Functional transformer primitives shared by ViT / MED / CLIP.

Design: params are plain nested dicts of jnp arrays (pytrees); every layer
is a pure function ``f(params, x, ...)``. This keeps checkpoint conversion
(torch state_dict -> pytree) trivial, makes pjit sharding a matter of
annotating the pytree, and avoids framework indirection in the hot path.

Kernels follow the JAX convention ``(in_features, out_features)``; the
converter transposes torch's ``(out, in)`` weights.

Compute dtype: pass ``dtype=jnp.bfloat16`` to run matmuls on the MXU in
bf16; layer norms and softmax always accumulate in fp32.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def remat_policy(name):
    """Resolve a config ``remat_policy`` string to a jax.checkpoint policy.

    None -> recompute everything in the backward (classic remat);
    "dots" -> ``dots_with_no_batch_dims_saveable``: save plain-GEMM outputs
    (QKV/proj/MLP linears — their dot_generals carry no batch dims), still
    recompute the batched attention einsums and elementwise ops. Trades HBM
    for skipping the GEMM recompute that dominates remat's extra FLOPs.
    """
    if name is None:
        return None
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    raise ValueError(f"unknown remat_policy: {name!r}")


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    """Truncated normal in (-2*std, 2*std), matching timm trunc_normal_."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def init_linear(key, in_dim: int, out_dim: int, std: float = 0.02):
    kkey, _ = jax.random.split(key)
    return {
        "kernel": trunc_normal(kkey, (in_dim, out_dim), std=std),
        "bias": jnp.zeros((out_dim,), jnp.float32),
    }


def init_layer_norm(dim: int):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def init_embedding(key, num: int, dim: int, std: float = 0.02):
    return {"embedding": trunc_normal(key, (num, dim), std=std)}


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def linear(params, x, dtype=None):
    kernel = params["kernel"]
    bias = params["bias"]
    if dtype is not None:
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        bias = bias.astype(dtype)
    return jnp.dot(x, kernel) + bias


def layer_norm(params, x, eps: float = 1e-6):
    """LayerNorm with fp32 statistics regardless of input dtype."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def gelu(x):
    """Exact (erf) GELU — matches torch.nn.GELU / HF 'gelu'."""
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x):
    """x * sigmoid(1.702 x) — OpenAI CLIP activation."""
    return x * jax.nn.sigmoid(1.702 * x)


ACT2FN = {"gelu": gelu, "quick_gelu": quick_gelu, "relu": jax.nn.relu}


def embedding_lookup(params, ids):
    return jnp.take(params["embedding"], ids, axis=0)


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------

def split_heads(x, num_heads: int):
    """(..., L, H*Dh) -> (..., H, L, Dh)"""
    *lead, L, D = x.shape
    x = x.reshape(*lead, L, num_heads, D // num_heads)
    return jnp.swapaxes(x, -3, -2)


def merge_heads(x):
    """(..., H, L, Dh) -> (..., L, H*Dh)"""
    x = jnp.swapaxes(x, -3, -2)
    *lead, L, H, Dh = x.shape
    return x.reshape(*lead, L, H * Dh)


def dot_product_attention(q, k, v, bias=None, scale=None):
    """Softmax attention with fp32 logits/softmax.

    q: (..., H, Lq, Dh), k/v: (..., H, Lk, Dh), bias broadcastable to
    (..., H, Lq, Lk), additive (0 for attend, large negative for mask).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("...hqd,...hkd->...hqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("...hqk,...hkd->...hqd", probs.astype(v.dtype), v)
    return out


def mask_to_bias(mask, dtype=jnp.float32, neg: float = -10000.0):
    """{0,1} attention mask -> additive bias; matches the reference's
    ``(1 - mask) * -10000`` convention (reference: models/med.py:667)."""
    return ((1.0 - mask.astype(jnp.float32)) * neg).astype(dtype)


# ---------------------------------------------------------------------------
# fused-style blocks
# ---------------------------------------------------------------------------

def mlp(params, x, act=gelu, dtype=None):
    """fc1 -> act -> fc2 (reference: models/vit.py:23-41, med.py:291-317)."""
    h = linear(params["fc1"], x, dtype=dtype)
    h = act(h)
    return linear(params["fc2"], h, dtype=dtype)


# Measured on v5e (tools/ab_encode_mlp.py + small-M sweep, 768x3072 bf16):
# XLA wins at <=768 flattened rows (0.45-0.58x), the fused kernel wins
# 1.3-2.1x at >=2048 (79-85% MFU vs XLA's 57-59%). Decode steps (192 rows)
# and prefills stay on XLA; encodes/ITM text towers take the kernel.
_FUSED_MLP_MIN_ROWS = 2048
_FUSED_MLP_MAX_WEIGHT_BYTES = 64 * 1024 * 1024  # both weights VMEM-resident


def on_tpu(x) -> bool:
    """True when `x` will execute on a TPU: a concrete array's committed
    placement when available (a CPU backend coexists with the TPU in this
    environment — see CLAUDE.md), else the process-default backend (the
    tracer case: jit lowering targets the default backend unless the
    caller placed inputs elsewhere, which the concrete branch catches)."""
    try:
        return all(d.platform == "tpu" for d in x.devices())
    except Exception:
        return jax.default_backend() == "tpu"


def mlp_auto(params, x, act=gelu, dtype=None, use_fused: bool = False,
             interpret: bool = False):
    """mlp() with measured dispatch to the fused Pallas MLP kernel
    (ops/fused_mlp.py — the Apex fused-MLP/fused-dense analogue, SURVEY
    §2b). Fused only for exact-GELU MLPs with >= _FUSED_MLP_MIN_ROWS
    flattened rows whose weights fit VMEM, on a TPU backend (the kernel
    carries TPU CompilerParams; off-TPU always takes XLA). `use_fused`
    defaults False to agree with ViTConfig/MedConfig.use_fused_mlp (the
    measured in-situ wash — ARCHITECTURE.md)."""
    rows = x.size // x.shape[-1]
    k1 = params["fc1"]["kernel"]
    itemsize = jnp.dtype(dtype).itemsize if dtype is not None else k1.dtype.itemsize
    if (use_fused and act is gelu and rows >= _FUSED_MLP_MIN_ROWS
            and 2 * k1.size * itemsize <= _FUSED_MLP_MAX_WEIGHT_BYTES
            and (interpret or on_tpu(x))):
        from vidil_tpu.ops.fused_mlp import fused_mlp

        if dtype is not None:
            params = jax.tree.map(lambda a: a.astype(dtype), params)
            x = x.astype(dtype)
        return fused_mlp(params, x, block_m=256, interpret=interpret)
    return mlp(params, x, act=act, dtype=dtype)


def init_mlp(key, dim: int, hidden_dim: int, std: float = 0.02):
    k1, k2 = jax.random.split(key)
    return {"fc1": init_linear(k1, dim, hidden_dim, std), "fc2": init_linear(k2, hidden_dim, dim, std)}
