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


def init_mlp(key, dim: int, hidden_dim: int, std: float = 0.02):
    k1, k2 = jax.random.split(key)
    return {"fc1": init_linear(k1, dim, hidden_dim, std), "fc2": init_linear(k2, hidden_dim, dim, std)}
