"""Collective helpers for shard_map-style SPMD code.

The reference uses NCCL all_gather with a custom autograd Function whose
backward is all-reduce + slice (reference: models/blip_retrieval.py:576-622).
Inside ``shard_map`` JAX collectives are differentiable by construction
with exactly those semantics; these wrappers document the mapping and give
the reference names a home.

Note: under plain pjit (sharded global arrays), all-gather is the
IDENTITY — the array is already global — which is how the training losses
implement negative_all_rank=True (see models/blip_retrieval.py docstring).
These helpers are for explicit per-device shard_map code paths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def concat_all_gather(x, axis_name: str = "data"):
    """No-grad all-gather over the named axis (reference :576-587)."""
    return jax.lax.stop_gradient(jax.lax.all_gather(x, axis_name, axis=0, tiled=True))


def all_gather_with_grad(x, axis_name: str = "data"):
    """Grad-preserving all-gather (reference GatherLayer :590-622).

    jax.lax.all_gather is differentiable: its VJP is a psum_scatter of the
    cotangent — mathematically the reference's "all-reduce then take own
    slice" backward.
    """
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)


def psum(x, axis_name: str = "data"):
    return jax.lax.psum(x, axis_name)


def pmean(x, axis_name: str = "data"):
    return jax.lax.pmean(x, axis_name)
