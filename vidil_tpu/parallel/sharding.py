"""Parameter partition rules: tensor-parallel shardings for the model pytrees.

The reference has no tensor parallelism in its own code (only vendored,
unused Megatron layers in Apex; SURVEY §2c). On TPU we get it from
sharding annotations alone: attention-head and MLP-hidden dimensions are
sharded over the 'model' mesh axis, XLA inserts the reduce-scatter /
all-reduce collectives. Embeddings, layer norms and small heads stay
replicated.

Layer kernels are stacked (L, in, out); the TP axis is therefore axis 2
for column-parallel (qkv/fc1) and axis 1 for row-parallel (out/fc2)
kernels — the Megatron Column/RowParallelLinear pattern expressed as
PartitionSpecs.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# path-suffix -> spec for stacked (L, in, out) kernels
_COLUMN_KERNELS = (
    ("attn", "qkv", "kernel"),          # ViT fused qkv
    ("self_attn", "query", "kernel"),
    ("self_attn", "key", "kernel"),
    ("self_attn", "value", "kernel"),
    ("cross_attn", "query", "kernel"),
    ("cross_attn", "key", "kernel"),
    ("cross_attn", "value", "kernel"),
    ("attn", "query", "kernel"),        # CLIP towers
    ("attn", "key", "kernel"),
    ("attn", "value", "kernel"),
    ("mlp", "fc1", "kernel"),
)
_COLUMN_BIASES = tuple(path[:-1] + ("bias",) for path in _COLUMN_KERNELS)
_ROW_KERNELS = (
    ("attn", "proj", "kernel"),
    ("self_attn", "out", "kernel"),
    ("cross_attn", "out", "kernel"),
    ("attn", "out", "kernel"),
    ("mlp", "fc2", "kernel"),
)


def _path_names(path) -> tuple:
    names = []
    for p in path:
        if hasattr(p, "key"):
            names.append(p.key)
        elif hasattr(p, "name"):
            names.append(p.name)
    return tuple(names)


def _endswith(names: tuple, suffix: tuple) -> bool:
    return len(names) >= len(suffix) and names[-len(suffix):] == suffix


def model_partition_spec(params, divisible_by: int = 1):
    """PartitionSpec pytree for a param pytree.

    Stacked layer kernels get TP sharding on 'model'; everything else is
    replicated. ``divisible_by``: skip sharding dims not divisible by the
    'model' axis size (keeps tiny test models valid).
    """

    def spec_for(path, leaf):
        names = _path_names(path)
        if leaf.ndim == 3:  # stacked (L, in, out)
            if any(_endswith(names, s) for s in _COLUMN_KERNELS):
                if leaf.shape[2] % divisible_by == 0:
                    return P(None, None, "model")
            if any(_endswith(names, s) for s in _ROW_KERNELS):
                if leaf.shape[1] % divisible_by == 0:
                    return P(None, "model", None)
        if leaf.ndim == 2 and any(_endswith(names, s) for s in _COLUMN_BIASES):
            if leaf.shape[1] % divisible_by == 0:
                return P(None, "model")
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh):
    """device_put params with TP sharding over the mesh's 'model' axis."""
    model_size = mesh.shape["model"]
    specs = model_partition_spec(params, divisible_by=model_size)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def zero1_partition_spec(params, mesh: Mesh):
    """ZeRO-1 specs for OPTIMIZER state shaped like ``params``.

    The reference replicates the full AdamW state per GPU (torch DDP has
    no optimizer sharding; SURVEY §2c). On a mesh, the moments only feed
    the elementwise update — they never enter a matmul — so they can live
    sharded over the 'data' axis: each leaf keeps its TP spec and
    additionally shards its largest still-unsharded axis that the data
    axis divides ('data' appears at most once per spec). Cuts per-chip
    optimizer HBM by ~dp× (≈1.8 GB → 0.45 GB at dp=4 for the base
    trainers); XLA turns the update into a reduce-scatter(grads) +
    sharded update + all-gather(delta) — ZeRO-1's schedule.
    """
    dp = mesh.shape["data"]
    tp = mesh.shape.get("model", 1)
    base = model_partition_spec(params, divisible_by=tp)

    def combine(leaf, spec):
        entries = list(spec) + [None] * (leaf.ndim - len(spec))
        if dp > 1:
            best, best_n = None, 1
            for ax in range(leaf.ndim):
                n = leaf.shape[ax]
                if entries[ax] is None and n % dp == 0 and n > best_n:
                    best, best_n = ax, n
            if best is not None:
                entries[best] = "data"
        return P(*entries)

    return jax.tree.map(combine, params, base)


def zero1_shard_opt_state(opt_state, params, mesh: Mesh):
    """device_put every params-shaped subtree of an optax state (the Adam
    mu/nu moment trees) with ``zero1_partition_spec`` shardings; counts,
    injected hyperparams and other non-params-shaped leaves are left as
    they are (replicated scalars). Works on any optax state built from
    NamedTuples / tuples / lists / dicts."""
    specs = zero1_partition_spec(params, mesh)
    params_def = jax.tree.structure(params)

    def put(subtree):
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), subtree, specs)

    def rec(node):
        if jax.tree.structure(node) == params_def:
            return put(node)
        if isinstance(node, tuple) and hasattr(node, "_fields"):  # NamedTuple
            return type(node)(*(rec(c) for c in node))
        if isinstance(node, (tuple, list)):
            return type(node)(rec(c) for c in node)
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return node

    return rec(opt_state)


def apply_optimizer_sharding(state, mesh, config: dict):
    """Trainer-CLI hook: opt-in ZeRO-1 via the ``optimizer_sharding:
    zero1`` config key. Returns the state with its opt_state moments
    sharded over 'data' (no-op without a mesh / dp==1 / key absent)."""
    mode = config.get("optimizer_sharding")
    if mode in (None, "", "none"):
        return state
    if mode != "zero1":
        raise ValueError(f"unknown optimizer_sharding: {mode!r}")
    if mesh is None or mesh.shape["data"] <= 1:
        return state
    state = state._replace(opt_state=zero1_shard_opt_state(
        state.opt_state, state.params, mesh))
    print(f"optimizer state sharded over the data axis (ZeRO-1, dp={mesh.shape['data']})")
    return state
