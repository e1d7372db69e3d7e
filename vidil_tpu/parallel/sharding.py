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
