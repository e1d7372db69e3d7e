"""Pytree checkpointing.

Replaces the reference's rank-0 ``torch.save({'model', 'optimizer',
'config', 'epoch'})`` (reference: train_caption_video.py:207-219,
utils.py:253-255) with a dependency-light npz format: flattened
'/'-joined pytree paths -> arrays, plus a JSON metadata entry. Loadable
without jax for inspection; orbax can be layered on later for async
multi-host checkpointing.
"""

from __future__ import annotations

import json

import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict):
    tree: dict = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_checkpoint(path: str, params, meta: dict | None = None) -> None:
    flat = _flatten(params)
    if meta is not None:
        flat["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **flat)


def load_checkpoint(path: str):
    """Returns (params_pytree, meta_dict_or_None)."""
    data = np.load(path if path.endswith(".npz") else path + ".npz", allow_pickle=False)
    flat = {k: data[k] for k in data.files if k != "__meta__"}
    meta = None
    if "__meta__" in data.files:
        meta = json.loads(bytes(data["__meta__"]).decode())
    return _unflatten(flat), meta


def save_train_state(path: str, state, meta: dict | None = None) -> None:
    """Checkpoint an ARBITRARY pytree (train state incl. optax NamedTuple
    optimizer states, momentum params, feature queues) by leaf index.

    The reference saves {'model','optimizer','config','epoch'} via
    torch.save (train_retrieval_video.py:262-270); here the whole
    functional train state is one pytree, restored against a freshly
    constructed template so NamedTuple/dataclass structure survives.
    """
    import jax

    leaves = jax.tree_util.tree_leaves(state)
    flat = {f"leaf_{i:05d}": np.asarray(v) for i, v in enumerate(leaves)}
    if meta is not None:
        flat["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **flat)


def load_train_state(path: str, template):
    """Restore a pytree saved by save_train_state into the structure of
    ``template`` (a freshly built state with identical shapes). Returns
    (state, meta_dict_or_None)."""
    import jax

    data = np.load(path if path.endswith(".npz") else path + ".npz", allow_pickle=False)
    meta = None
    if "__meta__" in data.files:
        meta = json.loads(bytes(data["__meta__"]).decode())
    keys = sorted(k for k in data.files if k != "__meta__")
    leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(keys) != len(leaves):
        raise ValueError(f"checkpoint has {len(keys)} leaves, template has {len(leaves)}")
    restored = []
    for k, ref in zip(keys, leaves):
        arr = data[k]
        if arr.shape != tuple(np.shape(ref)):
            raise ValueError(f"{k}: shape {arr.shape} != template {np.shape(ref)}")
        restored.append(arr)
    return jax.tree_util.tree_unflatten(treedef, restored), meta
