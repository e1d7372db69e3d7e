"""Device meshes and basic shardings.

TPU-native replacement for the reference's torch.distributed/NCCL runtime
(reference: utils.py:258-281, DDP wrapping at train_caption_video.py:163):
a ``jax.sharding.Mesh`` over all devices, with data-parallelism as batch
sharding on the 'data' axis and optional tensor parallelism on the
'model' axis. XLA inserts the collectives (the reference's explicit
all_gather/all_reduce calls) from sharding annotations.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    """Create a ('data', 'model') mesh.

    Defaults to all devices on the data axis. ``data * model`` must equal
    the device count used.
    """
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put a pytree of host arrays with the batch axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def mesh_from_config(config: dict, devices=None) -> Mesh | None:
    """Build a ('data','model') mesh from trainer config keys.

    ``data_parallel``: data-axis size (0/absent = all remaining devices
    when model_parallel is set, else no mesh). ``model_parallel``: tensor
    axis size (default 1). Returns None when the product is 1 device —
    plain single-device jit.
    """
    devices = jax.local_devices() if devices is None else devices
    dp = int(config.get("data_parallel", 0) or 0)
    tp = int(config.get("model_parallel", 1) or 1)
    if dp == 0:
        if tp == 1:
            return None
        dp = max(1, len(devices) // tp)
    if dp * tp <= 1:
        return None
    assert dp * tp <= len(devices), (
        f"mesh {dp}x{tp} needs {dp * tp} devices, have {len(devices)}")
    return make_mesh(data=dp, model=tp, devices=devices[: dp * tp])


def batch_put(mesh: Mesh, x):
    """Place one array on the mesh: dim 0 sharded over 'data' when it
    divides evenly, replicated otherwise (inference engines use this so
    ragged tails still run, just unsharded)."""
    batchable = getattr(x, "ndim", 0) >= 1 and x.shape[0] % mesh.shape["data"] == 0
    return jax.device_put(x, batch_sharding(mesh) if batchable else replicated(mesh))
