"""Multi-host process utilities on top of ``jax.distributed``.

TPU-native replacement for the reference's ``torch.distributed`` runtime
(reference: utils.py:258-281). One *process per host* (not per chip, unlike
the reference's one-proc-per-GPU); local chips are used by batching/sharding
inside jitted programs. The rank/world-size/merge contract (per-rank tmp JSON
+ rank-0 merge) is preserved at the host level so output files are identical.
"""

from __future__ import annotations

import builtins
import datetime
import os

_INITIALIZED = False


def is_dist_avail_and_initialized() -> bool:
    return _INITIALIZED


def get_world_size() -> int:
    import jax

    return jax.process_count() if _INITIALIZED else 1


def get_rank() -> int:
    import jax

    return jax.process_index() if _INITIALIZED else 0


def is_main_process() -> bool:
    return get_rank() == 0


def setup_for_distributed(is_master: bool) -> None:
    """Disable printing on non-master processes (reference: utils.py:214-226)."""
    builtin_print = builtins.print

    def print_fn(*args, **kwargs):
        force = kwargs.pop("force", False)
        if is_master or force:
            builtin_print(*args, **kwargs)

    builtins.print = print_fn


def init_distributed_mode(args=None) -> None:
    """Initialize multi-host JAX if a coordinator is configured.

    Recognizes the same env rendezvous the reference uses (RANK /
    WORLD_SIZE / MASTER_ADDR, or SLURM_PROCID) plus JAX's own
    COORDINATOR_ADDRESS. Single-process if nothing is set.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return

    coordinator = os.environ.get("COORDINATOR_ADDRESS")
    if coordinator is None and "RANK" in os.environ and "WORLD_SIZE" in os.environ:
        master = os.environ.get("MASTER_ADDR", "127.0.0.1")
        port = os.environ.get("MASTER_PORT", "12355")
        coordinator = f"{master}:{port}"
        os.environ.setdefault("COORDINATOR_ADDRESS", coordinator)

    num_processes = int(os.environ.get("WORLD_SIZE", os.environ.get("SLURM_NTASKS", "1")))
    process_id = int(os.environ.get("RANK", os.environ.get("SLURM_PROCID", "0")))

    if coordinator is not None and num_processes > 1:
        import jax

        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
            initialization_timeout=int(datetime.timedelta(hours=2).total_seconds()),
        )
        _INITIALIZED = True
        if args is not None:
            args.rank = process_id
            args.world_size = num_processes
            args.distributed = True
        setup_for_distributed(process_id == 0)
    else:
        if args is not None:
            args.rank = 0
            args.world_size = 1
            args.distributed = False


def barrier() -> None:
    """Cross-host barrier (reference: dist.barrier(), run_video_CapFilt.py:269).

    Implemented as a tiny psum over all devices — the canonical JAX
    host-sync idiom; a no-op in single-process mode.
    """
    if not _INITIALIZED:
        return
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("vidil_tpu_barrier")
    del jax, jnp


def save_on_master(save_fn, *args, **kwargs) -> None:
    """Run ``save_fn`` on rank 0 only (reference: utils.py:253-255)."""
    if is_main_process():
        save_fn(*args, **kwargs)
