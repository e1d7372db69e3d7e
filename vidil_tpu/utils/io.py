"""Host JSON I/O and the per-rank shard → rank-0 merge contract.

The reference parallelizes inference embarrassingly: each rank takes a
contiguous slice of the work list, writes ``tmp/{rank}*.json``, barriers,
and rank 0 merges (reference: run_video_CapFilt.py:237-291,
run_visual_tokenization.py:426-463, data/utils.py:94-123). We preserve
that contract byte-for-byte so downstream tooling is unchanged.
"""

from __future__ import annotations

import json
import os
import shutil

from vidil_tpu.utils.dist import barrier, get_rank, get_world_size, is_main_process


def load_json(path: str):
    with open(path) as f:
        return json.load(f)


def save_json(path: str, obj, indent: int = 4) -> None:
    with open(path, "w") as f:
        json.dump(obj, f, indent=indent)


def shard_range(n_items: int, rank: int | None = None, world_size: int | None = None):
    """Contiguous per-rank slice, replicating the reference arithmetic.

    reference: run_video_CapFilt.py:239-241 — ``step = len//world + 1``,
    ``start = rank*step``, ``end = min(len, start+step)``.
    """
    rank = get_rank() if rank is None else rank
    world_size = get_world_size() if world_size is None else world_size
    step = n_items // world_size + 1
    start = rank * step
    end = min(n_items, start + step)
    return start, end


def merge_rank_jsons(tmp_dir: str, out_path: str, suffix: str = ".json", cleanup: bool = False):
    """Rank-0 merge of ``tmp_dir/{rank}{suffix}`` dicts into one JSON file."""
    barrier()
    if not is_main_process():
        return None
    merged: dict = {}
    for r in range(get_world_size()):
        merged.update(load_json(os.path.join(tmp_dir, f"{r}{suffix}")))
    save_json(out_path, merged)
    if cleanup:
        shutil.rmtree(tmp_dir)
    return merged
