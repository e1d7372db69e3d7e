"""Two-process jax.distributed test (the Apex small-world pattern, SURVEY §4).

Launches WORLD_SIZE=2 subprocesses on the CPU backend and exercises
vidil_tpu.utils.dist end-to-end: env rendezvous (RANK/WORLD_SIZE/
MASTER_ADDR parsing, reference utils.py:258-281), rank discovery,
a real cross-process psum, the barrier, and the per-rank tmp-JSON ->
rank-0 merge contract (reference run_video_CapFilt.py:237-291), asserting
the merged output is byte-identical to a single-process run.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")

from vidil_tpu import utils

class Args:
    pass

args = Args()
utils.init_distributed_mode(args)
rank = utils.get_rank()
world = utils.get_world_size()
assert world == 2, f"world={world}"
assert args.rank == rank and args.world_size == 2 and args.distributed

# a real collective across the two processes: global psum of the rank
import jax.numpy as jnp
from jax.experimental import multihost_utils
total = multihost_utils.process_allgather(jnp.asarray([rank], jnp.int32))
assert sorted(int(x) for x in total.ravel()) == [0, 1], total

# shard -> per-rank tmp json -> barrier -> rank-0 merge (the CLI contract)
out_dir = sys.argv[1]
items = {f"video{i}": [f"caption {i}"] for i in range(7)}
keys = sorted(items)
start, end = utils.shard_range(len(keys))
shard = {k: items[k] for k in keys[start:end]}
os.makedirs(os.path.join(out_dir, "tmp"), exist_ok=True)
with open(os.path.join(out_dir, "tmp", f"{rank}.json"), "w") as f:
    json.dump(shard, f, indent=4)
utils.barrier()
if utils.is_main_process():
    merged = {}
    for r in range(world):
        merged.update(json.load(open(os.path.join(out_dir, "tmp", f"{r}.json"))))
    with open(os.path.join(out_dir, "merged.json"), "w") as f:
        json.dump(merged, f, indent=4)
utils.barrier()
print(f"rank {rank} done", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_init_barrier_and_merge(tmp_path):
    out_dir = str(tmp_path / "out")
    worker_path = str(tmp_path / "worker.py")
    with open(worker_path, "w") as f:
        f.write(WORKER)

    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            RANK=str(rank), WORLD_SIZE="2",
            MASTER_ADDR="127.0.0.1", MASTER_PORT=str(port),
            PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""),
        )
        env.pop("COORDINATOR_ADDRESS", None)
        procs.append(subprocess.Popen(
            [sys.executable, worker_path, out_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outputs = []
    for rank, p in enumerate(procs):
        out, _ = p.communicate(timeout=240)
        outputs.append(out)
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"

    merged = json.load(open(os.path.join(out_dir, "merged.json")))
    assert merged == {f"video{i}": [f"caption {i}"] for i in range(7)}

    # byte-identical to a single-process merge of the same items
    single = json.dumps({f"video{i}": [f"caption {i}"] for i in range(7)}, indent=4)
    assert open(os.path.join(out_dir, "merged.json")).read() == single

    # rank-0 prints, rank-1 print-gated (setup_for_distributed)
    assert "rank 0 done" in outputs[0]
    assert "rank 1 done" not in outputs[1]
