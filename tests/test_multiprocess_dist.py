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


EVAL_WORKER = r"""
import json, os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from vidil_tpu import utils

class Args:
    pass

utils.init_distributed_mode(Args())
rank, world = utils.get_rank(), utils.get_world_size()
assert world == 2

from vidil_tpu.config import MedConfig, ViTConfig
from vidil_tpu.evals.retrieval import RetrievalEvaluator
from vidil_tpu.models.blip import init_blip_itm

vit = ViTConfig(image_size=32, patch_size=16, hidden_size=32, num_layers=2, num_heads=4)
med = MedConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                intermediate_size=64, max_position_embeddings=64, encoder_width=32)
params = init_blip_itm(jax.random.PRNGKey(0), vit, med)

class FakeTok:
    enc_token_id = 3
    def __call__(self, texts, **kw):
        raise NotImplementedError

ev = RetrievalEvaluator(params, vit, med, FakeTok(), k_test=3, rows_per_batch=2, dtype=None)
rng = np.random.RandomState(0)
n_vid, n_txt, Lk, L = 5, 7, 10, 9
video_feats = rng.randn(n_vid, Lk, 32).astype(np.float32) * 0.2
video_embeds = rng.randn(n_vid, 8).astype(np.float32)
text_embeds = rng.randn(n_txt, 8).astype(np.float32)
text_ids = rng.randint(4, 64, size=(n_txt, L)).astype(np.int32)
text_ids[:, 0] = 3
text_atts = np.ones((n_txt, L), np.int32)

v2t, t2v = ev.score_matrices(video_feats, video_embeds, text_embeds, text_ids, text_atts)
if utils.is_main_process():
    np.save(os.path.join(sys.argv[1], "v2t.npy"), v2t)
    np.save(os.path.join(sys.argv[1], "t2v.npy"), t2v)
utils.barrier()
"""


@pytest.mark.slow
def test_two_process_retrieval_eval_merge(tmp_path):
    """Rank-sharded rerank + process_allgather merge (the reference's
    all_reduce of the score matrices, train_retrieval_video.py:183-186)
    must reproduce the single-process score matrices."""
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir, exist_ok=True)
    worker_path = str(tmp_path / "worker.py")
    with open(worker_path, "w") as f:
        f.write(EVAL_WORKER)

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
    for rank, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"

    import numpy as np

    import jax

    from vidil_tpu.config import MedConfig, ViTConfig
    from vidil_tpu.evals.retrieval import RetrievalEvaluator
    from vidil_tpu.models.blip import init_blip_itm

    vit = ViTConfig(image_size=32, patch_size=16, hidden_size=32, num_layers=2, num_heads=4)
    med = MedConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                    intermediate_size=64, max_position_embeddings=64, encoder_width=32)
    params = init_blip_itm(jax.random.PRNGKey(0), vit, med)

    class FakeTok:
        enc_token_id = 3

        def __call__(self, texts, **kw):
            raise NotImplementedError

    ev = RetrievalEvaluator(params, vit, med, FakeTok(), k_test=3, rows_per_batch=2, dtype=None)
    rng = np.random.RandomState(0)
    n_vid, n_txt, Lk, L = 5, 7, 10, 9
    video_feats = rng.randn(n_vid, Lk, 32).astype(np.float32) * 0.2
    video_embeds = rng.randn(n_vid, 8).astype(np.float32)
    text_embeds = rng.randn(n_txt, 8).astype(np.float32)
    text_ids = rng.randint(4, 64, size=(n_txt, L)).astype(np.int32)
    text_ids[:, 0] = 3
    text_atts = np.ones((n_txt, L), np.int32)
    ref_v2t, ref_t2v = ev.score_matrices(video_feats, video_embeds, text_embeds,
                                         text_ids, text_atts)

    got_v2t = np.load(os.path.join(out_dir, "v2t.npy"))
    got_t2v = np.load(os.path.join(out_dir, "t2v.npy"))
    np.testing.assert_allclose(got_v2t, ref_v2t, atol=1e-4)
    np.testing.assert_allclose(got_t2v, ref_t2v, atol=1e-4)
