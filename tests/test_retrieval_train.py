"""Retrieval training: functional state, jitted step, SPMD over dp x tp mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidil_tpu.config import MedConfig, ViTConfig
from vidil_tpu.models.blip_retrieval import init_queue, dequeue_and_enqueue
from vidil_tpu.parallel import make_mesh, shard_params
from vidil_tpu.parallel.mesh import shard_batch
from vidil_tpu.train.retrieval import (
    create_train_state,
    make_optimizer,
    make_retrieval_train_step,
)

VIT = ViTConfig(image_size=32, patch_size=16, hidden_size=32, num_layers=2, num_heads=4)
MED = MedConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                intermediate_size=64, max_position_embeddings=64, encoder_width=32)
EMBED = 8
QUEUE = 32


def make_batch(B=8, N=2, L=10, seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(4, MED.vocab_size, size=(B, L)).astype(np.int32)
    enc = ids.copy()
    enc[:, 0] = 3
    return {
        "video": rng.randn(B, N, 32, 32, 3).astype(np.float32) * 0.1,
        "text_ids": ids,
        "enc_ids": enc,
        "text_mask": np.ones((B, L), np.int32),
        "idx": np.arange(B, dtype=np.int32),
    }


@pytest.fixture(scope="module")
def state_and_step():
    opt = make_optimizer(1e-4)
    state = create_train_state(jax.random.PRNGKey(0), VIT, MED, opt,
                               embed_dim=EMBED, queue_size=QUEUE)
    step = make_retrieval_train_step(VIT, MED, opt)
    return state, step


def test_train_step_runs_and_updates(state_and_step):
    state, step = state_and_step
    batch = make_batch()
    jit_step = jax.jit(step)
    s1, m1 = jit_step(state, batch, 0.4, jax.random.PRNGKey(1))
    assert np.isfinite(float(m1["loss"]))
    assert float(m1["loss_ita"]) > 0 and float(m1["loss_itm"]) > 0
    # params changed, momentum params moved slightly, queue advanced
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     state.params["vision_proj"], s1.params["vision_proj"])
    assert d["kernel"] > 0
    assert int(s1.queue.ptr) == 8
    assert int(s1.step) == 1
    # second step wraps further
    s2, m2 = jit_step(s1, make_batch(seed=1), 0.4, jax.random.PRNGKey(2))
    assert int(s2.queue.ptr) == 16
    assert np.isfinite(float(m2["loss"]))
    # temp stays in clamp range
    assert 0.001 <= float(s2.params["temp"]) <= 0.5


def test_queue_wraparound():
    q = init_queue(jax.random.PRNGKey(0), EMBED, QUEUE)
    feats = jnp.ones((8, EMBED))
    idxs = jnp.arange(8, dtype=jnp.int32)
    for i in range(5):
        q = dequeue_and_enqueue(q, feats * (i + 1), feats * (i + 1), idxs + i)
    assert int(q.ptr) == 8  # 40 % 32
    # slots 0..7 hold the 5th write
    np.testing.assert_allclose(np.asarray(q.image[:, :8]), 5.0)
    np.testing.assert_allclose(np.asarray(q.image[:, 8:16]), 2.0)


@pytest.mark.slow
def test_momentum_params_track():
    opt = make_optimizer(1e-2)
    state = create_train_state(jax.random.PRNGKey(0), VIT, MED, opt,
                               embed_dim=EMBED, queue_size=QUEUE)
    step = jax.jit(make_retrieval_train_step(VIT, MED, opt, momentum=0.5))
    s = state
    for i in range(3):
        s, _ = step(s, make_batch(seed=i), 0.4, jax.random.PRNGKey(i))
    # momentum params moved toward online params but lag behind
    p = np.asarray(s.params["vision_proj"]["kernel"])
    pm = np.asarray(s.params_m["vision_proj"]["kernel"])
    p0 = np.asarray(state.params["vision_proj"]["kernel"])
    assert not np.allclose(pm, p0)  # moved
    assert not np.allclose(pm, p)  # but lagging


@pytest.mark.slow
def test_spmd_dp_tp_mesh_matches_single_device(state_and_step):
    """One step on a 4x2 (data x model) mesh == single-device step."""
    state, step = state_and_step
    batch = make_batch()
    rng = jax.random.PRNGKey(7)

    ref_state, ref_metrics = jax.jit(step)(state, batch, 0.4, rng)

    mesh = make_mesh(data=4, model=2)
    with mesh:
        sharded_params = shard_params(state.params, mesh)
        sharded_state = state._replace(params=sharded_params)
        sharded_batch = shard_batch(mesh, batch)
        s1, m1 = jax.jit(step)(sharded_state, sharded_batch, 0.4, rng)

    assert abs(float(m1["loss"]) - float(ref_metrics["loss"])) < 1e-3
    # params agree across the distribution strategies
    d = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        jax.device_get(s1.params["text_proj"]), jax.device_get(ref_state.params["text_proj"]),
    )
    assert max(d.values()) < 1e-3


@pytest.mark.slow
def test_spmd_zero1_optimizer_sharding_matches_single_device(state_and_step):
    """ZeRO-1: with the Adam moments sharded over 'data', a mesh step must
    produce the same params/metrics as the single-device step, and the
    moment leaves must actually be distributed (not replicated)."""
    from jax.sharding import PartitionSpec as P

    from vidil_tpu.parallel.sharding import zero1_partition_spec, zero1_shard_opt_state

    state, step = state_and_step
    batch = make_batch()
    rng = jax.random.PRNGKey(7)
    ref_state, ref_metrics = jax.jit(step)(state, batch, 0.4, rng)

    mesh = make_mesh(data=4, model=2)
    with mesh:
        sharded_state = state._replace(
            params=shard_params(state.params, mesh),
            opt_state=zero1_shard_opt_state(state.opt_state, state.params, mesh))
        s1, m1 = jax.jit(step)(sharded_state, shard_batch(mesh, batch), 0.4, rng)

    assert abs(float(m1["loss"]) - float(ref_metrics["loss"])) < 1e-3
    d = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        jax.device_get(s1.params["text_proj"]), jax.device_get(ref_state.params["text_proj"]),
    )
    assert max(d.values()) < 1e-3

    # the specs put 'data' on a real axis of every big leaf, composed with TP
    specs = zero1_partition_spec(state.params, mesh)
    flat_specs = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    assert any("data" in (s or ()) for spec in flat_specs for s in spec)
    # and the INPUT moments were genuinely distributed over the mesh
    mu_leaves = [x for x in jax.tree.leaves(sharded_state.opt_state)
                 if hasattr(x, "sharding") and x.ndim >= 2]
    assert any(not x.sharding.is_fully_replicated for x in mu_leaves)
    # the step preserved the moment sharding (outputs stay ZeRO-sharded)
    out_leaves = [x for x in jax.tree.leaves(s1.opt_state)
                  if hasattr(x, "sharding") and x.ndim >= 2]
    assert any(not x.sharding.is_fully_replicated for x in out_leaves)


def test_partition_spec_rules():
    from jax.sharding import PartitionSpec as P

    from vidil_tpu.parallel.sharding import model_partition_spec

    opt = make_optimizer(1e-4)
    state = create_train_state(jax.random.PRNGKey(0), VIT, MED, opt,
                               embed_dim=EMBED, queue_size=QUEUE)
    specs = model_partition_spec(state.params, divisible_by=2)
    assert specs["visual_encoder"]["blocks"]["attn"]["qkv"]["kernel"] == P(None, None, "model")
    assert specs["visual_encoder"]["blocks"]["attn"]["proj"]["kernel"] == P(None, "model", None)
    assert specs["text_encoder"]["layers"]["mlp"]["fc1"]["kernel"] == P(None, None, "model")
    assert specs["text_encoder"]["layers"]["mlp"]["fc2"]["kernel"] == P(None, "model", None)
    assert specs["visual_encoder"]["pos_embed"] == P()
    assert specs["temp"] == P()


def test_full_state_checkpoint_resume(state_and_step, tmp_path):
    """save_train_state/load_train_state roundtrips the WHOLE pytree
    (optax NamedTuple opt_state, momentum params, queues), and a resumed
    step is bit-identical to an uninterrupted run."""
    from vidil_tpu.utils.checkpoint import load_train_state, save_train_state

    state, step = state_and_step
    jit_step = jax.jit(step)
    s1, _ = jit_step(state, make_batch(), 0.4, jax.random.PRNGKey(1))

    path = str(tmp_path / "ck")
    save_train_state(path, s1, meta={"epoch": 3})

    # fresh template with identical shapes but different values
    template = create_train_state(jax.random.PRNGKey(7), VIT, MED,
                                  make_optimizer(1e-4), embed_dim=EMBED, queue_size=QUEUE)
    restored, meta = load_train_state(path, template)
    assert meta == {"epoch": 3}
    for a, b in zip(jax.tree_util.tree_leaves(s1), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    batch2 = make_batch(seed=1)
    cont, mc = jit_step(s1, batch2, 0.4, jax.random.PRNGKey(2))
    res, mr = jit_step(restored, batch2, 0.4, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(mc["loss"]), np.asarray(mr["loss"]))
    assert int(res.queue.ptr) == int(cont.queue.ptr)


def test_load_train_state_shape_mismatch(tmp_path):
    from vidil_tpu.utils.checkpoint import load_train_state, save_train_state

    save_train_state(str(tmp_path / "ck"), {"a": np.zeros((2, 3))})
    with pytest.raises(ValueError, match="shape"):
        load_train_state(str(tmp_path / "ck"), {"a": np.zeros((3, 2))})
    with pytest.raises(ValueError, match="leaves"):
        load_train_state(str(tmp_path / "ck"), {"a": np.zeros((2, 3)), "b": np.zeros(1)})


def test_mesh_from_config():
    from vidil_tpu.parallel.mesh import mesh_from_config

    devs = jax.devices()[:8]
    assert mesh_from_config({}, devs) is None
    assert mesh_from_config({"data_parallel": 1, "model_parallel": 1}, devs) is None
    m = mesh_from_config({"data_parallel": 4}, devs)
    assert dict(m.shape) == {"data": 4, "model": 1}
    m = mesh_from_config({"model_parallel": 2}, devs)  # dp fills remaining
    assert dict(m.shape) == {"data": 4, "model": 2}
    m = mesh_from_config({"data_parallel": 2, "model_parallel": 2}, devs)
    assert dict(m.shape) == {"data": 2, "model": 2}
    with pytest.raises(AssertionError):
        mesh_from_config({"data_parallel": 16}, devs)
