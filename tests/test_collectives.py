"""shard_map exercises for parallel/collectives.py.

Pins the JAX collective wrappers to the reference's NCCL semantics
(models/blip_retrieval.py:576-622): ``concat_all_gather`` is the no-grad
gather, ``GatherLayer``/``all_gather_with_grad`` is the grad-preserving
gather whose backward is "all-reduce the cotangent, keep your slice".
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from vidil_tpu.parallel.collectives import (
    all_gather_with_grad,
    concat_all_gather,
    pmean,
    psum,
)

N = 4


@pytest.fixture(scope="module")
def mesh():
    devs = np.asarray(jax.devices()[:N])
    return Mesh(devs, ("data",))


def test_all_gather_with_grad_matches_global_computation(mesh):
    """A contrastive-style loss over gathered features must produce the
    same value AND gradient as the unsharded global computation — the
    property the reference's GatherLayer exists to provide
    (negative_all_rank=True hard-negative mining)."""
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(8, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(16, 16).astype(np.float32) * 0.1)

    def global_loss(feats, w):
        z = feats @ w
        sims = z @ z.T  # all-pairs similarities (global negatives)
        return jnp.mean(jax.nn.logsumexp(sims, axis=1) - jnp.diag(sims))

    def sharded_loss(feats, w):
        def body(f_shard, w):
            z_local = f_shard @ w
            z_all = all_gather_with_grad(z_local)  # (8, 16) on every device
            sims = z_local @ z_all.T               # local rows vs ALL columns
            row = jax.lax.axis_index("data") * f_shard.shape[0] + jnp.arange(f_shard.shape[0])
            diag = jnp.take_along_axis(sims, row[:, None], axis=1)[:, 0]
            local = jnp.sum(jax.nn.logsumexp(sims, axis=1) - diag)
            return psum(local) / 8.0

        fn = shard_map(body, mesh=mesh, in_specs=(P("data"), P()),
                       out_specs=P())
        return fn(feats, w)

    feats_sh = jax.device_put(feats, NamedSharding(mesh, P("data")))
    l_ref, g_ref = jax.value_and_grad(global_loss, argnums=(0, 1))(feats, w)
    l_sh, g_sh = jax.jit(jax.value_and_grad(sharded_loss, argnums=(0, 1)))(feats_sh, w)
    assert float(l_sh) == pytest.approx(float(l_ref), rel=1e-5)
    np.testing.assert_allclose(np.asarray(g_sh[0]), np.asarray(g_ref[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_sh[1]), np.asarray(g_ref[1]), atol=1e-5)


def test_all_gather_with_grad_vjp_is_allreduce_then_slice(mesh):
    """Explicit VJP form: for y = all_gather(x), the cotangent flowing
    back to each shard must be its own slice of the (device-identical)
    upstream cotangent — the reference's 'all-reduce then slice' backward
    (GatherLayer.backward, blip_retrieval.py:598-607)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(8, 4).astype(np.float32))
    ct = jnp.asarray(rng.randn(8, 4).astype(np.float32))  # upstream cotangent

    def f(x):
        def body(x_shard):
            return all_gather_with_grad(x_shard)  # replicated (8, 4)

        # check_vma=False: the varying-mesh-axes check cannot statically
        # infer that a tiled all_gather output is replicated
        return shard_map(body, mesh=mesh, in_specs=P("data"), out_specs=P(),
                         check_vma=False)(x)

    x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))
    y, vjp = jax.vjp(f, x_sh)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)
    (gx,) = vjp(ct)
    # identical cotangent on every device -> each shard receives exactly
    # its own rows (all-reduce of one replicated copy == itself; slice)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ct), atol=1e-6)


def test_concat_all_gather_blocks_gradient(mesh):
    """concat_all_gather must carry NO gradient (reference
    concat_all_gather docstring: '*** Warning ***: torch.distributed.
    all_gather has no gradient.')."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(8, 4).astype(np.float32))

    def loss(x):
        def body(x_shard):
            gathered = concat_all_gather(x_shard)
            # loss touches x only through the no-grad gather
            return psum(jnp.sum(gathered * gathered)) / N

        # check_vma=False: the varying-mesh-axes check cannot statically
        # infer that a tiled all_gather output is replicated
        return shard_map(body, mesh=mesh, in_specs=P("data"), out_specs=P(),
                         check_vma=False)(x)

    g = jax.grad(loss)(jax.device_put(x, NamedSharding(mesh, P("data"))))
    np.testing.assert_array_equal(np.asarray(g), np.zeros_like(x))


def test_psum_pmean(mesh):
    x = jnp.arange(float(N))

    def body(x_shard):
        return psum(jnp.sum(x_shard)), pmean(jnp.sum(x_shard))

    s, m = shard_map(body, mesh=mesh, in_specs=P("data"), out_specs=(P(), P()))(
        jax.device_put(x, NamedSharding(mesh, P("data"))))
    assert float(s) == pytest.approx(6.0)
    assert float(m) == pytest.approx(1.5)
