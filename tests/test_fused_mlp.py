"""Fused Pallas MLP kernel vs the XLA mlp (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidil_tpu.models.layers import init_mlp, mlp
from vidil_tpu.ops.fused_mlp import _erf_f32, _mlp_ref, fused_mlp


def test_kernel_erf_accuracy_vs_lax():
    """Pallas TPU cannot lower lax.erf/erfc, so the kernel uses the
    A&S 7.1.26 rational-exp approximation; pin its error budget (the
    published bound is 1.5e-7 in exact arithmetic, ~6e-7 in fp32)."""
    x = jnp.linspace(-6.0, 6.0, 200001, dtype=jnp.float32)
    err = np.abs(np.asarray(_erf_f32(x)) - np.asarray(jax.lax.erf(x)))
    assert err.max() < 1e-6, err.max()


@pytest.mark.parametrize("rows,D,Dh,block_m", [
    (70, 128, 512, 64),      # row padding (70 -> 128)
    (128, 128, 512, 64),     # exact blocks
    (33, 256, 1024, 256),    # fewer rows than one block
])
def test_fused_mlp_matches_xla_fp32(rows, D, Dh, block_m):
    rng = np.random.RandomState(0)
    params = init_mlp(jax.random.PRNGKey(0), D, Dh)
    x = jnp.asarray(rng.randn(rows, D).astype(np.float32))
    ref = np.asarray(mlp(params, x))
    got = np.asarray(fused_mlp(params, x, block_m=block_m, interpret=True))
    # fp32 path: bitwise-equal dots; GELU differs by the in-kernel rational
    # erf (~5e-7 per activation, summed over Dh fc2 terms)
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-5)


def test_fused_mlp_bf16_close_to_xla():
    """bf16 pre-cast path: the kernel runs GELU in fp32 (XLA runs it in
    bf16), so outputs differ by at most ~1 bf16 ulp of the activations."""
    rng = np.random.RandomState(1)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                          init_mlp(jax.random.PRNGKey(1), 128, 512))
    x = jnp.asarray(rng.randn(2, 70, 128).astype(np.float32)).astype(jnp.bfloat16)
    ref = np.asarray(mlp(params, x)).astype(np.float32)
    got = np.asarray(fused_mlp(params, x, block_m=64, interpret=True)).astype(np.float32)
    np.testing.assert_allclose(got, ref, atol=0.04, rtol=0.04)
    assert got.shape == ref.shape


def test_fused_mlp_leading_dims_flattened():
    rng = np.random.RandomState(2)
    params = init_mlp(jax.random.PRNGKey(2), 128, 512)
    x = jnp.asarray(rng.randn(3, 5, 128).astype(np.float32))
    got = fused_mlp(params, x, block_m=64, interpret=True)
    assert got.shape == (3, 5, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(mlp(params, x)),
                               atol=3e-5)


def test_mlp_auto_dispatch():
    """mlp_auto: off-TPU backends always take XLA (the kernel only lowers
    on TPU); interpret=True forces the kernel path for parity testing; the
    row threshold keeps decode-step shapes on XLA."""
    from vidil_tpu.models.layers import _FUSED_MLP_MIN_ROWS, mlp_auto

    rng = np.random.RandomState(4)
    params = init_mlp(jax.random.PRNGKey(4), 128, 512)
    big = jnp.asarray(rng.randn(_FUSED_MLP_MIN_ROWS, 128).astype(np.float32))
    # CPU backend: must not raise (XLA path) and must equal mlp exactly
    np.testing.assert_array_equal(np.asarray(mlp_auto(params, big)),
                                  np.asarray(mlp(params, big)))
    # interpret: kernel path, approx-GELU difference visible but tiny
    got = np.asarray(mlp_auto(params, big, interpret=True))
    np.testing.assert_allclose(got, np.asarray(mlp(params, big)), atol=3e-5)
    # bf16 dtype= pre-casting matches mlp's dtype= semantics on XLA path
    small = big[:16]
    np.testing.assert_array_equal(
        np.asarray(mlp_auto(params, small, dtype=jnp.bfloat16)),
        np.asarray(mlp(params, small, dtype=jnp.bfloat16)))


def test_fused_mlp_vjp_reference_matches_mlp_grads():
    """The custom_vjp backward recomputes through _mlp_ref; its grads must
    equal autodiff of layers.mlp (same math, so the fused op is a safe
    drop-in under jax.grad)."""
    rng = np.random.RandomState(3)
    params = init_mlp(jax.random.PRNGKey(3), 64, 256)
    x = jnp.asarray(rng.randn(10, 64).astype(np.float32))

    def loss_ref(p, x):
        return jnp.sum(mlp(p, x) ** 2)

    def loss_kernel_ref(p, x):
        return jnp.sum(_mlp_ref(x, p["fc1"]["kernel"], p["fc1"]["bias"],
                                p["fc2"]["kernel"], p["fc2"]["bias"]) ** 2)

    g1 = jax.grad(loss_ref)(params, x)
    g2 = jax.grad(loss_kernel_ref)(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_on_tpu_placement_aware():
    """Dispatch gating must follow the array's actual placement, not the
    process-default backend: this environment runs a CPU backend alongside
    the TPU (CLAUDE.md), and a computation explicitly placed on CPU devices
    must not route to the TPU-only kernels (advisor finding r3)."""
    from vidil_tpu.models.layers import on_tpu

    class _Dev:
        def __init__(self, platform):
            self.platform = platform

    class _Arr:
        def __init__(self, platform):
            self._p = platform

        def devices(self):
            return {_Dev(self._p)}

    assert on_tpu(_Arr("tpu")) is True
    assert on_tpu(_Arr("cpu")) is False
    # concrete placement wins over default backend
    x = jnp.zeros((4, 4))  # committed to the (forced-cpu) default backend
    assert on_tpu(x) is (jax.default_backend() == "tpu")

    class _Tracer:  # no devices() -> falls back to the default backend
        pass

    assert on_tpu(_Tracer()) is (jax.default_backend() == "tpu")


def test_mlp_auto_default_matches_config_default():
    """mlp_auto's signature default must agree with ViTConfig/MedConfig
    use_fused_mlp=False so direct callers omitting the flag get the
    configured (measured-wash) default (advisor finding r3)."""
    import inspect

    from vidil_tpu.config import MedConfig, ViTConfig
    from vidil_tpu.models.layers import mlp_auto
    from vidil_tpu.models.vit import block_forward

    assert inspect.signature(mlp_auto).parameters["use_fused"].default is False
    assert inspect.signature(block_forward).parameters["use_fused_mlp"].default is False
    assert ViTConfig().use_fused_mlp is False
    assert MedConfig(vocab_size=8).use_fused_mlp is False
