"""Fused Pallas ViT block kernel vs the XLA block (interpret mode on CPU).

The kernel fuses the whole pre-LN residual block (reference:
models/vit.py:89-110) into one program; parity target is
models/vit.block_forward with use_flash/use_fused_mlp off (the plain XLA
path every other test oracles against).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidil_tpu.models.vit import block_forward, init_block
from vidil_tpu.ops.fused_vit_block import _block_ref_xla, fused_vit_block

EPS = 1e-6


def _pad_tokens(x, lp):
    return jnp.pad(x, ((0, 0), (0, lp - x.shape[1]), (0, 0)))


def _ref(params, x, num_heads):
    return block_forward(params, x, num_heads, EPS, use_flash=False,
                         use_fused_mlp=False)


@pytest.mark.parametrize("B,L,D,H,F", [
    (3, 130, 128, 4, 1),   # padded tokens (130 -> 256), one frame/program
    (4, 128, 128, 2, 2),   # exact token blocks, two frames/program
    (2, 70, 256, 8, 1),    # 70 -> 128 padding, wider head count
])
def test_fused_block_matches_xla_fp32(B, L, D, H, F):
    rng = np.random.RandomState(0)
    params = init_block(jax.random.PRNGKey(0), D, 4 * D)
    x = jnp.asarray(rng.randn(B, L, D).astype(np.float32) * 0.5)
    lp = ((L + 127) // 128) * 128
    got = fused_vit_block(params, _pad_tokens(x, lp), H, EPS, true_len=L,
                          frames_per_program=F, interpret=True)[:, :L]
    ref = _ref(params, x, H)
    # fp32: dots bitwise; differences come from the in-kernel rational erf
    # (GELU) and fp32-vs-default softmax association — both ~1e-6 scale
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_fused_block_bf16_close_to_xla():
    rng = np.random.RandomState(1)
    params = init_block(jax.random.PRNGKey(1), 128, 512)
    x32 = jnp.asarray(rng.randn(2, 130, 128).astype(np.float32) * 0.5)
    x = x32.astype(jnp.bfloat16)
    got = np.asarray(fused_vit_block(params, _pad_tokens(x, 256), 4, EPS,
                                     true_len=130, interpret=True)
                     [:, :130]).astype(np.float32)
    ref = np.asarray(_ref(params, x, 4)).astype(np.float32)
    # bf16 runtime: the kernel rounds at the same points the XLA path does;
    # residual-chain drift stays within a few bf16 ulps of the activations
    np.testing.assert_allclose(got, ref, atol=0.08, rtol=0.08)


def test_pad_rows_do_not_contaminate_real_rows():
    """Garbage in pad rows must stay row-isolated: real-row outputs are
    identical whether the pad region holds zeros or large junk."""
    rng = np.random.RandomState(2)
    params = init_block(jax.random.PRNGKey(2), 128, 512)
    x = jnp.asarray(rng.randn(2, 100, 128).astype(np.float32))
    clean = _pad_tokens(x, 128)
    dirty = clean.at[:, 100:, :].set(1e3)
    out_clean = fused_vit_block(params, clean, 4, EPS, true_len=100,
                                interpret=True)[:, :100]
    out_dirty = fused_vit_block(params, dirty, 4, EPS, true_len=100,
                                interpret=True)[:, :100]
    np.testing.assert_array_equal(np.asarray(out_clean), np.asarray(out_dirty))


def test_batch_padding_to_frames_per_program():
    """B not divisible by frames_per_program: rows pad internally and the
    visible batch comes back exact."""
    rng = np.random.RandomState(3)
    params = init_block(jax.random.PRNGKey(3), 128, 512)
    x = jnp.asarray(rng.randn(3, 128, 128).astype(np.float32))
    got = fused_vit_block(params, x, 4, EPS, true_len=128,
                          frames_per_program=2, interpret=True)
    ref = fused_vit_block(params, x, 4, EPS, true_len=128,
                          frames_per_program=1, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)
    assert got.shape == x.shape


def test_xla_restatement_matches_kernel():
    """The custom-vjp backward recomputes through _block_ref_xla; it must
    agree with the kernel forward on the padded block (including the
    garbage pad rows it reproduces for gradient purposes)."""
    rng = np.random.RandomState(4)
    params = init_block(jax.random.PRNGKey(4), 128, 512)
    x = jnp.asarray(rng.randn(2, 130, 128).astype(np.float32) * 0.5)
    xp = _pad_tokens(x, 256)
    a, m = params["attn"], params["mlp"]
    args = (xp, params["norm1"]["scale"], params["norm1"]["bias"],
            a["qkv"]["kernel"], a["qkv"]["bias"],
            a["proj"]["kernel"], a["proj"]["bias"],
            params["norm2"]["scale"], params["norm2"]["bias"],
            m["fc1"]["kernel"], m["fc1"]["bias"],
            m["fc2"]["kernel"], m["fc2"]["bias"])
    ref = _block_ref_xla(*args, true_len=130, num_heads=4, eps=EPS)
    got = fused_vit_block(params, xp, 4, EPS, true_len=130, interpret=True)
    np.testing.assert_allclose(np.asarray(got)[:, :130],
                               np.asarray(ref)[:, :130], atol=5e-5, rtol=1e-4)


def test_fused_block_gradients_match_xla():
    """custom_vjp backward (XLA recompute) vs direct XLA block gradients."""
    rng = np.random.RandomState(5)
    params = init_block(jax.random.PRNGKey(5), 128, 512)
    x = jnp.asarray(rng.randn(2, 128, 128).astype(np.float32) * 0.5)

    def loss_fused(p, x_):
        return jnp.sum(jnp.square(
            fused_vit_block(p, x_, 4, EPS, true_len=128, interpret=True)))

    def loss_ref(p, x_):
        return jnp.sum(jnp.square(_ref(p, x_, 4)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    flat_f, _ = jax.tree_util.tree_flatten(g_fused)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    for gf, gr in zip(flat_f, flat_r):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("B,L,D,H,BF", [
    (2, 128, 128, 4, 1),   # exact token block
    (3, 100, 128, 4, 2),   # pad rows (100 -> 128) + batch pad (3 -> 4)
    (2, 130, 256, 8, 1),   # 130 -> 256 padding, wider head count
])
def test_pallas_backward_kernel_matches_xla_grads(B, L, D, H, BF):
    """The whole-block Pallas backward (`pallas_bwd=True`, recompute-
    inside-VMEM) vs direct XLA block gradients — params AND input."""
    rng = np.random.RandomState(7)
    params = init_block(jax.random.PRNGKey(7), D, 4 * D)
    x = jnp.asarray(rng.randn(B, L, D).astype(np.float32) * 0.5)
    lp = ((L + 127) // 128) * 128

    def loss_fused(p, x_):
        out = fused_vit_block(p, _pad_tokens(x_, lp), H, EPS, true_len=L,
                              interpret=True, pallas_bwd=True,
                              bwd_frames=BF)[:, :L]
        return jnp.sum(jnp.square(out))

    def loss_ref(p, x_):
        return jnp.sum(jnp.square(_ref(p, x_, H)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    flat_f, tree_f = jax.tree_util.tree_flatten(g_fused)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    for gf, gr in zip(flat_f, flat_r):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=2e-3, rtol=2e-3)


def test_pallas_backward_matches_xla_recompute_backward():
    """The two custom-vjp backward strategies must agree tightly (both
    differentiate the same rounded forward; only the execution engine
    differs)."""
    rng = np.random.RandomState(8)
    params = init_block(jax.random.PRNGKey(8), 128, 512)
    x = jnp.asarray(rng.randn(2, 128, 128).astype(np.float32) * 0.5)

    def loss(p, x_, pallas_bwd):
        return jnp.sum(jnp.square(
            fused_vit_block(p, x_, 4, EPS, true_len=128, interpret=True,
                            pallas_bwd=pallas_bwd)))

    g_pl = jax.grad(lambda p, x_: loss(p, x_, True), argnums=(0, 1))(params, x)
    g_xla = jax.grad(lambda p, x_: loss(p, x_, False), argnums=(0, 1))(params, x)
    for gf, gr in zip(jax.tree_util.tree_leaves(g_pl),
                      jax.tree_util.tree_leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=2e-4, rtol=2e-4)


@pytest.mark.slow
def test_pallas_backward_bf16_close():
    """bf16 runtime grads: same rounding points as the XLA path's vjp,
    drift bounded by a few bf16 ulps through the residual chain."""
    rng = np.random.RandomState(9)
    params = init_block(jax.random.PRNGKey(9), 128, 512)
    params = jax.tree.map(lambda t: t.astype(jnp.bfloat16)
                          if t.ndim >= 2 else t, params)
    x = jnp.asarray(rng.randn(2, 128, 128).astype(np.float32) * 0.5
                    ).astype(jnp.bfloat16)

    def loss(p, x_, pallas_bwd):
        return jnp.sum(jnp.square(
            fused_vit_block(p, x_, 4, EPS, true_len=128, interpret=True,
                            pallas_bwd=pallas_bwd).astype(jnp.float32)))

    g_pl = jax.grad(lambda p, x_: loss(p, x_, True), argnums=(0, 1))(params, x)
    g_xla = jax.grad(lambda p, x_: loss(p, x_, False), argnums=(0, 1))(params, x)
    for gf, gr in zip(jax.tree_util.tree_leaves(g_pl),
                      jax.tree_util.tree_leaves(g_xla)):
        gf32 = np.asarray(gf).astype(np.float32)
        gr32 = np.asarray(gr).astype(np.float32)
        scale = max(1.0, float(np.abs(gr32).max()))
        np.testing.assert_allclose(gf32 / scale, gr32 / scale, atol=0.06)


def test_vit_forward_fused_bwd_under_remat_cfg():
    """use_fused_block_bwd keeps the fused dispatch even with cfg.remat set
    (the kernel pair is its own remat schedule); gradients must match the
    classic remat path."""
    from vidil_tpu.config import ViTConfig
    from vidil_tpu.models.vit import init_vit, vit_forward

    kw = dict(image_size=48, patch_size=16, hidden_size=128,
              num_layers=2, num_heads=4)
    cfg_classic = ViTConfig(remat=True, **kw)
    cfg_fused = ViTConfig(remat=True, use_fused_block=True,
                          use_fused_block_bwd=True,
                          fused_block_interpret=True, **kw)
    params = init_vit(jax.random.PRNGKey(10), cfg_classic)
    rng = np.random.RandomState(10)
    imgs = jnp.asarray(rng.randn(2, 48, 48, 3).astype(np.float32) * 0.3)

    def loss(p, cfg):
        return jnp.sum(jnp.square(vit_forward(p, imgs, cfg)))

    g_classic = jax.grad(lambda p: loss(p, cfg_classic))(params)
    g_fused = jax.grad(lambda p: loss(p, cfg_fused))(params)
    for gf, gr in zip(jax.tree_util.tree_leaves(g_fused),
                      jax.tree_util.tree_leaves(g_classic)):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=2e-3, rtol=2e-3)


def test_vit_forward_fused_branch_matches_classic():
    """The vit_forward fused-block branch (pad-once -> scanned kernel ->
    slice -> final LN) must match the classic scan path."""
    from vidil_tpu.config import ViTConfig
    from vidil_tpu.models.vit import init_vit, vit_forward

    cfg = ViTConfig(image_size=48, patch_size=16, hidden_size=128,
                    num_layers=3, num_heads=4)  # 10 tokens -> pads to 128
    params = init_vit(jax.random.PRNGKey(6), cfg)
    rng = np.random.RandomState(6)
    imgs = jnp.asarray(rng.randn(2, 48, 48, 3).astype(np.float32) * 0.3)
    ref = vit_forward(params, imgs, cfg)
    cfg_fused = ViTConfig(image_size=48, patch_size=16, hidden_size=128,
                          num_layers=3, num_heads=4, use_fused_block=True,
                          fused_block_interpret=True)
    got = vit_forward(params, imgs, cfg_fused)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    assert got.shape == ref.shape
