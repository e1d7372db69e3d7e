"""Flash-attention kernel vs XLA reference (Pallas interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidil_tpu.models.layers import dot_product_attention
from vidil_tpu.ops.flash_attention import attention_auto, flash_attention


@pytest.mark.parametrize("B,H,Lq,Lk,D", [
    (2, 4, 577, 577, 64),    # ViT self-attn shape (BLIP-base 384px)
    (1, 12, 16, 1154, 64),   # MED cross-attn over 2-frame video memory
    (2, 2, 100, 130, 32),    # ragged, non-multiple-of-128 lengths
    (1, 1, 128, 128, 64),    # exact tile
    (1, 2, 130, 2600, 32),   # KV streaming path (multiple online-softmax blocks)
    (1, 2, 1100, 140, 32),   # multiple q blocks
])
def test_flash_matches_xla(B, H, Lq, Lk, D):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, Lq, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, Lk, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, Lk, D).astype(np.float32))
    ref = np.asarray(dot_product_attention(q, k, v))
    got = np.asarray(flash_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_flash_bf16():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 4, 130, 64).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.randn(1, 4, 260, 64).astype(np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.randn(1, 4, 260, 64).astype(np.float32)).astype(jnp.bfloat16)
    ref = np.asarray(dot_product_attention(q, k, v)).astype(np.float32)
    got = np.asarray(flash_attention(q, k, v, interpret=True)).astype(np.float32)
    assert np.max(np.abs(got - ref)) < 0.05


def test_attention_auto_dispatch():
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(1, 2, 64, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, 64, 32).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, 64, 32).astype(np.float32))
    # with a bias it must fall back to the XLA path (flash has no mask support)
    bias = jnp.zeros((1, 1, 64, 64))
    a = np.asarray(attention_auto(q, k, v, bias=bias))
    b = np.asarray(dot_product_attention(q, k, v, bias=bias))
    np.testing.assert_allclose(a, b, atol=1e-6)
    c = np.asarray(attention_auto(q, k, v, interpret=True))
    np.testing.assert_allclose(c, b, atol=2e-5)


def test_flash_profitable_gate():
    """Dispatch rule: Pallas only when the fp32 logits spill VMEM
    (measured crossover, tools/bench_attention.py / ARCHITECTURE.md)."""
    from vidil_tpu.ops.flash_attention import _flash_profitable

    def shaped(B, H, Lq, Lk, D=64):
        q = jnp.zeros((B, H, Lq, D), jnp.bfloat16)
        k = jnp.zeros((B, H, Lk, D), jnp.bfloat16)
        return q, k

    # ViT-B/384 self-attn at CapFilt batch (2 GB logits): kernel on
    assert _flash_profitable(*shaped(128, 12, 577, 577), None)
    # ViT-B/224 train shape (59 MB logits, XLA fuses in VMEM): off
    assert not _flash_profitable(*shaped(32, 12, 197, 197), None)
    # CLIP-L/14 at 128 frames (541 MB logits, both axes short): off
    assert not _flash_profitable(*shaped(128, 16, 257, 257), None)
    # grouped-rerank fold (long query axis): on
    assert _flash_profitable(*shaped(8, 12, 4480, 577), None)
    # CapFilt filter fold (short queries over a long memory): on
    assert _flash_profitable(*shaped(128, 12, 140, 640), None)
    # single-query decode step: off regardless of memory size
    assert not _flash_profitable(*shaped(96, 12, 1, 2308), None)
    # any bias forces the XLA path
    q, k = shaped(128, 12, 577, 577)
    assert not _flash_profitable(q, k, jnp.zeros((1, 1, 577, 577)))


def _interpret_kernels(monkeypatch):
    import vidil_tpu.ops.flash_attention as fa

    fwd, bwd = fa._flash_forward, fa._flash_backward
    monkeypatch.setattr(
        fa, "_flash_forward",
        lambda q, k, v, interpret=False, with_stats=False:
            fwd(q, k, v, interpret=True, with_stats=with_stats))
    monkeypatch.setattr(fa, "_flash_backward",
                        lambda *a, interpret=False: bwd(*a, interpret=True))
    return fa


@pytest.mark.parametrize("B,H,Lq,Lk,D", [
    (1, 2, 130, 150, 32),    # ragged tail-padded both axes
    (2, 4, 197, 197, 32),    # ViT-224 trainer shape (downsized heads)
    (1, 4, 577, 577, 32),    # ViT-384 encode shape
    (1, 2, 130, 2600, 32),   # KV streaming backward (multiple k blocks)
])
def test_flash_custom_vjp_matches_xla_grads(monkeypatch, B, H, Lq, Lk, D):
    """flash_attention is differentiable via the Pallas backward kernel
    (dq/dk/dv from saved O + logsumexp); grads must match jax.grad of
    dot_product_attention. Both kernels forced through interpret mode."""
    fa = _interpret_kernels(monkeypatch)
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(B, H, Lq, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, Lk, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, Lk, D).astype(np.float32))

    f = lambda q, k, v: jnp.sum(fa.flash_attention(q, k, v) ** 2)
    g = lambda q, k, v: jnp.sum(dot_product_attention(q, k, v) ** 2)
    gf = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    gg = jax.grad(g, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-4)


def test_flash_vjp_long_query_falls_back_to_xla(monkeypatch):
    """Padded query axes beyond one block (>1024) route the backward to
    the XLA recompute (the Pallas backward accumulates dk/dv in a single
    q-block program); gradients still match XLA."""
    fa = _interpret_kernels(monkeypatch)
    monkeypatch.setattr(
        fa, "_flash_backward",
        lambda *a, **kw: (_ for _ in ()).throw(AssertionError("kernel used")))
    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(1, 2, 1100, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, 140, 32).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, 140, 32).astype(np.float32))
    f = lambda q, k, v: jnp.sum(fa.flash_attention(q, k, v) ** 2)
    g = lambda q, k, v: jnp.sum(dot_product_attention(q, k, v) ** 2)
    gf = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    gg = jax.grad(g, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-4)


def test_flash_vjp_long_kv_falls_back_to_xla(monkeypatch):
    """Very long KV axes (>8192 padded) also route the backward to the
    XLA recompute: the Pallas backward holds k/v/dk/dv VMEM-resident —
    twice the forward's KV footprint — so shapes the forward streams
    fine would blow VMEM in the backward."""
    fa = _interpret_kernels(monkeypatch)
    monkeypatch.setattr(
        fa, "_flash_backward",
        lambda *a, **kw: (_ for _ in ()).throw(AssertionError("kernel used")))
    rng = np.random.RandomState(6)
    q = jnp.asarray(rng.randn(1, 1, 130, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 1, 8300, 32).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 1, 8300, 32).astype(np.float32))
    f = lambda q, k, v: jnp.sum(fa.flash_attention(q, k, v) ** 2)
    g = lambda q, k, v: jnp.sum(dot_product_attention(q, k, v) ** 2)
    gf = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    gg = jax.grad(g, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-4)


def test_flash_vjp_bf16_grads(monkeypatch):
    """bf16 inputs: kernel gradients track XLA's bf16 gradients within a
    few bf16 ulps (p/ds round to bf16 before their MXU dots, mirroring
    the forward's p rounding)."""
    fa = _interpret_kernels(monkeypatch)
    rng = np.random.RandomState(5)
    mk = lambda L: jnp.asarray(rng.randn(2, 2, L, 32).astype(np.float32)).astype(jnp.bfloat16)
    q, k, v = mk(197), mk(197), mk(197)

    f = lambda q, k, v: jnp.sum(fa.flash_attention(q, k, v).astype(jnp.float32) ** 2)
    g = lambda q, k, v: jnp.sum(dot_product_attention(q, k, v).astype(jnp.float32) ** 2)
    gf = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    gg = jax.grad(g, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gg):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-6)
        assert np.max(np.abs(a - b)) / scale < 0.02


def test_flash_forward_lse_matches_xla(monkeypatch):
    """The forward kernel's logsumexp rows (saved for the backward) equal
    the directly-computed logsumexp of the scaled logits."""
    import vidil_tpu.ops.flash_attention as fa

    rng = np.random.RandomState(6)
    q = jnp.asarray(rng.randn(2, 3, 130, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 3, 150, 32).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 3, 150, 32).astype(np.float32))
    _, lse = fa._flash_forward(q, k, v, interpret=True, with_stats=True)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(32.0)
    ref = jax.nn.logsumexp(s, axis=-1)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_attention_auto_off_tpu_falls_back_to_xla():
    """On a non-TPU backend a profitability-gate hit must NOT lower the
    Pallas kernel (TPU CompilerParams fail off-TPU): attention_auto
    routes to XLA instead. Shapes here satisfy _flash_profitable (spilled
    logits + a >=512-long axis) so only the backend guard averts the
    kernel."""
    from vidil_tpu.ops.flash_attention import _flash_profitable

    rng = np.random.RandomState(3)
    # spill size depends only on B*H*Lq*Lk; D=8 keeps the XLA fallback
    # cheap on the 1-core host while the gate still fires
    B, H, Lq, Lk, D = 1, 8, 577, 8192, 8  # 8*577*8192*4 B = 151 MB logits
    q = jnp.asarray(rng.randn(B, H, Lq, D).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, Lk, D).astype(np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, Lk, D).astype(np.float32)).astype(jnp.bfloat16)
    assert _flash_profitable(q, k, None)
    assert jax.default_backend() != "tpu"  # conftest pins CPU

    # if the Pallas kernel were selected, tracing/lowering would already
    # raise (TPU CompilerParams don't lower on CPU); the guard must route
    # to the XLA primitive, bit-identical to calling it directly
    got = np.asarray(attention_auto(q, k, v))
    ref = np.asarray(dot_product_attention(q, k, v))
    np.testing.assert_array_equal(got, ref)
