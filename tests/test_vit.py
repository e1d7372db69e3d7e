"""ViT parity: vidil_tpu.models.vit vs an inline torch oracle.

The oracle mirrors the reference ViT math (pre-LN blocks, fused qkv,
conv patch embed — reference models/vit.py) using plain torch ops, built
from a randomly-initialized state dict with reference key names. This
tests both the model and the convert_vit key mapping.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from vidil_tpu.config import ViTConfig
from vidil_tpu.models.convert import convert_vit
from vidil_tpu.models.vit import init_vit, interpolate_pos_embed, patchify, vit_forward

CFG = ViTConfig(image_size=32, patch_size=16, hidden_size=32, num_layers=2, num_heads=4)


def make_torch_state_dict(cfg: ViTConfig, seed=0, prefix="visual_encoder."):
    g = torch.Generator().manual_seed(seed)
    d = cfg.hidden_size

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {
        prefix + "patch_embed.proj.weight": t(d, cfg.in_channels, cfg.patch_size, cfg.patch_size),
        prefix + "patch_embed.proj.bias": t(d),
        prefix + "cls_token": t(1, 1, d),
        prefix + "pos_embed": t(1, cfg.seq_len, d),
        prefix + "norm.weight": 1 + 0.1 * t(d),
        prefix + "norm.bias": 0.1 * t(d),
    }
    for i in range(cfg.num_layers):
        b = f"{prefix}blocks.{i}."
        sd.update(
            {
                b + "norm1.weight": 1 + 0.1 * t(d),
                b + "norm1.bias": 0.1 * t(d),
                b + "attn.qkv.weight": t(3 * d, d),
                b + "attn.qkv.bias": t(3 * d),
                b + "attn.proj.weight": t(d, d),
                b + "attn.proj.bias": t(d),
                b + "norm2.weight": 1 + 0.1 * t(d),
                b + "norm2.bias": 0.1 * t(d),
                b + "mlp.fc1.weight": t(int(d * cfg.mlp_ratio), d),
                b + "mlp.fc1.bias": t(int(d * cfg.mlp_ratio)),
                b + "mlp.fc2.weight": t(d, int(d * cfg.mlp_ratio)),
                b + "mlp.fc2.bias": t(d),
            }
        )
    return sd


def torch_vit_forward(sd, x, cfg: ViTConfig, prefix="visual_encoder."):
    """Oracle forward: same math as reference models/vit.py:180-194."""
    p = prefix
    B = x.shape[0]
    h = F.conv2d(x, sd[p + "patch_embed.proj.weight"], sd[p + "patch_embed.proj.bias"], stride=cfg.patch_size)
    h = h.flatten(2).transpose(1, 2)  # (B, N, D)
    cls = sd[p + "cls_token"].expand(B, -1, -1)
    h = torch.cat([cls, h], dim=1)
    h = h + sd[p + "pos_embed"][:, : h.shape[1], :]
    nh = cfg.num_heads
    for i in range(cfg.num_layers):
        b = f"{p}blocks.{i}."
        y = F.layer_norm(h, (cfg.hidden_size,), sd[b + "norm1.weight"], sd[b + "norm1.bias"], eps=cfg.layer_norm_eps)
        qkv = F.linear(y, sd[b + "attn.qkv.weight"], sd[b + "attn.qkv.bias"])
        B_, N, _ = y.shape
        qkv = qkv.reshape(B_, N, 3, nh, cfg.hidden_size // nh).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (cfg.hidden_size // nh) ** -0.5
        attn = attn.softmax(dim=-1)
        y = (attn @ v).transpose(1, 2).reshape(B_, N, cfg.hidden_size)
        y = F.linear(y, sd[b + "attn.proj.weight"], sd[b + "attn.proj.bias"])
        h = h + y
        y = F.layer_norm(h, (cfg.hidden_size,), sd[b + "norm2.weight"], sd[b + "norm2.bias"], eps=cfg.layer_norm_eps)
        y = F.linear(y, sd[b + "mlp.fc1.weight"], sd[b + "mlp.fc1.bias"])
        y = F.gelu(y)
        y = F.linear(y, sd[b + "mlp.fc2.weight"], sd[b + "mlp.fc2.bias"])
        h = h + y
    h = F.layer_norm(h, (cfg.hidden_size,), sd[p + "norm.weight"], sd[p + "norm.bias"], eps=cfg.layer_norm_eps)
    return h


def test_patchify_matches_conv():
    cfg = CFG
    sd = make_torch_state_dict(cfg)
    x = torch.randn(2, 3, cfg.image_size, cfg.image_size, generator=torch.Generator().manual_seed(1))
    ref = F.conv2d(x, sd["visual_encoder.patch_embed.proj.weight"], sd["visual_encoder.patch_embed.proj.bias"], stride=cfg.patch_size)
    ref = ref.flatten(2).transpose(1, 2).numpy()

    params = convert_vit({k: v.numpy() for k, v in sd.items()}, cfg)
    x_nhwc = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    patches = patchify(x_nhwc, cfg.patch_size)
    got = patches @ params["patch_embed"]["kernel"] + params["patch_embed"]["bias"]
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_vit_forward_parity():
    cfg = CFG
    sd = make_torch_state_dict(cfg)
    x = torch.randn(2, 3, cfg.image_size, cfg.image_size, generator=torch.Generator().manual_seed(2))
    ref = torch_vit_forward(sd, x, cfg).numpy()

    params = convert_vit({k: v.numpy() for k, v in sd.items()}, cfg)
    x_nhwc = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    got = np.asarray(vit_forward(params, x_nhwc, cfg))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_vit_forward_attn_path_matches_scan():
    cfg = CFG
    params = init_vit(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.image_size, cfg.image_size, 3))
    a = vit_forward(params, x, cfg)
    b, attns = vit_forward(params, x, cfg, return_attn=True)
    assert len(attns) == cfg.num_layers
    assert attns[0].shape == (2, cfg.num_heads, cfg.seq_len, cfg.seq_len)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_interpolate_pos_embed():
    cfg = CFG
    params = init_vit(jax.random.PRNGKey(0), cfg)
    # 2x2 grid -> 4x4 grid
    new = interpolate_pos_embed(params["pos_embed"], 16)
    assert new.shape == (1, 17, cfg.hidden_size)
    # identity when size matches
    same = interpolate_pos_embed(params["pos_embed"], cfg.num_patches)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(params["pos_embed"]))


def test_vit_bf16_close():
    cfg = CFG
    params = init_vit(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.image_size, cfg.image_size, 3))
    f32 = np.asarray(vit_forward(params, x, cfg))
    bf16 = np.asarray(vit_forward(params, x, cfg, dtype=jnp.bfloat16)).astype(np.float32)
    assert np.max(np.abs(f32 - bf16)) < 0.15
    assert np.mean(np.abs(f32 - bf16)) < 0.03


def test_vit_remat_matches_and_grads():
    """remat=True must match remat=False forward AND differentiate under
    bf16 (regression: jax.checkpoint abstracted the dtype positional arg
    unless marked static)."""
    import dataclasses

    cfg = CFG
    cfg_r = dataclasses.replace(cfg, remat=True)
    params = init_vit(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.image_size, cfg.image_size, 3))
    a = np.asarray(vit_forward(params, x, cfg, dtype=jnp.bfloat16)).astype(np.float32)
    b = np.asarray(vit_forward(params, x, cfg_r, dtype=jnp.bfloat16)).astype(np.float32)
    np.testing.assert_allclose(a, b, atol=1e-6)

    def loss(p):
        return vit_forward(p, x, cfg_r, dtype=jnp.bfloat16).astype(jnp.float32).sum()

    g = jax.jit(jax.grad(loss))(params)
    assert np.isfinite(float(jnp.sum(jnp.abs(g["patch_embed"]["kernel"]))))


def test_vit_remat_policy_dots_matches_full_recompute():
    """remat_policy='dots' (save GEMM outputs, recompute the rest) must be
    a pure scheduling choice: identical forward AND identical grads vs the
    recompute-everything policy and vs no remat at all (fp32 so any
    numerical difference is a real bug, not rounding)."""
    import dataclasses

    from vidil_tpu.models.layers import remat_policy

    cfg = CFG
    params = init_vit(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.image_size, cfg.image_size, 3))

    def loss_fn(variant_cfg):
        def loss(p):
            return (vit_forward(p, x, variant_cfg) ** 2).sum()
        return jax.jit(jax.value_and_grad(loss))

    variants = [cfg,
                dataclasses.replace(cfg, remat=True),
                dataclasses.replace(cfg, remat=True, remat_policy="dots")]
    outs = [loss_fn(v)(params) for v in variants]
    for val, grads in outs[1:]:
        np.testing.assert_allclose(float(val), float(outs[0][0]), rtol=1e-6)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
                     outs[0][1], grads)

    with pytest.raises(ValueError):
        remat_policy("nonsense")


def test_load_vit_flax_npz_matches_torch_convert(tmp_path):
    """The Flax-npz loader and the torch converter must agree: export the
    same torch weights into the google vision_transformer npz layout (the
    timm flax<->torch relation, written independently here) and compare."""
    import io

    from vidil_tpu.models.convert import convert_vit, load_vit_flax_npz

    cfg = CFG
    sd = make_torch_state_dict(cfg)
    ref = convert_vit({k: v.numpy() for k, v in sd.items()}, cfg)

    D = cfg.hidden_size
    H, dh = cfg.num_heads, cfg.hidden_size // cfg.num_heads
    z = {}
    conv = sd["visual_encoder.patch_embed.proj.weight"].numpy()  # (D, C, P, P)
    z["embedding/kernel"] = conv.transpose(2, 3, 1, 0)  # (ph, pw, c, D)
    z["embedding/bias"] = sd["visual_encoder.patch_embed.proj.bias"].numpy()
    z["cls"] = sd["visual_encoder.cls_token"].numpy()
    z["Transformer/posembed_input/pos_embedding"] = sd["visual_encoder.pos_embed"].numpy()
    for i in range(cfg.num_layers):
        b = f"visual_encoder.blocks.{i}."
        f = f"Transformer/encoderblock_{i}/"
        z[f + "LayerNorm_0/scale"] = sd[b + "norm1.weight"].numpy()
        z[f + "LayerNorm_0/bias"] = sd[b + "norm1.bias"].numpy()
        qkv_w = sd[b + "attn.qkv.weight"].numpy()  # (3D, D) torch rows=out
        qkv_b = sd[b + "attn.qkv.bias"].numpy()
        for j, n in enumerate(("query", "key", "value")):
            a = f + f"MultiHeadDotProductAttention_1/{n}/"
            z[a + "kernel"] = qkv_w[j * D:(j + 1) * D].T.reshape(D, H, dh)
            z[a + "bias"] = qkv_b[j * D:(j + 1) * D].reshape(H, dh)
        z[f + "MultiHeadDotProductAttention_1/out/kernel"] = (
            sd[b + "attn.proj.weight"].numpy().T.reshape(H, dh, D))
        z[f + "MultiHeadDotProductAttention_1/out/bias"] = sd[b + "attn.proj.bias"].numpy()
        z[f + "LayerNorm_2/scale"] = sd[b + "norm2.weight"].numpy()
        z[f + "LayerNorm_2/bias"] = sd[b + "norm2.bias"].numpy()
        z[f + "MlpBlock_3/Dense_0/kernel"] = sd[b + "mlp.fc1.weight"].numpy().T
        z[f + "MlpBlock_3/Dense_0/bias"] = sd[b + "mlp.fc1.bias"].numpy()
        z[f + "MlpBlock_3/Dense_1/kernel"] = sd[b + "mlp.fc2.weight"].numpy().T
        z[f + "MlpBlock_3/Dense_1/bias"] = sd[b + "mlp.fc2.bias"].numpy()
    z["Transformer/encoder_norm/scale"] = sd["visual_encoder.norm.weight"].numpy()
    z["Transformer/encoder_norm/bias"] = sd["visual_encoder.norm.bias"].numpy()

    path = str(tmp_path / "vit.npz")
    np.savez(path, **z)
    got = load_vit_flax_npz(path, cfg)
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_flatten_with_path(ref)[0], key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_flatten_with_path(got)[0], key=lambda t: str(t[0])),
    ):
        assert str(ka) == str(kb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, err_msg=str(ka))


def test_interpolate_pos_embed_matches_torch_bicubic():
    """Pos-embed resize must match the reference's
    F.interpolate(mode='bicubic', align_corners=False) — this runs when a
    384-trained BLIP checkpoint is fine-tuned at 224 (and vice versa)."""
    for src, dst in [(14, 24), (24, 14), (7, 24)]:
        rng = np.random.RandomState(src * 100 + dst)
        D = 16
        pos = rng.randn(1, 1 + src * src, D).astype(np.float32)
        grid = torch.tensor(pos[:, 1:]).reshape(1, src, src, D).permute(0, 3, 1, 2)
        t_out = F.interpolate(grid.double(), size=(dst, dst), mode="bicubic",
                              align_corners=False)
        ref = np.concatenate(
            [pos[:, :1],
             t_out.permute(0, 2, 3, 1).reshape(1, dst * dst, D).numpy().astype(np.float32)],
            axis=1)
        got = np.asarray(interpolate_pos_embed(jnp.asarray(pos), dst * dst))
        np.testing.assert_allclose(got, ref, atol=1e-6)
