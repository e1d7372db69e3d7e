"""Vision Transformer (BLIP visual encoder), TPU-first.

Functional re-design of the reference ViT (reference: models/vit.py:113-194;
base 768d/12L/12H, large 1024d/24L/16H, patch16, [CLS] + learned pos embed,
pre-LN blocks, GELU, final LayerNorm).

TPU-first choices:
* inputs are NHWC; patch embedding is a patchify-reshape + one MXU matmul
  instead of a conv (identical math to torch Conv2d stride=patch),
* the L transformer blocks are stacked into a single pytree with a leading
  layer axis and executed with ``lax.scan`` — one compiled block body
  regardless of depth (fast compiles, weight-stationary-friendly),
* optional ``jax.checkpoint`` rematerialization replaces fairscale's
  checkpoint_wrapper (reference: models/vit.py:103-105),
* attention-map introspection (reference: models/vit.py:58-68 hooks) is a
  separate non-scanned path, keeping the hot path fusion-clean.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vidil_tpu.config import ViTConfig
from vidil_tpu.models.layers import (
    dot_product_attention,
    gelu,
    init_layer_norm,
    init_linear,
    init_mlp,
    layer_norm,
    linear,
    merge_heads,
    mlp_auto,
    split_heads,
    trunc_normal,
)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_block(key, dim: int, mlp_hidden: int):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "norm1": init_layer_norm(dim),
        "attn": {"qkv": init_linear(k1, dim, 3 * dim), "proj": init_linear(k2, dim, dim)},
        "norm2": init_layer_norm(dim),
        "mlp": init_mlp(k3, dim, mlp_hidden),
    }


def init_vit(key, cfg: ViTConfig):
    kp, kc, kpos, kb = jax.random.split(key, 4)
    d = cfg.hidden_size
    patch_dim = cfg.patch_size * cfg.patch_size * cfg.in_channels
    block_keys = jax.random.split(kb, cfg.num_layers)
    blocks = [init_block(block_keys[i], d, int(d * cfg.mlp_ratio)) for i in range(cfg.num_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "patch_embed": init_linear(kp, patch_dim, d),
        "cls_token": trunc_normal(kc, (1, 1, d), std=0.02),
        "pos_embed": trunc_normal(kpos, (1, cfg.seq_len, d), std=0.02),
        "blocks": stacked,
        "norm": init_layer_norm(d),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def patchify(x, patch_size: int):
    """(B, H, W, C) -> (B, nH*nW, P*P*C) with (ph, pw, c) inner order.

    Matches torch Conv2d(stride=patch) + flatten + transpose semantics when
    the kernel is laid out (P, P, C, D).
    """
    B, H, W, C = x.shape
    P = patch_size
    nH, nW = H // P, W // P
    x = x.reshape(B, nH, P, nW, P, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, nH, nW, P, P, C)
    return x.reshape(B, nH * nW, P * P * C)


def attention(params, x, num_heads: int, dtype=None, use_flash: bool = True):
    """Fused-QKV self-attention (reference: models/vit.py:70-86).

    use_flash enables the Pallas online-softmax kernel — the Apex-FMHA
    analogue (ops/flash_attention.py). Dispatch is shape-aware: the kernel
    runs only where it measured faster than XLA (shapes whose fp32 logits
    spill VMEM, e.g. the 384px encode); small shapes stay on XLA's fused
    attention, which wins there (tools/bench_attention.py numbers in
    ARCHITECTURE.md). Differentiable via a custom VJP (backward recomputes
    through the XLA attention)."""
    qkv = linear(params["qkv"], x, dtype=dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (split_heads(t, num_heads) for t in (q, k, v))
    from vidil_tpu.ops.flash_attention import attention_auto

    out = attention_auto(q, k, v, use_flash=use_flash)
    return linear(params["proj"], merge_heads(out), dtype=dtype)


def block_forward(params, x, num_heads: int, eps: float, dtype=None, use_flash: bool = True,
                  use_fused_mlp: bool = False):
    """Pre-LN residual block (reference: models/vit.py:107-110)."""
    x = x + attention(params["attn"], layer_norm(params["norm1"], x, eps), num_heads,
                      dtype=dtype, use_flash=use_flash)
    x = x + mlp_auto(params["mlp"], layer_norm(params["norm2"], x, eps), act=gelu,
                     dtype=dtype, use_fused=use_fused_mlp)
    return x


def vit_forward(params, images, cfg: ViTConfig, dtype=None, return_attn: bool = False):
    """Encode images.

    Args:
      images: (B, H, W, C) NHWC, already resized/normalized.
      return_attn: if True, also return per-layer attention maps
        (introspection parity with the reference's save_attention_map hooks).

    Returns:
      (B, num_patches + 1, hidden) embeddings (token 0 = [CLS]).
    """
    B = images.shape[0]
    x = patchify(images, cfg.patch_size)
    x = linear(params["patch_embed"], x, dtype=dtype)
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"][:, : x.shape[1], :].astype(x.dtype)

    if return_attn:
        attns = []
        for i in range(cfg.num_layers):
            blk = jax.tree.map(lambda p, i=i: p[i], params["blocks"])
            h = layer_norm(blk["norm1"], x, cfg.layer_norm_eps)
            qkv = linear(blk["attn"]["qkv"], h, dtype=dtype)
            q, k, v = (split_heads(t, cfg.num_heads) for t in jnp.split(qkv, 3, axis=-1))
            import math

            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
            probs = jax.nn.softmax(logits / math.sqrt(q.shape[-1]), axis=-1)
            attns.append(probs)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
            x = x + linear(blk["attn"]["proj"], merge_heads(out), dtype=dtype)
            x = x + mlp_auto(blk["mlp"], layer_norm(blk["norm2"], x, cfg.layer_norm_eps),
                             dtype=dtype, use_fused=cfg.use_fused_mlp)
        x = layer_norm(params["norm"], x, cfg.layer_norm_eps)
        return x, attns

    from functools import partial

    from vidil_tpu.models.layers import on_tpu

    if (cfg.use_fused_block
            and (not cfg.remat or cfg.use_fused_block_bwd)
            and cfg.hidden_size % 128 == 0
            and (cfg.fused_block_interpret or on_tpu(x))):
        # hidden_size gate: the kernel's dots want the 128-lane width
        # (ViT-B 768 / ViT-L 1024, both measured-or-covered); tiny test
        # configs (32-64) stay on the classic XLA path.
        # remat gate: the plain fused forward's vjp recomputes through XLA
        # (measured negative under autodiff), so training shapes need the
        # unfused body — UNLESS the Pallas backward kernel is enabled, in
        # which case the kernel pair is its own full-remat schedule (only
        # x saved per layer, recompute inside VMEM) and runs without a
        # jax.checkpoint wrapper.
        # Whole-layer Pallas kernel: pad the token axis to the 128-lane
        # granularity ONCE, run the full stack on the padded array (pad
        # rows are masked as keys inside the kernel and stay row-isolated
        # otherwise), slice after — per-layer padding would re-buy the
        # HBM copies the fusion removes.
        from vidil_tpu.ops.fused_vit_block import fused_vit_block

        L = x.shape[1]
        lp = (L + 127) // 128 * 128
        xp = jnp.pad(x, ((0, 0), (0, lp - L), (0, 0))) if lp != L else x

        def fused_body(carry, layer_params):
            out = fused_vit_block(layer_params, carry, cfg.num_heads,
                                  cfg.layer_norm_eps, true_len=L,
                                  frames_per_program=cfg.fused_block_frames,
                                  interpret=cfg.fused_block_interpret,
                                  pallas_bwd=cfg.use_fused_block_bwd,
                                  bwd_frames=cfg.fused_block_bwd_frames)
            return out, None

        xp, _ = jax.lax.scan(fused_body, xp, params["blocks"])
        x = xp[:, :L] if lp != L else xp
        return layer_norm(params["norm"], x, cfg.layer_norm_eps)

    block_fn = partial(block_forward, use_flash=cfg.use_flash,
                       use_fused_mlp=cfg.use_fused_mlp)

    def body(carry, layer_params):
        fn = block_fn
        if cfg.remat:
            from .layers import remat_policy

            fn = jax.checkpoint(block_fn, static_argnums=(2, 3, 4),
                                policy=remat_policy(cfg.remat_policy))
        return fn(layer_params, carry, cfg.num_heads, cfg.layer_norm_eps, dtype), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = layer_norm(params["norm"], x, cfg.layer_norm_eps)
    return x


def _torch_bicubic_weights(in_size: int, out_size: int):
    """1-D resampling weight matrix (out, in) matching
    ``torch.nn.functional.interpolate(mode='bicubic',
    align_corners=False)``: half-pixel coordinate mapping, cubic
    convolution kernel with a=-0.75, edge-clamped taps."""
    import numpy as np

    a = -0.75

    def kernel(s):
        s = np.abs(s)
        out = np.where(s <= 1, (a + 2) * s**3 - (a + 3) * s**2 + 1,
                       np.where(s < 2, a * s**3 - 5 * a * s**2 + 8 * a * s - 4 * a, 0.0))
        return out

    scale = in_size / out_size
    x = (np.arange(out_size) + 0.5) * scale - 0.5
    x0 = np.floor(x).astype(int)
    t = x - x0
    w = np.zeros((out_size, in_size), np.float64)
    for tap in (-1, 0, 1, 2):
        idx = np.clip(x0 + tap, 0, in_size - 1)
        np.add.at(w, (np.arange(out_size), idx), kernel(tap - t))
    return w


def interpolate_pos_embed(pos_embed, new_num_patches: int, num_extra_tokens: int = 1):
    """Bicubic-resize position embeddings to a new grid, numerically
    matching the reference's ``F.interpolate(..., mode='bicubic')``
    (reference: models/vit.py:281-305). Runs host-side at load time."""
    import numpy as np

    old_len = pos_embed.shape[1] - num_extra_tokens
    orig_size = int(old_len**0.5)
    new_size = int(new_num_patches**0.5)
    if orig_size == new_size:
        return pos_embed
    extra = pos_embed[:, :num_extra_tokens]
    grid = np.asarray(pos_embed[:, num_extra_tokens:], np.float64).reshape(
        orig_size, orig_size, -1)
    w = _torch_bicubic_weights(orig_size, new_size)
    grid = np.einsum("oi,ijd->ojd", w, grid)   # rows
    grid = np.einsum("oj,ijd->iod", w, grid)   # cols
    grid = jnp.asarray(grid.reshape(1, new_size * new_size, -1),
                       dtype=pos_embed.dtype)
    return jnp.concatenate([extra, grid], axis=1)
