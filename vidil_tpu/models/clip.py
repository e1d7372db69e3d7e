"""CLIP dual-tower model (functional, TPU-first).

Re-implementation of the CLIP encoder pair the reference consumes via HF
``CLIPModel`` ('openai/clip-vit-large-patch14';
reference: run_visual_tokenization.py:9,344-350). Same math as HF:
pre-LN transformer towers, quick_gelu, attention with bias, projection
heads, L2-normalized output embeddings (HF CLIPModel.forward normalizes
the returned image/text embeds, which the reference relies on for its
cosine-similarity scoring at run_visual_tokenization.py:276).

Params convert from an HF state dict via convert.convert_clip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vidil_tpu.config import CLIPConfig
from vidil_tpu.models.layers import (
    ACT2FN,
    dot_product_attention,
    embedding_lookup,
    init_embedding,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
    merge_heads,
    split_heads,
)
from vidil_tpu.models.vit import patchify


# ---------------------------------------------------------------------------
# init (random; real weights come from convert_clip)
# ---------------------------------------------------------------------------

def _init_tower_layer(key, d: int, mlp: int):
    ks = jax.random.split(key, 6)
    return {
        "norm1": init_layer_norm(d),
        "attn": {
            "query": init_linear(ks[0], d, d),
            "key": init_linear(ks[1], d, d),
            "value": init_linear(ks[2], d, d),
            "out": init_linear(ks[3], d, d),
        },
        "norm2": init_layer_norm(d),
        "mlp": {"fc1": init_linear(ks[4], d, mlp), "fc2": init_linear(ks[5], mlp, d)},
    }


def init_clip(key, cfg: CLIPConfig):
    kv, kt, kp1, kp2, kc, kpe, kte, ktp = jax.random.split(key, 8)
    dv, dt = cfg.vision_hidden_size, cfg.text_hidden_size
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    num_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
    v_layers = [_init_tower_layer(k, dv, cfg.vision_intermediate_size)
                for k in jax.random.split(kv, cfg.vision_layers)]
    t_layers = [_init_tower_layer(k, dt, cfg.text_intermediate_size)
                for k in jax.random.split(kt, cfg.text_layers)]
    stack = lambda ls: jax.tree.map(lambda *xs: jnp.stack(xs), *ls)
    return {
        "vision": {
            "patch_embed": {"kernel": 0.02 * jax.random.normal(kp1, (patch_dim, dv))},
            "class_embedding": 0.02 * jax.random.normal(kc, (dv,)),
            "pos_embed": 0.02 * jax.random.normal(kpe, (num_pos, dv)),
            "pre_norm": init_layer_norm(dv),
            "layers": stack(v_layers),
            "post_norm": init_layer_norm(dv),
        },
        "text": {
            "token_embedding": init_embedding(kte, cfg.vocab_size, dt),
            "pos_embed": 0.02 * jax.random.normal(ktp, (cfg.max_text_len, dt)),
            "layers": stack(t_layers),
            "final_norm": init_layer_norm(dt),
        },
        "visual_projection": {"kernel": 0.02 * jax.random.normal(kp2, (dv, cfg.projection_dim))},
        "text_projection": {"kernel": 0.02 * jax.random.normal(jax.random.fold_in(ktp, 1), (dt, cfg.projection_dim))},
        "logit_scale": jnp.asarray(2.6592, jnp.float32),
    }


# ---------------------------------------------------------------------------
# towers
# ---------------------------------------------------------------------------

def _tower(params, x, bias, num_heads: int, eps: float, act, dtype=None):
    """Pre-LN transformer stack shared by both towers (lax.scan over layers)."""

    def body(carry, layer):
        h = layer_norm(layer["norm1"], carry, eps)
        q = split_heads(linear(layer["attn"]["query"], h, dtype=dtype), num_heads)
        k = split_heads(linear(layer["attn"]["key"], h, dtype=dtype), num_heads)
        v = split_heads(linear(layer["attn"]["value"], h, dtype=dtype), num_heads)
        # attention_auto: both towers route through the shape-aware
        # dispatch, but at CLIP-L's 257-token sequences the gate keeps
        # them on XLA (measured slower on Pallas even with 541 MB of
        # spilled logits at 128 frames — _flash_profitable requires a
        # >=512-long axis); only longer-sequence callers take the kernel
        from vidil_tpu.ops.flash_attention import attention_auto

        ctx = merge_heads(attention_auto(q, k, v, bias=bias))
        carry = carry + linear(layer["attn"]["out"], ctx, dtype=dtype)
        h = layer_norm(layer["norm2"], carry, eps)
        h = linear(layer["mlp"]["fc1"], h, dtype=dtype)
        h = act(h)
        carry = carry + linear(layer["mlp"]["fc2"], h, dtype=dtype)
        return carry, None

    out, _ = jax.lax.scan(body, x, params["layers"])
    return out


def clip_vision_forward(params, images, cfg: CLIPConfig, dtype=None):
    """images (B, S, S, 3) preprocessed -> (last_hidden, pooled).

    pooled = post_layernorm(hidden[:, 0]) (HF CLIPVisionTransformer).
    """
    p = params["vision"]
    B = images.shape[0]
    x = patchify(images, cfg.patch_size)
    x = jnp.dot(x.astype(dtype) if dtype else x, p["patch_embed"]["kernel"].astype(dtype) if dtype else p["patch_embed"]["kernel"])
    cls = jnp.broadcast_to(p["class_embedding"].astype(x.dtype), (B, 1, cfg.vision_hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["pos_embed"].astype(x.dtype)[None]
    x = layer_norm(p["pre_norm"], x, cfg.layer_norm_eps)
    x = _tower(p, x, None, cfg.vision_heads, cfg.layer_norm_eps, ACT2FN[cfg.hidden_act], dtype)
    pooled = layer_norm(p["post_norm"], x[:, 0], cfg.layer_norm_eps)
    return x, pooled


def clip_text_forward(params, input_ids, cfg: CLIPConfig, dtype=None):
    """input_ids (B, L) -> (last_hidden, pooled at the eot position).

    Pooled position = argmax(input_ids) (eot has the largest id in the CLIP
    vocab; HF CLIPTextTransformer semantics).
    """
    p = params["text"]
    B, L = input_ids.shape
    x = embedding_lookup(p["token_embedding"], input_ids)
    x = x + p["pos_embed"][:L][None]
    if dtype is not None:
        x = x.astype(dtype)
    seq = jnp.arange(L)
    causal = jnp.where(seq[None, :] <= seq[:, None], 0.0, -jnp.inf)[None, None]
    x = _tower(p, x, causal, cfg.text_heads, cfg.layer_norm_eps, ACT2FN[cfg.hidden_act], dtype)
    x = layer_norm(p["final_norm"], x, cfg.layer_norm_eps)
    eot = jnp.argmax(input_ids, axis=-1)
    pooled = x[jnp.arange(B), eot]
    return x, pooled


def clip_image_embeds(params, images, cfg: CLIPConfig, dtype=None, normalize: bool = True):
    """CLIPModel.forward image_embeds: projected (+ L2-normalized) pooled CLS."""
    _, pooled = clip_vision_forward(params, images, cfg, dtype=dtype)
    emb = jnp.dot(pooled, params["visual_projection"]["kernel"].astype(pooled.dtype))
    if normalize:
        emb = emb / jnp.linalg.norm(emb.astype(jnp.float32), axis=-1, keepdims=True).astype(emb.dtype)
    return emb


def clip_text_embeds(params, input_ids, cfg: CLIPConfig, dtype=None, normalize: bool = True):
    _, pooled = clip_text_forward(params, input_ids, cfg, dtype=dtype)
    emb = jnp.dot(pooled, params["text_projection"]["kernel"].astype(pooled.dtype))
    if normalize:
        emb = emb / jnp.linalg.norm(emb.astype(jnp.float32), axis=-1, keepdims=True).astype(emb.dtype)
    return emb
