"""BLIP NLVR2: two-image reasoning head (vestigial in VidIL, kept for
inventory parity).

Functional equivalent of the reference BLIP_NLVR + nlvr_encoder
(reference: models/blip_nlvr.py:14-66, models/nlvr_encoder.py:219-249):
each layer cross-attends BOTH images with a shared attention core but
twin output denses; early layers average the two streams, layers >=
fusion_layer merge them via concat + linear. Classification = 2-layer
ReLU head on [CLS].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vidil_tpu.config import MedConfig, ViTConfig
from vidil_tpu.models import med as M
from vidil_tpu.models.layers import (
    dot_product_attention,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
    merge_heads,
    split_heads,
)
from vidil_tpu.models.med import init_med
from vidil_tpu.models.vit import init_vit, vit_forward


def init_blip_nlvr(key, vit_cfg: ViTConfig, med_cfg: MedConfig, fusion_layer: int = 6):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    params = {
        "visual_encoder": init_vit(k1, vit_cfg),
        "text_encoder": init_med(k2, med_cfg),
        "cls_head": {
            "fc1": init_linear(k3, med_cfg.hidden_size, med_cfg.hidden_size),
            "fc2": init_linear(k4, med_cfg.hidden_size, 2),
        },
    }
    # twin cross-attn output denses + merge layers per layer
    d = med_cfg.hidden_size
    keys = jax.random.split(k5, 3)
    L = med_cfg.num_layers
    params["nlvr"] = {
        "dense0": jax.tree.map(lambda *x: jnp.stack(x), *[
            init_linear(jax.random.fold_in(keys[0], i), d, d) for i in range(L)]),
        "dense1": jax.tree.map(lambda *x: jnp.stack(x), *[
            init_linear(jax.random.fold_in(keys[1], i), d, d) for i in range(L)]),
        "merge": jax.tree.map(lambda *x: jnp.stack(x), *[
            init_linear(jax.random.fold_in(keys[2], i), 2 * d, d) for i in range(L)]),
    }
    return params


def nlvr_forward(params, image0, image1, text_ids, text_mask,
                 vit_cfg: ViTConfig, med_cfg: MedConfig,
                 fusion_layer: int = 6, dtype=None):
    """(B, 2) logits for the two-image entailment task."""
    B = image0.shape[0]
    embeds = vit_forward(params["visual_encoder"],
                         jnp.concatenate([image0, image1], axis=0), vit_cfg, dtype=dtype)
    img0, img1 = embeds[:B], embeds[B:]
    cross_bias = M.invert_attention_mask(jnp.ones(img0.shape[:2], jnp.int32))

    x = M.med_embeddings(params["text_encoder"], text_ids, med_cfg, dtype=dtype)
    self_bias = M.extended_attention_mask(text_mask, is_decoder=False)
    nh, eps = med_cfg.num_heads, med_cfg.layer_norm_eps

    def layer_fn(i, x):
        layer = jax.tree.map(lambda p: p[i], params["text_encoder"]["layers"])
        d0 = jax.tree.map(lambda p: p[i], params["nlvr"]["dense0"])
        d1 = jax.tree.map(lambda p: p[i], params["nlvr"]["dense1"])
        mg = jax.tree.map(lambda p: p[i], params["nlvr"]["merge"])
        sa = layer["self_attn"]
        q = split_heads(linear(sa["query"], x, dtype=dtype), nh)
        k = split_heads(linear(sa["key"], x, dtype=dtype), nh)
        v = split_heads(linear(sa["value"], x, dtype=dtype), nh)
        ctx = merge_heads(dot_product_attention(q, k, v, bias=self_bias))
        x = layer_norm(sa["norm"], linear(sa["out"], ctx, dtype=dtype) + x, eps)

        ca = layer["cross_attn"]
        qc = split_heads(linear(ca["query"], x, dtype=dtype), nh)
        outs = []
        for img in (img0, img1):
            kc = split_heads(linear(ca["key"], img.astype(qc.dtype) if dtype else img, dtype=dtype), nh)
            vc = split_heads(linear(ca["value"], img.astype(qc.dtype) if dtype else img, dtype=dtype), nh)
            outs.append(merge_heads(dot_product_attention(qc, kc, vc, bias=cross_bias)))
        h0 = linear(d0, outs[0], dtype=dtype)
        h1 = linear(d1, outs[1], dtype=dtype)
        if i >= fusion_layer:
            h = linear(mg, jnp.concatenate([h0, h1], axis=-1), dtype=dtype)
        else:
            h = (h0 + h1) / 2
        x = layer_norm(ca["norm"], h + x, eps)

        h = linear(layer["mlp"]["fc1"], x, dtype=dtype)
        h = jax.nn.gelu(h, approximate=False)
        h = linear(layer["mlp"]["fc2"], h, dtype=dtype)
        return layer_norm(layer["mlp_norm"], h + x, eps)

    for i in range(med_cfg.num_layers):
        x = layer_fn(i, x)

    h = linear(params["cls_head"]["fc1"], x[:, 0, :], dtype=dtype)
    h = jax.nn.relu(h)
    return linear(params["cls_head"]["fc2"], h, dtype=dtype).astype(jnp.float32)


def nlvr_loss(logits, targets):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, targets[:, None], axis=-1).mean()
