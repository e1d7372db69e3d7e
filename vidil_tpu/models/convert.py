"""Checkpoint converters: torch/HF state dicts -> vidil_tpu param pytrees.

One-time converters so the public BLIP ``.pth`` checkpoints (reference:
download_blip_checkpoints.sh) and HF CLIP/BERT weights can drive the
TPU-native models. Works on numpy arrays; torch is only needed to
``torch.load`` a ``.pth`` file.

Layout notes:
  * linear kernels transpose torch ``(out, in)`` -> JAX ``(in, out)``;
  * ViT patch conv ``(D, C, P, P)`` -> ``(P*P*C, D)`` matching
    ``vidil_tpu.models.vit.patchify``'s (ph, pw, c) inner order;
  * per-layer tensors are stacked on a leading layer axis for lax.scan.
"""

from __future__ import annotations

import re

import jax.numpy as jnp
import numpy as np

from vidil_tpu.config import CLIPConfig, MedConfig, ViTConfig


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _lin(sd, prefix):
    return {"kernel": jnp.asarray(_np(sd[prefix + ".weight"]).T), "bias": jnp.asarray(_np(sd[prefix + ".bias"]))}


def _ln(sd, prefix):
    return {"scale": jnp.asarray(_np(sd[prefix + ".weight"])), "bias": jnp.asarray(_np(sd[prefix + ".bias"]))}


def _stack(dicts):
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs), *dicts)


# ---------------------------------------------------------------------------
# BLIP ViT  (torch keys: visual_encoder.*, reference models/vit.py)
# ---------------------------------------------------------------------------

def convert_vit(sd: dict, cfg: ViTConfig, prefix: str = "visual_encoder.") -> dict:
    p = prefix
    conv_w = _np(sd[p + "patch_embed.proj.weight"])  # (D, C, P, P)
    D = conv_w.shape[0]
    kernel = conv_w.transpose(2, 3, 1, 0).reshape(-1, D)  # (P*P*C, D), (ph,pw,c) order
    blocks = []
    n_layers = cfg.num_layers
    for i in range(n_layers):
        b = f"{p}blocks.{i}."
        blocks.append(
            {
                "norm1": _ln(sd, b + "norm1"),
                "attn": {"qkv": _lin(sd, b + "attn.qkv"), "proj": _lin(sd, b + "attn.proj")},
                "norm2": _ln(sd, b + "norm2"),
                "mlp": {"fc1": _lin(sd, b + "mlp.fc1"), "fc2": _lin(sd, b + "mlp.fc2")},
            }
        )
    pos_embed = jnp.asarray(_np(sd[p + "pos_embed"]))
    params = {
        "patch_embed": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(_np(sd[p + "patch_embed.proj.bias"]))},
        "cls_token": jnp.asarray(_np(sd[p + "cls_token"])),
        "pos_embed": pos_embed,
        "blocks": _stack(blocks),
        "norm": _ln(sd, p + "norm"),
    }
    if pos_embed.shape[1] != cfg.seq_len:
        from vidil_tpu.models.vit import interpolate_pos_embed

        params["pos_embed"] = interpolate_pos_embed(pos_embed, cfg.num_patches)
    return params


def load_vit_flax_npz(path, cfg: ViTConfig) -> dict:
    """Load a Google vision_transformer Flax ``.npz`` checkpoint
    (augreg/original ViT release layout) into our ViT pytree.

    Parity with the reference's npz path (reference: models/vit.py:201-278,
    timm-style `_load_weights`): fused qkv from separate q/k/v kernels,
    (ph,pw,c,D) conv kernel flattened to our patchify ordering, pos-embed
    bicubic interpolation on grid-size mismatch.
    """
    z = np.load(path) if isinstance(path, str) else path
    D = int(z["embedding/bias"].shape[0])

    def ln(pfx):
        return {"scale": jnp.asarray(z[pfx + "/scale"]), "bias": jnp.asarray(z[pfx + "/bias"])}

    blocks = []
    for i in range(cfg.num_layers):
        b = f"Transformer/encoderblock_{i}/"
        a = b + "MultiHeadDotProductAttention_1/"
        # (D, H, dh) per head -> (D, D); fused qkv kernel is (D, 3D)
        qkv_k = np.concatenate([np.asarray(z[a + f"{n}/kernel"]).reshape(D, D)
                                for n in ("query", "key", "value")], axis=1)
        qkv_b = np.concatenate([np.asarray(z[a + f"{n}/bias"]).reshape(D)
                                for n in ("query", "key", "value")])
        blocks.append({
            "norm1": ln(b + "LayerNorm_0"),
            "attn": {
                "qkv": {"kernel": jnp.asarray(qkv_k), "bias": jnp.asarray(qkv_b)},
                "proj": {"kernel": jnp.asarray(np.asarray(z[a + "out/kernel"]).reshape(D, D)),
                         "bias": jnp.asarray(z[a + "out/bias"])},
            },
            "norm2": ln(b + "LayerNorm_2"),
            "mlp": {
                "fc1": {"kernel": jnp.asarray(z[b + "MlpBlock_3/Dense_0/kernel"]),
                        "bias": jnp.asarray(z[b + "MlpBlock_3/Dense_0/bias"])},
                "fc2": {"kernel": jnp.asarray(z[b + "MlpBlock_3/Dense_1/kernel"]),
                        "bias": jnp.asarray(z[b + "MlpBlock_3/Dense_1/bias"])},
            },
        })
    pos_embed = jnp.asarray(z["Transformer/posembed_input/pos_embedding"])
    params = {
        # flax conv kernel (ph, pw, c, D) flattens directly to our
        # patchify (ph, pw, c) ordering
        "patch_embed": {"kernel": jnp.asarray(np.asarray(z["embedding/kernel"]).reshape(-1, D)),
                        "bias": jnp.asarray(z["embedding/bias"])},
        "cls_token": jnp.asarray(np.asarray(z["cls"]).reshape(1, 1, D)),
        "pos_embed": pos_embed,
        "blocks": _stack(blocks),
        "norm": ln("Transformer/encoder_norm"),
    }
    if pos_embed.shape[1] != cfg.seq_len:
        from vidil_tpu.models.vit import interpolate_pos_embed

        params["pos_embed"] = interpolate_pos_embed(pos_embed, cfg.num_patches)
    return params


# ---------------------------------------------------------------------------
# MED / BERT  (torch keys: text_decoder.bert.*, text_encoder.*, or HF bert.*)
# ---------------------------------------------------------------------------

def convert_med(
    sd: dict,
    cfg: MedConfig,
    prefix: str = "",
    lm_head_prefix: str | None = None,
    with_pooler: bool = False,
) -> dict:
    """Convert a BERT/MED tower.

    Args:
      prefix: e.g. ``"text_encoder."`` or ``"text_decoder.bert."``.
      lm_head_prefix: e.g. ``"text_decoder."`` to also pull ``cls.predictions.*``.
    """
    p = prefix
    layers = []
    for i in range(cfg.num_layers):
        b = f"{p}encoder.layer.{i}."
        layer = {
            "self_attn": {
                "query": _lin(sd, b + "attention.self.query"),
                "key": _lin(sd, b + "attention.self.key"),
                "value": _lin(sd, b + "attention.self.value"),
                "out": _lin(sd, b + "attention.output.dense"),
                "norm": _ln(sd, b + "attention.output.LayerNorm"),
            },
            "mlp": {
                "fc1": _lin(sd, b + "intermediate.dense"),
                "fc2": _lin(sd, b + "output.dense"),
            },
            "mlp_norm": _ln(sd, b + "output.LayerNorm"),
        }
        if cfg.add_cross_attention and (b + "crossattention.self.query.weight") in sd:
            layer["cross_attn"] = {
                "query": _lin(sd, b + "crossattention.self.query"),
                "key": _lin(sd, b + "crossattention.self.key"),
                "value": _lin(sd, b + "crossattention.self.value"),
                "out": _lin(sd, b + "crossattention.output.dense"),
                "norm": _ln(sd, b + "crossattention.output.LayerNorm"),
            }
        layers.append(layer)

    word = _np(sd[p + "embeddings.word_embeddings.weight"])
    params = {
        "embeddings": {
            "word": {"embedding": jnp.asarray(word)},
            "position": {"embedding": jnp.asarray(_np(sd[p + "embeddings.position_embeddings.weight"]))},
            "norm": _ln(sd, p + "embeddings.LayerNorm"),
        },
        "layers": _stack(layers),
    }
    # HF BERT has token_type embeddings; MED does not (reference med.py:52-66).
    # With token_type_ids == 0 the row-0 type embedding is a constant additive
    # term; keep it separate (NOT folded into the word embedding) so the tied
    # LM-head decoder weight stays exactly the word embedding.
    tt_key = p + "embeddings.token_type_embeddings.weight"
    if tt_key in sd:
        params["embeddings"]["type_bias"] = jnp.asarray(_np(sd[tt_key])[0])
    if with_pooler and (p + "pooler.dense.weight") in sd:
        params["pooler"] = _lin(sd, p + "pooler.dense")
    if lm_head_prefix is not None:
        h = lm_head_prefix
        params["cls"] = {
            "transform": {
                "dense": _lin(sd, h + "cls.predictions.transform.dense"),
                "norm": _ln(sd, h + "cls.predictions.transform.LayerNorm"),
            },
            "bias": jnp.asarray(_np(sd[h + "cls.predictions.bias"])),
        }
        # Note: cls.predictions.decoder.weight is tied to the word embedding
        # in the reference checkpoints; med_lm_logits reuses the embedding.
        dec_key = h + "cls.predictions.decoder.weight"
        if dec_key in sd:
            dec = _np(sd[dec_key])
            emb = _np(sd[p + "embeddings.word_embeddings.weight"])
            if not np.allclose(dec, emb):
                # untied checkpoint: fold the decoder weight in as the word
                # embedding of the LM head path is the only consumer when
                # tt_key is absent; otherwise warn loudly.
                raise ValueError(
                    "checkpoint has an untied LM decoder weight; "
                    "vidil_tpu assumes tied embeddings (as all BLIP ckpts are)"
                )
    return params


# ---------------------------------------------------------------------------
# BLIP composite checkpoints
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> dict:
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: _np(v) for k, v in sd.items()}


def convert_blip_decoder(sd: dict, vit_cfg: ViTConfig, med_cfg: MedConfig) -> dict:
    """BLIP_Decoder / BLIP_Video_Decoder checkpoint (reference: models/blip.py:77-266)."""
    return {
        "visual_encoder": convert_vit(sd, vit_cfg, "visual_encoder."),
        "text_decoder": convert_med(
            sd, med_cfg, prefix="text_decoder.bert.", lm_head_prefix="text_decoder."
        ),
    }


def convert_blip_itm(sd: dict, vit_cfg: ViTConfig, med_cfg: MedConfig) -> dict:
    """BLIP_ITM checkpoint (reference: models/blip_itm.py)."""
    return {
        "visual_encoder": convert_vit(sd, vit_cfg, "visual_encoder."),
        "text_encoder": convert_med(sd, med_cfg, prefix="text_encoder."),
        "vision_proj": _lin(sd, "vision_proj"),
        "text_proj": _lin(sd, "text_proj"),
        "itm_head": _lin(sd, "itm_head"),
    }


def convert_blip_retrieval(sd: dict, vit_cfg: ViTConfig, med_cfg: MedConfig, with_momentum: bool = True) -> dict:
    """BLIP_Retrieval[_Video] checkpoint (reference: models/blip_retrieval.py)."""
    params = convert_blip_itm(sd, vit_cfg, med_cfg)
    if with_momentum and "visual_encoder_m.cls_token" in sd:
        params_m = {
            "visual_encoder": convert_vit(sd, vit_cfg, "visual_encoder_m."),
            "text_encoder": convert_med(sd, med_cfg, prefix="text_encoder_m."),
            "vision_proj": _lin(sd, "vision_proj_m"),
            "text_proj": _lin(sd, "text_proj_m"),
        }
        params["momentum"] = params_m
    if "temp" in sd:
        params["temp"] = jnp.asarray(_np(sd["temp"]).reshape(()))
    return params


def convert_blip_vqa(sd: dict, vit_cfg: ViTConfig, med_cfg: MedConfig) -> dict:
    """BLIP_VQA checkpoint (reference: models/blip_vqa.py)."""
    return {
        "visual_encoder": convert_vit(sd, vit_cfg, "visual_encoder."),
        "text_encoder": convert_med(sd, med_cfg, prefix="text_encoder."),
        "text_decoder": convert_med(
            sd, med_cfg, prefix="text_decoder.bert.", lm_head_prefix="text_decoder."
        ),
    }


# ---------------------------------------------------------------------------
# HF CLIP
# ---------------------------------------------------------------------------

def _clip_tower_layers(sd, prefix, n_layers):
    layers = []
    for i in range(n_layers):
        b = f"{prefix}.layers.{i}."
        layers.append(
            {
                "norm1": _ln(sd, b + "layer_norm1"),
                "attn": {
                    "query": _lin(sd, b + "self_attn.q_proj"),
                    "key": _lin(sd, b + "self_attn.k_proj"),
                    "value": _lin(sd, b + "self_attn.v_proj"),
                    "out": _lin(sd, b + "self_attn.out_proj"),
                },
                "norm2": _ln(sd, b + "layer_norm2"),
                "mlp": {"fc1": _lin(sd, b + "mlp.fc1"), "fc2": _lin(sd, b + "mlp.fc2")},
            }
        )
    return _stack(layers)


def convert_clip(sd: dict, cfg: CLIPConfig) -> dict:
    """HF CLIPModel state dict -> vidil_tpu CLIP params."""
    conv_w = _np(sd["vision_model.embeddings.patch_embedding.weight"])  # (D, C, P, P)
    D = conv_w.shape[0]
    vision = {
        "patch_embed": {"kernel": jnp.asarray(conv_w.transpose(2, 3, 1, 0).reshape(-1, D))},
        "class_embedding": jnp.asarray(_np(sd["vision_model.embeddings.class_embedding"])),
        "pos_embed": jnp.asarray(_np(sd["vision_model.embeddings.position_embedding.weight"])),
        "pre_norm": _ln(sd, "vision_model.pre_layrnorm")
        if "vision_model.pre_layrnorm.weight" in sd
        else _ln(sd, "vision_model.pre_layernorm"),
        "layers": _clip_tower_layers(sd, "vision_model.encoder", cfg.vision_layers),
        "post_norm": _ln(sd, "vision_model.post_layernorm"),
    }
    text = {
        "token_embedding": {"embedding": jnp.asarray(_np(sd["text_model.embeddings.token_embedding.weight"]))},
        "pos_embed": jnp.asarray(_np(sd["text_model.embeddings.position_embedding.weight"])),
        "layers": _clip_tower_layers(sd, "text_model.encoder", cfg.text_layers),
        "final_norm": _ln(sd, "text_model.final_layer_norm"),
    }
    return {
        "vision": vision,
        "text": text,
        "visual_projection": {"kernel": jnp.asarray(_np(sd["visual_projection.weight"]).T)},
        "text_projection": {"kernel": jnp.asarray(_np(sd["text_projection.weight"]).T)},
        "logit_scale": jnp.asarray(_np(sd["logit_scale"]).reshape(())),
    }
