"""BLIP pretraining (image/video): ITA + ITM + LM triple loss.

Functional equivalent of the reference BLIP_Pretrain[_Video] (reference:
models/blip_pretrain.py:250-456). Differences from the retrieval loss:
in-batch negative mining with ``softmax(sim[:, :B]) + 1e-4`` and a zeroed
diagonal (:395-399), a queue without idx slots, and an additional caption
LM loss through a text decoder whose non-attention weights are TIED to
the text encoder (reference tie_encoder_decoder_weights with
skip_key='/attention', :325,526-595).

Weight tying is expressed functionally: the decoder's MED params are
*constructed* from the encoder subtree (embeddings, FFN, norms) plus
decoder-owned attention + LM-head params, so gradients flow into the
shared arrays from both towers automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vidil_tpu.config import MedConfig, ViTConfig
from vidil_tpu.models import med as M
from vidil_tpu.models.blip_retrieval import (
    QueueState,
    _text_features,
    _video_features,
    init_retrieval_params,
)
from vidil_tpu.models.layers import linear
from vidil_tpu.models.med import init_med


def init_pretrain_params(key, vit_cfg: ViTConfig, med_cfg: MedConfig, embed_dim: int = 256):
    k1, k2 = jax.random.split(key)
    params = init_retrieval_params(k1, vit_cfg, med_cfg, embed_dim)
    dec = init_med(k2, med_cfg, with_lm_head=True)
    # decoder owns ONLY the untied pieces: attention blocks + LM head
    params["decoder_attn"] = {
        "self_attn": dec["layers"]["self_attn"],
        "cross_attn": dec["layers"]["cross_attn"],
    }
    params["decoder_cls"] = dec["cls"]
    return params


def tied_decoder_params(params):
    """Assemble the decoder MED param tree: encoder weights for everything
    except attention (tied), decoder-owned attention + head."""
    enc = params["text_encoder"]
    return {
        "embeddings": enc["embeddings"],
        "layers": {
            "self_attn": params["decoder_attn"]["self_attn"],
            "cross_attn": params["decoder_attn"]["cross_attn"],
            "mlp": enc["layers"]["mlp"],
            "mlp_norm": enc["layers"]["mlp_norm"],
        },
        "cls": params["decoder_cls"],
    }


def pretrain_loss(
    params,
    params_m,
    queue: QueueState,
    video,
    text_ids,      # [CLS]-prefixed, max_length=30
    enc_ids,       # [ENC] at position 0
    dec_ids,       # [DEC] at position 0
    text_mask,
    alpha,
    rng,
    vit_cfg: ViTConfig,
    med_cfg: MedConfig,
    dtype=None,
):
    """Triple loss (reference :328-456). Returns (ita, itm, lm, aux)."""
    temp = jnp.clip(params["temp"], 0.001, 0.5)
    B = video.shape[0]

    video_embeds, video_feat = _video_features(params, video, vit_cfg, dtype=dtype)
    text_feat = _text_features(params, text_ids, text_mask, med_cfg, dtype=dtype)

    pm = jax.lax.stop_gradient(params_m)
    _, video_feat_m = _video_features(pm, video, vit_cfg, dtype=dtype)
    text_feat_m = _text_features(pm, text_ids, text_mask, med_cfg, dtype=dtype)

    video_feat_all = jnp.concatenate([video_feat_m.T, queue.image], axis=1)
    text_feat_all = jnp.concatenate([text_feat_m.T, queue.text], axis=1)

    sim_i2t_m = (video_feat_m @ text_feat_all) / temp
    sim_t2i_m = (text_feat_m @ video_feat_all) / temp
    eye = jnp.eye(B, sim_i2t_m.shape[1])
    sim_i2t_targets = jax.lax.stop_gradient(alpha * jax.nn.softmax(sim_i2t_m, axis=1) + (1 - alpha) * eye)
    sim_t2i_targets = jax.lax.stop_gradient(alpha * jax.nn.softmax(sim_t2i_m, axis=1) + (1 - alpha) * eye)

    sim_i2t = (video_feat @ text_feat_all.astype(video_feat.dtype)) / temp
    sim_t2i = (text_feat @ video_feat_all.astype(text_feat.dtype)) / temp
    loss_i2t = -jnp.sum(jax.nn.log_softmax(sim_i2t.astype(jnp.float32), axis=1) * sim_i2t_targets, axis=1).mean()
    loss_t2i = -jnp.sum(jax.nn.log_softmax(sim_t2i.astype(jnp.float32), axis=1) * sim_t2i_targets, axis=1).mean()
    loss_ita = (loss_i2t + loss_t2i) / 2

    # --- ITM with in-batch negatives (reference :383-441) ---
    video_atts = jnp.ones(video_embeds.shape[:2], jnp.int32)
    pos_hidden = M.med_forward(
        params["text_encoder"], enc_ids, text_mask,
        encoder_hidden_states=video_embeds, encoder_attention_mask=video_atts,
        cfg=med_cfg, mode="multimodal", dtype=dtype,
    )
    w_t2i = jax.lax.stop_gradient(jax.nn.softmax(sim_t2i[:, :B].astype(jnp.float32), axis=1)) + 1e-4
    w_i2t = jax.lax.stop_gradient(jax.nn.softmax(sim_i2t[:, :B].astype(jnp.float32), axis=1)) + 1e-4
    diag = jnp.eye(B, dtype=bool)
    w_t2i = jnp.where(diag, 0.0, w_t2i)
    w_i2t = jnp.where(diag, 0.0, w_i2t)
    k1, k2 = jax.random.split(rng)
    neg_video_idx = jax.random.categorical(k1, jnp.log(w_t2i), axis=1)
    neg_text_idx = jax.random.categorical(k2, jnp.log(w_i2t), axis=1)

    text_ids_all = jnp.concatenate([enc_ids, enc_ids[neg_text_idx]], axis=0)
    text_atts_all = jnp.concatenate([text_mask, text_mask[neg_text_idx]], axis=0)
    video_embeds_all = jnp.concatenate([video_embeds[neg_video_idx], video_embeds], axis=0)
    video_atts_all = jnp.concatenate([video_atts, video_atts], axis=0)
    neg_hidden = M.med_forward(
        params["text_encoder"], text_ids_all, text_atts_all,
        encoder_hidden_states=video_embeds_all, encoder_attention_mask=video_atts_all,
        cfg=med_cfg, mode="multimodal", dtype=dtype,
    )
    vl = jnp.concatenate([pos_hidden[:, 0, :], neg_hidden[:, 0, :]], axis=0)
    logits = linear(params["itm_head"], vl, dtype=dtype).astype(jnp.float32)
    labels = jnp.concatenate([jnp.ones(B, jnp.int32), jnp.zeros(2 * B, jnp.int32)])
    loss_itm = -jnp.take_along_axis(jax.nn.log_softmax(logits, axis=-1), labels[:, None], axis=-1).mean()

    # --- LM (reference :443-454) ---
    dec_params = tied_decoder_params(params)
    dec_targets = jnp.where(dec_ids == med_cfg.pad_token_id, -100, dec_ids)
    hidden = M.med_forward(
        dec_params, dec_ids, text_mask,
        encoder_hidden_states=video_embeds, encoder_attention_mask=video_atts,
        cfg=med_cfg, mode="multimodal", is_decoder=True, dtype=dtype,
    )
    lm_logits = M.med_lm_logits(dec_params, hidden, med_cfg, dtype=dtype)
    loss_lm = M.med_lm_loss(lm_logits, dec_targets, label_smoothing=med_cfg.label_smoothing)

    aux = {
        "video_feat_m": jax.lax.stop_gradient(video_feat_m),
        "text_feat_m": jax.lax.stop_gradient(text_feat_m),
    }
    return loss_ita, loss_itm, loss_lm, aux
