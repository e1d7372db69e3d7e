"""BLIP retrieval (image/video): ITA + ITM training losses, TPU-first.

Functional re-design of the reference BLIP_Retrieval[_Video]
(reference: models/blip_retrieval.py:288-560):

* momentum encoders and the 57,600-slot feature queues are **explicit
  functional state** threaded through the train step (the reference uses
  registered buffers mutated in-place);
* cross-rank behavior: under pjit/shard_map the batch axis is global, so
  feature "all-gather" (reference concat_all_gather / all_gather_with_grad,
  :576-622) is the identity on the global array — the semantics match the
  reference's ``negative_all_rank=True`` configuration (the default in
  every pipeline yaml);
* hard-negative sampling uses ``jax.random.categorical`` over masked
  log-weights (same distribution as torch.multinomial, :429-517);
* the temperature is clamped to [0.001, 0.5] functionally (:352-353).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vidil_tpu.config import MedConfig, ViTConfig
from vidil_tpu.models import med as M
from vidil_tpu.models.blip import encode_video_frames, init_blip_itm
from vidil_tpu.models.layers import linear
from vidil_tpu.models.vit import vit_forward


class QueueState(NamedTuple):
    """Feature queues (reference :334-341). image/text: (embed_dim, Q)."""

    image: jnp.ndarray
    text: jnp.ndarray
    idx: jnp.ndarray  # (1, Q) int32, -100 = empty
    ptr: jnp.ndarray  # () int32


MOMENTUM_KEYS = ("visual_encoder", "text_encoder", "vision_proj", "text_proj")


def init_retrieval_params(key, vit_cfg: ViTConfig, med_cfg: MedConfig, embed_dim: int = 256):
    params = init_blip_itm(key, vit_cfg, med_cfg, embed_dim)
    params["temp"] = jnp.asarray(0.07, jnp.float32)
    return params


def init_momentum_params(params):
    """Momentum copies of the four encoder/projection towers (reference
    :323-334, copy_params :521-527). Real copies, not aliases: the train
    state donates its buffers, and a donated buffer may appear only once
    in the argument list."""
    return {k: jax.tree.map(lambda x: jnp.array(x, copy=True), params[k])
            for k in MOMENTUM_KEYS}


def init_queue(key, embed_dim: int, queue_size: int) -> QueueState:
    k1, k2 = jax.random.split(key)
    img = jax.random.normal(k1, (embed_dim, queue_size))
    txt = jax.random.normal(k2, (embed_dim, queue_size))
    img = img / jnp.linalg.norm(img, axis=0, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=0, keepdims=True)
    return QueueState(
        image=img, text=txt,
        idx=jnp.full((1, queue_size), -100, jnp.int32),
        ptr=jnp.zeros((), jnp.int32),
    )


def momentum_update(params, params_m, momentum: float = 0.995):
    """param_m = m * param_m + (1 - m) * param (reference :529-533)."""
    new = {}
    for k in MOMENTUM_KEYS:
        new[k] = jax.tree.map(
            lambda pm, p: pm * momentum + p * (1.0 - momentum), params_m[k], params[k]
        )
    return new


def dequeue_and_enqueue(queue: QueueState, image_feat, text_feat, idxs) -> QueueState:
    """Write the (global) batch features at ptr (reference :536-554).
    Requires queue_size % batch == 0 (asserted by the reference)."""
    B = image_feat.shape[0]
    ptr = queue.ptr
    img = jax.lax.dynamic_update_slice(queue.image, image_feat.T.astype(queue.image.dtype), (0, ptr))
    txt = jax.lax.dynamic_update_slice(queue.text, text_feat.T.astype(queue.text.dtype), (0, ptr))
    idx = jax.lax.dynamic_update_slice(queue.idx, idxs.reshape(1, -1).astype(jnp.int32), (0, ptr))
    new_ptr = (ptr + B) % queue.image.shape[1]
    return QueueState(image=img, text=txt, idx=idx, ptr=new_ptr)


def _video_features(params, video, vit_cfg: ViTConfig, dtype=None):
    """(B, N, S, S, C) -> (video_embeds (B, N*(P+1), D), video_feat (B, E)).

    Per-frame CLS features are projected then mean-pooled for the
    contrastive feature; the full token grid feeds cross-attention
    (reference :355-363).
    """
    B, N = video.shape[:2]
    flat = video.reshape((B * N,) + video.shape[2:])
    embeds = vit_forward(params["visual_encoder"], flat, vit_cfg, dtype=dtype)
    feat = linear(params["vision_proj"], embeds[:, 0, :], dtype=dtype)
    feat = feat.reshape(B, N, -1).mean(axis=1)
    feat = feat / jnp.linalg.norm(feat.astype(jnp.float32), axis=-1, keepdims=True).astype(feat.dtype)
    video_embeds = embeds.reshape(B, N * embeds.shape[1], embeds.shape[2])
    return video_embeds, feat


def _text_features(params, text_ids, text_mask, med_cfg: MedConfig, dtype=None):
    hidden = M.med_forward(params["text_encoder"], text_ids, text_mask,
                           cfg=med_cfg, mode="text", dtype=dtype)
    feat = linear(params["text_proj"], hidden[:, 0, :], dtype=dtype)
    return feat / jnp.linalg.norm(feat.astype(jnp.float32), axis=-1, keepdims=True).astype(feat.dtype)


def retrieval_loss(
    params,
    params_m,
    queue: QueueState,
    video,
    text_ids,
    enc_ids,
    text_mask,
    alpha,
    idx,
    rng,
    vit_cfg: ViTConfig,
    med_cfg: MedConfig,
    dtype=None,
):
    """ITA + ITM losses (reference :350-518).

    Args:
      video: (B, N, S, S, C) normalized frames (global batch).
      text_ids: tokenized captions ([CLS]-prefixed, max_length=35).
      enc_ids: same with [ENC] at position 0 (ITM path, :417-419).
      idx: (B,) int video ids for positive-pair masking.
    Returns (loss_ita, loss_itm, aux) with aux carrying the momentum feats
    for the queue update.
    """
    temp = jnp.clip(params["temp"], 0.001, 0.5)
    B = video.shape[0]

    video_embeds, video_feat = _video_features(params, video, vit_cfg, dtype=dtype)
    text_feat = _text_features(params, text_ids, text_mask, med_cfg, dtype=dtype)

    # --- momentum features (stop-grad towers) ---
    pm = jax.lax.stop_gradient(params_m)
    video_embeds_m, video_feat_m = _video_features(pm, video, vit_cfg, dtype=dtype)
    text_feat_m = _text_features(pm, text_ids, text_mask, med_cfg, dtype=dtype)
    del video_embeds_m

    video_feat_m_all = jnp.concatenate([video_feat_m.T, queue.image], axis=1)  # (E, B+Q)
    text_feat_m_all = jnp.concatenate([text_feat_m.T, queue.text], axis=1)

    sim_i2t_m = (video_feat_m @ text_feat_m_all) / temp
    sim_t2i_m = (text_feat_m @ video_feat_m_all) / temp
    # video variant uses in-batch diagonal targets (reference :404-405)
    eye = jnp.eye(B, sim_i2t_m.shape[1])
    sim_i2t_targets = alpha * jax.nn.softmax(sim_i2t_m, axis=1) + (1 - alpha) * eye
    sim_t2i_targets = alpha * jax.nn.softmax(sim_t2i_m, axis=1) + (1 - alpha) * eye
    sim_i2t_targets = jax.lax.stop_gradient(sim_i2t_targets)
    sim_t2i_targets = jax.lax.stop_gradient(sim_t2i_targets)

    sim_i2t = (video_feat @ text_feat_m_all.astype(video_feat.dtype)) / temp
    sim_t2i = (text_feat @ video_feat_m_all.astype(text_feat.dtype)) / temp
    loss_i2t = -jnp.sum(jax.nn.log_softmax(sim_i2t.astype(jnp.float32), axis=1) * sim_i2t_targets, axis=1).mean()
    loss_t2i = -jnp.sum(jax.nn.log_softmax(sim_t2i.astype(jnp.float32), axis=1) * sim_t2i_targets, axis=1).mean()
    loss_ita = (loss_i2t + loss_t2i) / 2

    # --- ITM with hard negatives (global-batch mining, reference :429-517) ---
    video_atts = jnp.ones(video_embeds.shape[:2], jnp.int32)
    pos_hidden = M.med_forward(
        params["text_encoder"], enc_ids, text_mask,
        encoder_hidden_states=video_embeds, encoder_attention_mask=video_atts,
        cfg=med_cfg, mode="multimodal", dtype=dtype,
    )

    idx_col = idx.reshape(-1, 1)
    mask = idx_col == idx_col.T  # (B, B) positives share the same video id
    sim_i2t_b = jax.lax.stop_gradient((video_feat @ text_feat.T) / temp).astype(jnp.float32)
    sim_t2i_b = jax.lax.stop_gradient((text_feat @ video_feat.T) / temp).astype(jnp.float32)
    neg_inf = jnp.float32(-1e9)
    logw_i2t = jnp.where(mask, neg_inf, jax.nn.log_softmax(sim_i2t_b, axis=1))
    logw_t2i = jnp.where(mask, neg_inf, jax.nn.log_softmax(sim_t2i_b, axis=1))

    k1, k2 = jax.random.split(rng)
    neg_video_idx = jax.random.categorical(k1, logw_t2i, axis=1)  # (B,)
    neg_text_idx = jax.random.categorical(k2, logw_i2t, axis=1)

    video_embeds_neg = video_embeds[neg_video_idx]
    text_ids_neg = enc_ids[neg_text_idx]
    text_atts_neg = text_mask[neg_text_idx]

    text_ids_all = jnp.concatenate([enc_ids, text_ids_neg], axis=0)
    text_atts_all = jnp.concatenate([text_mask, text_atts_neg], axis=0)
    video_embeds_all = jnp.concatenate([video_embeds_neg, video_embeds], axis=0)
    video_atts_all = jnp.concatenate([video_atts, video_atts], axis=0)

    neg_hidden = M.med_forward(
        params["text_encoder"], text_ids_all, text_atts_all,
        encoder_hidden_states=video_embeds_all, encoder_attention_mask=video_atts_all,
        cfg=med_cfg, mode="multimodal", dtype=dtype,
    )

    vl_embeddings = jnp.concatenate([pos_hidden[:, 0, :], neg_hidden[:, 0, :]], axis=0)
    vl_output = linear(params["itm_head"], vl_embeddings, dtype=dtype).astype(jnp.float32)
    itm_labels = jnp.concatenate([jnp.ones(B, jnp.int32), jnp.zeros(2 * B, jnp.int32)])
    logp = jax.nn.log_softmax(vl_output, axis=-1)
    loss_itm = -jnp.take_along_axis(logp, itm_labels[:, None], axis=-1).mean()

    aux = {
        "video_feat_m": jax.lax.stop_gradient(video_feat_m),
        "text_feat_m": jax.lax.stop_gradient(text_feat_m),
        "idx": idx,
    }
    return loss_ita, loss_itm, aux
