"""BLIP VQA (image + video): question-conditioned answer decoder.

Functional equivalent of the reference BLIP_[Video_]VQA (reference:
models/blip_vqa.py): the question encoder cross-attends the video tokens,
the answer decoder cross-attends the question states. Training uses
per-answer weights over a flattened ragged answer list; inference is
beam generation or first-token-topk answer ranking (:284-331).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vidil_tpu.config import MedConfig, ViTConfig
from vidil_tpu.models import med as M
from vidil_tpu.models.blip import encode_video_frames, make_decoder_closures
from vidil_tpu.models.med import init_med
from vidil_tpu.models.vit import init_vit
from vidil_tpu.ops.generation import GenerationConfig, beam_search


def init_blip_vqa(key, vit_cfg: ViTConfig, med_cfg: MedConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "visual_encoder": init_vit(k1, vit_cfg),
        "text_encoder": init_med(k2, med_cfg),
        "text_decoder": init_med(k3, med_cfg, with_lm_head=True),
    }


def encode_question(params, video_embeds, question_ids, question_mask,
                    med_cfg: MedConfig, dtype=None):
    """Question encoder over video tokens ([ENC]-prefixed ids;
    reference :203-207, :216-221)."""
    video_atts = jnp.ones(video_embeds.shape[:2], jnp.int32)
    return M.med_forward(
        params["text_encoder"], question_ids, question_mask,
        encoder_hidden_states=video_embeds, encoder_attention_mask=video_atts,
        cfg=med_cfg, mode="multimodal", dtype=dtype,
    )


def vqa_train_loss(params, video_embeds, question_ids, question_mask,
                   answer_ids, answer_mask, answer_question_index, weights,
                   med_cfg: MedConfig, batch_size: int, dtype=None):
    """Weighted answer LM loss (reference :208-244).

    The reference replicates question states n_b times per question for its
    ragged answer list; here the flattened answers carry
    ``answer_question_index`` (per-answer question row), a gather instead
    of a python loop. loss = sum(weights * per-answer loss) / B.
    """
    question_states = encode_question(params, video_embeds, question_ids,
                                      question_mask, med_cfg, dtype=dtype)
    q_states = question_states[answer_question_index]
    q_mask = question_mask[answer_question_index]

    labels = jnp.where(answer_mask == 1, answer_ids, -100)
    hidden = M.med_forward(
        params["text_decoder"], answer_ids, answer_mask,
        encoder_hidden_states=q_states, encoder_attention_mask=q_mask,
        cfg=med_cfg, mode="multimodal", is_decoder=True, dtype=dtype,
    )
    logits = M.med_lm_logits(params["text_decoder"], hidden, med_cfg, dtype=dtype)
    per_answer = M.med_lm_loss(logits, labels, label_smoothing=med_cfg.label_smoothing,
                               reduction="none")
    return jnp.sum(weights * per_answer) / batch_size


def vqa_generate_ids(params, video_embeds, question_ids, question_mask,
                     med_cfg: MedConfig, tokenizer, max_length: int = 10,
                     num_beams: int = 3, dtype=None, length_norm: str = "legacy",
                     beam_group_kv: bool = False,
                     decode_layer_unroll: bool = False,
                     decode_lazy_reorder: bool = False):
    """Beam-search answers conditioned on question states (reference :254-275)."""
    B = video_embeds.shape[0]
    question_states = encode_question(params, video_embeds, question_ids,
                                      question_mask, med_cfg, dtype=dtype)
    # note the reference attends ALL question positions (atts = ones, :258)
    kv_src = question_states if beam_group_kv else jnp.repeat(question_states, num_beams, axis=0)
    beam_size = num_beams if beam_group_kv else 1
    cross_bias = M.invert_attention_mask(jnp.ones(kv_src.shape[:2], jnp.int32))
    cross_k, cross_v = M.precompute_cross_kv(params["text_decoder"], kv_src, med_cfg, dtype=dtype)
    gen = GenerationConfig(max_length=max_length, min_length=1, num_beams=num_beams,
                           eos_token_id=tokenizer.sep_token_id,
                           pad_token_id=tokenizer.pad_token_id, length_norm=length_norm)
    cache = M.init_self_cache(med_cfg, B * num_beams, gen.max_length,
                              unrolled=decode_layer_unroll,
                              lazy_reorder=decode_lazy_reorder)
    prefill_fn, step_fn, reorder_fn = make_decoder_closures(
        params, cross_k, cross_v, cross_bias, med_cfg, dtype=dtype, beam_size=beam_size)
    bos = jnp.full((B, 1), tokenizer.bos_token_id, jnp.int32)
    seqs, _ = beam_search(bos, cache, prefill_fn, step_fn, reorder_fn, gen)
    return seqs


def rank_answer(params, video_embeds, question_ids, question_mask,
                answer_ids, answer_mask, k: int, med_cfg: MedConfig,
                tokenizer, dtype=None):
    """Answer ranking (reference :284-331): first-token prob -> top-k
    candidate answers -> full-answer logprob rerank. Returns (B,) indices
    into the answer list."""
    question_states = encode_question(params, video_embeds, question_ids,
                                      question_mask, med_cfg, dtype=dtype)
    num_ques = question_states.shape[0]

    start_ids = jnp.full((num_ques, 1), answer_ids[0, 0], jnp.int32)  # bos
    hidden = M.med_forward(
        params["text_decoder"], start_ids, jnp.ones((num_ques, 1), jnp.int32),
        encoder_hidden_states=question_states, encoder_attention_mask=question_mask,
        cfg=med_cfg, mode="multimodal", is_decoder=True, dtype=dtype,
    )
    logits = M.med_lm_logits(params["text_decoder"], hidden[:, 0, :], med_cfg, dtype=dtype)
    logits = logits.astype(jnp.float32)

    answer_first_token = answer_ids[:, 1]
    prob_first = jax.nn.softmax(logits, axis=1)[:, answer_first_token]  # (B, n_answers)
    topk_probs, topk_ids = jax.lax.top_k(prob_first, k)  # (B, k)

    input_ids = answer_ids[topk_ids.reshape(-1)]  # (B*k, L)
    input_atts = answer_mask[topk_ids.reshape(-1)]
    targets = jnp.where(input_ids == tokenizer.pad_token_id, -100, input_ids)

    # the k candidate answers of one question share its encoded states via
    # grouped cross-attention (no k-fold repeat of the question memory)
    hidden = M.med_forward(
        params["text_decoder"], input_ids, input_atts,
        encoder_hidden_states=question_states, encoder_attention_mask=question_mask,
        cfg=med_cfg, mode="multimodal", is_decoder=True, dtype=dtype, group_size=k,
    )
    logits = M.med_lm_logits(params["text_decoder"], hidden, med_cfg, dtype=dtype)
    loss = M.med_lm_loss(logits, targets, label_smoothing=med_cfg.label_smoothing,
                         reduction="none")
    log_probs_sum = (-loss).reshape(num_ques, k)
    max_topk = jnp.argmax(log_probs_sum, axis=1)
    return jnp.take_along_axis(topk_ids, max_topk[:, None], axis=1)[:, 0]
