"""Joint frame×sentence ITM selection for single-frame pretraining.

Reference: pretrain_video.py:30-63 — sentence-split the caption, score
every (frame, sentence) pair with the ITM head, keep the argmax pair. The
reference loops one sentence at a time ("to avoid CUDA OOM"); here all
pairs score in one batched call.
"""

from __future__ import annotations

import re

import numpy as np

import jax
import jax.numpy as jnp

from vidil_tpu.config import MedConfig, ViTConfig
from vidil_tpu.models import blip as B
from vidil_tpu.pipeline.capfilt import split_sentences

_PUNCT_RE = re.compile(r"([*#/:;~])")


def sentence_tokenization(original_caption: str) -> list[str]:
    """reference: pretrain_video.py:30-44 (spaCy senter with rule-based
    fallback, see pipeline.capfilt.split_sentences)."""
    caption = original_caption.replace("\n", ". ")
    caption = _PUNCT_RE.sub(". ", caption.lower())
    sentences = [s.strip() for s in split_sentences(caption) if len(s.strip()) > 3]
    if not sentences:
        sentences = [original_caption.strip()]
    return sentences


def select_frame_and_sentence(filterer_params, frames, text: str, tokenizer,
                              vit_cfg: ViTConfig, med_cfg: MedConfig, dtype=None):
    """(N, S, S, C) frames + caption -> (best frame, best sentence).

    One batched ITM program over all (frame, sentence) pairs (reference
    loops per sentence: pretrain_video.py:52-57); reference flat-argmax
    semantics preserved (idx % num_frm / idx // num_frm, :60-62).
    """
    num_frm = frames.shape[0]
    sentences = sentence_tokenization(text)
    enc = tokenizer(sentences, padding="max_length", truncation=True, max_length=35)

    embeds = B.encode_images(filterer_params, jnp.asarray(frames), vit_cfg, dtype=dtype)
    n = len(sentences)
    # frame-major grouping: each frame's memory is shared by all n
    # sentences via grouped cross-attention (no N*n tile of the embeds)
    ids = jnp.tile(jnp.asarray(enc.input_ids), (num_frm, 1))
    mask = jnp.tile(jnp.asarray(enc.attention_mask), (num_frm, 1))
    logits = B.blip_itm_scores(filterer_params, embeds, ids, mask, med_cfg,
                               dtype=dtype, group_size=n)
    score_fm = np.asarray(jax.nn.softmax(logits, axis=1)[:, 1]).reshape(num_frm, n)
    # back to the reference's sentence-major flat ordering (:60-62)
    score = score_fm.T.ravel()
    idx = int(np.argmax(score))
    return frames[idx % num_frm], sentences[idx // num_frm]
