"""Device-side ITM text construction for the CapFilt fused filter path.

The classic filter path (reference run_video_CapFilt.py:93-126 →
models/blip_itm.py:41-67) serializes on the host in the middle of every
chunk: caption token ids are read back, detokenized, deduplicated,
re-tokenized with the BERT tokenizer, and only then dispatched to the
ITM — so the ITM programs cannot be enqueued until a host round trip
completes, and the glue between caption readback and ITM dispatch is
un-hideable by any dispatch schedule (measured: ARCHITECTURE.md CapFilt
split).

For generated captions, `tokenizer(tokenizer.decode(seq))` is the
identity on the token level whenever WordPiece re-tokenization of the
decoded string reproduces the generated pieces (true for natural text;
"retok-stable"). This module builds the ITM input ids for that case
directly from the generated sequences ON DEVICE:

    [CLS] c_1 ... c_n [SEP] pad...   mask = 1 over [CLS..SEP]

which lets the engine enqueue encode → decode → ITM as one uninterrupted
device chain and read everything back once per chunk. A numpy mirror of
the transform lets the host VERIFY, after the fact, that re-tokenizing
the decoded caption would have produced exactly the ids the device
scored; rows that differ (unusual merges, mid-sequence special tokens)
are re-scored through the classic path, so results are always exactly
those of the classic path.
"""

from __future__ import annotations

import numpy as np


def itm_ids_from_seqs_np(seqs: np.ndarray, prompt_len: int, cls_id: int,
                         sep_id: int, pad_id: int, text_len: int):
    """Numpy mirror of `itm_ids_from_seqs` (used for host verification).

    seqs: (N, Lgen) generated rows = [prompt ids..., caption tokens...,
    [SEP] (when it fit), pad...] (ops/generation.py output contract).
    Returns (ids, mask): (N, text_len) int32 each.
    """
    Lcap = min(seqs.shape[1] - prompt_len, text_len - 2)
    cap = seqs[:, prompt_len:prompt_len + Lcap]
    # caption length: tokens strictly before the first [SEP] or pad
    invalid = (cap == sep_id) | (cap == pad_id)
    n = np.where(invalid.any(axis=1), invalid.argmax(axis=1), Lcap)  # (N,)
    N = seqs.shape[0]
    pos = np.arange(text_len)[None, :]
    ids = np.full((N, text_len), pad_id, np.int32)
    ids[:, 1:1 + Lcap] = cap
    ids[:, 0] = cls_id
    ids = np.where(pos <= n[:, None], ids, pad_id)
    ids = np.where(pos == (n + 1)[:, None], sep_id, ids)
    mask = (pos <= (n + 1)[:, None]).astype(np.int32)
    return ids.astype(np.int32), mask


def itm_ids_from_seqs(seqs, prompt_len: int, cls_id: int, sep_id: int,
                      pad_id: int, text_len: int):
    """Build ITM text ids + attention mask from generated sequences, on
    device (jit-traceable; prompt_len/text_len static).

    Token-level equivalent of the classic
    `tokenizer(decode(seq), padding='max_length', max_length=text_len)`
    for retok-stable rows: strip the prompt, cut at the first [SEP] or
    pad, re-head with [CLS], close with [SEP], pad with the pad id.
    """
    import jax.numpy as jnp

    Lcap = min(seqs.shape[1] - prompt_len, text_len - 2)
    cap = seqs[:, prompt_len:prompt_len + Lcap]
    invalid = (cap == sep_id) | (cap == pad_id)
    n = jnp.where(invalid.any(axis=1), invalid.argmax(axis=1), Lcap)  # (N,)
    pos = jnp.arange(text_len)[None, :]
    shifted = jnp.pad(cap, ((0, 0), (1, text_len - 1 - Lcap)),
                      constant_values=pad_id)
    ids = jnp.where(pos == 0, cls_id, shifted)
    ids = jnp.where(pos <= n[:, None], ids, pad_id)
    ids = jnp.where(pos == (n + 1)[:, None], sep_id, ids)
    mask = (pos <= (n + 1)[:, None]).astype(jnp.int32)
    return ids.astype(jnp.int32), mask


def fused_applicable(config: dict) -> bool:
    """The fused path covers configs where every filtered text is a
    generated caption: filter on, captioning on, and either
    filter_generated_only=True or no original captions mixed in
    (keep_original_caption=False). The remaining combination
    (filter_generated_only=False AND keep_original_caption=True) filters
    original-caption sentences that only exist on the host, so it keeps
    the classic path."""
    return (
        config.get("filter", True)
        and config.get("caption", True)
        and (config.get("filter_generated_only", False)
             or not config.get("keep_original_caption", False))
    )
