"""On-device batched generation: beam search + nucleus sampling.

Replaces HF ``model.generate`` (used by the reference at
models/blip.py:142-161 via transformers' beam search) with fully jitted,
fixed-shape JAX loops:

* one ``lax.scan`` over decode steps — no host round-trips per token;
* the whole batch of videos/frames decodes in one compiled program
  (the reference decodes one video at a time);
* beam bookkeeping (hypothesis store, early-stop heuristic, length
  normalization) is vectorized over the batch.

Two beam-search dialects are supported via ``GenerationConfig.length_norm``:

* ``"legacy"`` — transformers v4.15 semantics (the version the reference
  pins): finished hypotheses are normalized by the FULL sequence length
  (prompt included, eos excluded), running beams are force-added at
  max_length, and eos is appended at finalization. This is the dialect
  that reproduces the reference's captions byte-for-byte.
* ``"modern"`` — transformers >= 4.50 vectorized beam search: normalized
  by generated length (eos included), max-length hits fold the running
  beams into the store on the last step. Token-identically verified
  against the installed transformers in tests/test_generation.py.

The model is abstracted behind three closures so the same engine drives
the BLIP caption decoder and the VQA answer decoder:

  prefill_fn(ids, cache)            -> (last_logits, cache)   # prompt pass
  step_fn(tokens, step_idx, cache)  -> (logits, cache)        # one token
  reorder_fn(cache, flat_beam_idx)  -> cache                  # beam gather
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e9)
HYP_INVALID = jnp.float32(-1e30)


@dataclass(frozen=True)
class GenerationConfig:
    max_length: int = 30
    min_length: int = 10
    num_beams: int = 3
    eos_token_id: int = 102  # BERT [SEP] (reference: blip.py:148,158)
    pad_token_id: int = 0
    repetition_penalty: float = 1.0
    length_penalty: float = 1.0
    top_p: float = 0.9
    length_norm: str = "legacy"  # "legacy" (reference parity) | "modern"
    # early_exit=False forces the decode loop to run all max_length steps
    # even when every batch is blocked/finished. Outputs are bit-identical
    # either way (post-blocked steps are no-ops); disabling it makes the
    # step count — and thus benchmark timings — input-independent.
    early_exit: bool = True


def _apply_repetition_penalty(scores, seqs, cur_len, penalty: float):
    """HF RepetitionPenaltyLogitsProcessor on the tokens in seqs[:, :cur_len]."""
    if penalty == 1.0:
        return scores
    B, V = scores.shape
    L = seqs.shape[1]
    pos_valid = (jnp.arange(L) < cur_len)[None, :]
    one_hot = jax.nn.one_hot(seqs, V, dtype=jnp.float32)
    presence = jnp.max(one_hot * pos_valid[..., None], axis=1) > 0  # (B, V)
    penalized = jnp.where(scores < 0, scores * penalty, scores / penalty)
    return jnp.where(presence, penalized, scores)


def _apply_min_length(scores, cur_len, min_length: int, eos_token_id: int):
    """HF MinLengthLogitsProcessor: eos impossible while len < min_length."""
    eos_col = jnp.zeros((scores.shape[-1],), bool).at[eos_token_id].set(True)
    return jnp.where((cur_len < min_length) & eos_col[None, :], -jnp.inf, scores)


# ---------------------------------------------------------------------------
# beam search
# ---------------------------------------------------------------------------

def beam_search(
    prompt_ids,
    init_cache,
    prefill_fn,
    step_fn,
    reorder_fn,
    gen: GenerationConfig,
):
    """Batched beam search.

    Args:
      prompt_ids: (B, Lp) int32 — same (unpadded) prompt length per row.
      init_cache: cache pytree sized for batch B*num_beams and gen.max_length.
    Returns:
      sequences: (B, max_length) int32, padded with pad_token_id.
      scores: (B,) float32 — length-normalized best-hypothesis scores.
    """
    B, Lp = prompt_ids.shape
    nb = gen.num_beams
    lp = gen.length_penalty
    modern = gen.length_norm == "modern"
    assert gen.max_length > Lp, "max_length must exceed prompt length"

    flat_prompt = jnp.repeat(prompt_ids, nb, axis=0)  # (B*nb, Lp)
    last_logits, cache = prefill_fn(flat_prompt, init_cache)
    V = last_logits.shape[-1]

    seqs = jnp.full((B * nb, gen.max_length), gen.pad_token_id, jnp.int32)
    seqs = jax.lax.dynamic_update_slice(seqs, flat_prompt, (0, 0))

    beam_scores = jnp.full((B, nb), NEG_INF).at[:, 0].set(0.0)

    hyp_scores = jnp.full((B, nb), HYP_INVALID)
    hyp_seqs = jnp.full((B, nb, gen.max_length), gen.pad_token_id, jnp.int32)
    hyp_lens = jnp.zeros((B, nb), jnp.int32)
    # legacy: "done" is sticky per batch; modern: "unsat" (improvement still
    # possible) gates new additions. They are logical complements in spirit.
    blocked = jnp.zeros((B,), bool)

    batch_offset = jnp.arange(B) * nb

    def process_batch(scores_row, top_scores, top_tokens, top_beams, cur_len,
                      hyp_s, hyp_q, hyp_l, blocked_b, beam_seqs_b):
        """Per-batch candidate processing (vmapped)."""
        rank = jnp.arange(2 * nb)
        is_eos = top_tokens == gen.eos_token_id
        at_max = cur_len + 1 >= gen.max_length
        hits = (is_eos | at_max) if modern else is_eos

        # --- candidate hypotheses (only ranks < num_beams are eligible) ---
        cand_valid = hits & (rank < nb) & jnp.logical_not(blocked_b)
        if modern:
            norm_len = (cur_len + 1 - Lp).astype(jnp.float32)
        else:
            norm_len = cur_len.astype(jnp.float32)
        cand_scores = jnp.where(cand_valid, top_scores / (norm_len**lp), HYP_INVALID)
        cand_seqs = beam_seqs_b[top_beams]  # (2nb, max_length)
        if modern:
            # modern stores the just-chosen token (incl. eos) in the sequence
            cand_seqs = jax.vmap(lambda s, t: s.at[cur_len].set(t))(cand_seqs, top_tokens)
            cand_lens = jnp.full((2 * nb,), cur_len + 1, jnp.int32)
        else:
            # legacy stores the sequence WITHOUT eos (appended at finalize)
            cand_lens = jnp.full((2 * nb,), cur_len, jnp.int32)

        merged_scores = jnp.concatenate([hyp_s, cand_scores])
        merged_seqs = jnp.concatenate([hyp_q, cand_seqs])
        merged_lens = jnp.concatenate([hyp_l, cand_lens])
        order = jnp.argsort(-merged_scores, stable=True)[:nb]
        hyp_s = merged_scores[order]
        hyp_q = merged_seqs[order]
        hyp_l = merged_lens[order]

        # --- next running beams ---
        if modern:
            # top num_beams by score with finished candidates pushed to -1e9;
            # blocked batches keep decoding (additions are gated instead)
            running = top_scores + hits.astype(jnp.float32) * NEG_INF
            sel = jax.lax.top_k(running, nb)[1]
            nxt_scores = running[sel]
            nxt_tokens = top_tokens[sel]
            nxt_beams = top_beams[sel]
        else:
            # first num_beams non-eos candidates in rank order (same order
            # as score order since top_scores is sorted descending); done
            # batches emit pad / beam 0 / score 0 (HF v4.15 behavior)
            key = jnp.where(is_eos, 2 * nb + rank, rank)
            sel = jnp.argsort(key)[:nb]
            nxt_scores = jnp.where(blocked_b, 0.0, top_scores[sel])
            nxt_tokens = jnp.where(blocked_b, gen.pad_token_id, top_tokens[sel])
            nxt_beams = jnp.where(blocked_b, 0, top_beams[sel])

        # --- stop heuristic (early_stopping=False dialects) ---
        count = jnp.sum(hyp_s > HYP_INVALID / 2)
        worst = jnp.min(jnp.where(hyp_s > HYP_INVALID / 2, hyp_s, jnp.inf))
        if modern:
            # evaluated at cur_len+1 with the TOP running beam
            best_possible = jnp.max(nxt_scores) / ((cur_len + 1 - Lp).astype(jnp.float32) ** lp)
        else:
            best_possible = jnp.max(scores_row) / (cur_len.astype(jnp.float32) ** lp)
        blocked_b = blocked_b | ((count == nb) & (worst >= best_possible))
        return nxt_scores, nxt_tokens, nxt_beams, hyp_s, hyp_q, hyp_l, blocked_b

    def step(carry, cur_len):
        seqs, beam_scores, last_logits, cache, hyp_scores, hyp_seqs, hyp_lens, blocked = carry

        logp = jax.nn.log_softmax(last_logits.astype(jnp.float32), axis=-1)
        logp = _apply_repetition_penalty(logp, seqs, cur_len, gen.repetition_penalty)
        logp = _apply_min_length(logp, cur_len, gen.min_length, gen.eos_token_id)
        scores = logp + beam_scores.reshape(-1)[:, None]  # (B*nb, V)
        scores = scores.reshape(B, nb * V)
        top_scores, top_idx = jax.lax.top_k(scores, 2 * nb)
        top_tokens = top_idx % V
        top_beams = top_idx // V

        beam_seqs = seqs.reshape(B, nb, gen.max_length)
        (nxt_scores, nxt_tokens, nxt_beams, hyp_scores, hyp_seqs, hyp_lens, blocked) = jax.vmap(
            process_batch, in_axes=(0, 0, 0, 0, None, 0, 0, 0, 0, 0)
        )(scores, top_scores, top_tokens, top_beams, cur_len, hyp_scores, hyp_seqs, hyp_lens, blocked, beam_seqs)

        flat_idx = (batch_offset[:, None] + nxt_beams).reshape(-1)
        seqs = seqs[flat_idx]
        flat_tokens = nxt_tokens.reshape(-1)
        seqs = jax.vmap(lambda s, t: s.at[cur_len].set(t))(seqs, flat_tokens)
        cache = reorder_fn(cache, flat_idx)
        beam_scores = nxt_scores

        last_logits, cache = step_fn(flat_tokens, cur_len, cache)
        return (seqs, beam_scores, last_logits, cache, hyp_scores, hyp_seqs, hyp_lens, blocked), None

    # while_loop instead of a fixed-length scan: exits as soon as every
    # batch is blocked (scan lowers to a while in XLA anyway, so the only
    # difference is the early exit — post-blocked steps are provably
    # no-ops, so results are bit-identical; saves ~max_length-len steps
    # on short captions)
    carry = (seqs, beam_scores, last_logits, cache, hyp_scores, hyp_seqs, hyp_lens, blocked)

    def loop_cond(state):
        cur_len, c = state
        not_done = jnp.logical_not(jnp.all(c[7])) if gen.early_exit else True
        return (cur_len < gen.max_length) & not_done

    def loop_body(state):
        cur_len, c = state
        c, _ = step(c, cur_len)
        return cur_len + 1, c

    _, carry = jax.lax.while_loop(loop_cond, loop_body,
                                  (jnp.asarray(Lp, jnp.int32), carry))
    seqs, beam_scores, _, _, hyp_scores, hyp_seqs, hyp_lens, blocked = carry

    def finalize_batch(blocked_b, beam_scores_b, beam_seqs_b, hyp_s, hyp_q, hyp_l):
        if not modern:
            # legacy: non-done batches force-add all running beams (length =
            # max_length) before picking the best hypothesis
            final_norm = beam_scores_b / (float(gen.max_length) ** lp)
            cand_scores = jnp.where(blocked_b, HYP_INVALID, final_norm)
            merged_scores = jnp.concatenate([hyp_s, cand_scores])
            merged_seqs = jnp.concatenate([hyp_q, beam_seqs_b])
            merged_lens = jnp.concatenate([hyp_l, jnp.full((nb,), gen.max_length, jnp.int32)])
            order = jnp.argsort(-merged_scores, stable=True)[:nb]
            hyp_s, hyp_q, hyp_l = merged_scores[order], merged_seqs[order], merged_lens[order]
        best = jnp.argmax(hyp_s)
        seq = hyp_q[best]
        ln = hyp_l[best]
        pos = jnp.arange(gen.max_length)
        if not modern:
            # legacy appends eos at position `len` when there is room
            seq = jnp.where((pos == ln) & (ln < gen.max_length), gen.eos_token_id, seq)
            seq = jnp.where(pos > ln, gen.pad_token_id, seq)
        else:
            seq = jnp.where(pos >= ln, gen.pad_token_id, seq)
        return seq, hyp_s[best]

    beam_seqs = seqs.reshape(B, nb, gen.max_length)
    out_seqs, out_scores = jax.vmap(finalize_batch)(blocked, beam_scores, beam_seqs, hyp_scores, hyp_seqs, hyp_lens)
    return out_seqs, out_scores


# ---------------------------------------------------------------------------
# nucleus (top-p) sampling
# ---------------------------------------------------------------------------

def _top_p_filter(logits, top_p: float):
    """HF TopPLogitsWarper: keep the smallest prefix of the descending-prob
    distribution with cumulative prob <= top_p (always >= 1 token)."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    # token i removed iff cumulative prob *before* it exceeds top_p
    remove_sorted = (cum - sorted_probs) > top_p
    threshold = jnp.min(jnp.where(remove_sorted, jnp.inf, sorted_logits), axis=-1, keepdims=True)
    return jnp.where(logits < threshold, -jnp.inf, logits)


def nucleus_sample(
    prompt_ids,
    init_cache,
    prefill_fn,
    step_fn,
    gen: GenerationConfig,
    rng_key,
):
    """Batched top-p sampling (HF `do_sample=True, top_p=...` semantics;
    reference: models/blip.py:140-151 uses top_p=0.9, repetition_penalty=1.1).

    Sampling uses jax PRNG (not bit-identical to torch.multinomial; the
    distribution is identical).
    """
    B, Lp = prompt_ids.shape
    T = gen.max_length - Lp
    last_logits, cache = prefill_fn(prompt_ids, init_cache)

    seqs = jnp.full((B, gen.max_length), gen.pad_token_id, jnp.int32)
    seqs = jax.lax.dynamic_update_slice(seqs, prompt_ids, (0, 0))
    finished = jnp.zeros((B,), bool)

    def step(carry, xs):
        cur_len, key = xs
        seqs, last_logits, cache, finished = carry
        logits = last_logits.astype(jnp.float32)
        logits = _apply_repetition_penalty(logits, seqs, cur_len, gen.repetition_penalty)
        logits = _apply_min_length(logits, cur_len, gen.min_length, gen.eos_token_id)
        logits = _top_p_filter(logits, gen.top_p)
        sampled = jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
        tokens = jnp.where(finished, gen.pad_token_id, sampled)
        seqs = jax.vmap(lambda s, t: s.at[cur_len].set(t))(seqs, tokens)
        finished = finished | (tokens == gen.eos_token_id)
        last_logits, cache = step_fn(tokens, cur_len, cache)
        return (seqs, last_logits, cache, finished), None

    # while_loop with an all-finished early exit (finished rows emit pad,
    # so extra steps are no-ops — bit-identical to running the full scan;
    # the per-step RNG key is indexed by position, preserving the stream)
    keys = jax.random.split(rng_key, T)
    carry = (seqs, last_logits, cache, finished)

    def loop_cond(state):
        cur_len, c = state
        not_done = jnp.logical_not(jnp.all(c[3])) if gen.early_exit else True
        return (cur_len < gen.max_length) & not_done

    def loop_body(state):
        cur_len, c = state
        c, _ = step(c, (cur_len, keys[cur_len - Lp]))
        return cur_len + 1, c

    _, carry = jax.lax.while_loop(loop_cond, loop_body,
                                  (jnp.asarray(Lp, jnp.int32), carry))
    return carry[0]
