"""Legacy (transformers v4.15) beam-search dialect: token-exact oracle test.

The reference pins transformers 4.15 (reference docker/requirements.txt);
its captions are produced by that version's beam bookkeeping
(reference models/blip.py:142-161 -> v4.15 generation_utils.beam_search +
BeamSearchScorer/BeamHypotheses). Byte-compatible caption JSON therefore
requires our `length_norm="legacy"` path to match that dialect exactly:

* hypothesis scores normalized by the FULL sequence length (prompt
  included, eos excluded): score = sum_logprobs / cur_len**length_penalty
  with cur_len measured BEFORE appending the chosen token;
* eos candidates ranked >= num_beams among the 2*num_beams tops are
  discarded, the rest enter the hypothesis store;
* done batches emit (pad, beam 0, score 0);
* the early_stopping=False "is_done" heuristic compares the worst stored
  hypothesis against best_sum_logprobs / cur_len**length_penalty;
* at max_length every running beam of a non-done batch is force-added
  (normalized by max_length**length_penalty);
* finalization appends eos AFTER the stored hypothesis when room remains.

This file transcribes those semantics into a pure-numpy oracle
(`hf415_beam_search`) and drives both it and ops.generation.beam_search
with identical deterministic logits (a bigram table model evaluated with
the same float32 expression on both sides), asserting token-identical
outputs across length penalties, min-length edge cases, and the
max-length force-add path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidil_tpu.ops.generation import GenerationConfig, beam_search

VOCAB = 23
EOS = 5
PAD = 0


# ---------------------------------------------------------------------------
# pure-numpy transcription of the v4.15 beam search bookkeeping
# ---------------------------------------------------------------------------

class _BeamHypotheses415:
    def __init__(self, num_beams: int, length_penalty: float):
        self.num_beams = num_beams
        self.length_penalty = length_penalty
        self.beams: list[tuple[float, np.ndarray]] = []
        self.worst_score = 1e9

    def __len__(self):
        return len(self.beams)

    def add(self, hyp: np.ndarray, sum_logprobs: float):
        score = sum_logprobs / (len(hyp) ** self.length_penalty)
        if len(self) < self.num_beams or score > self.worst_score:
            self.beams.append((score, hyp))
            if len(self) > self.num_beams:
                sorted_next = sorted((s, idx) for idx, (s, _) in enumerate(self.beams))
                del self.beams[sorted_next[0][1]]
                self.worst_score = sorted_next[1][0]
            else:
                self.worst_score = min(score, self.worst_score)

    def is_done(self, best_sum_logprobs: float, cur_len: int) -> bool:
        if len(self) < self.num_beams:
            return False
        # early_stopping=False heuristic (v4.15 BeamHypotheses.is_done)
        cur_score = best_sum_logprobs / cur_len ** self.length_penalty
        return self.worst_score >= cur_score


def _log_softmax_np(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    s = x - m
    return s - np.log(np.exp(s).sum(axis=-1, keepdims=True))


def hf415_beam_search(prompt: np.ndarray, logits_fn, gen: GenerationConfig) -> np.ndarray:
    """v4.15 generation_utils.beam_search + BeamSearchScorer transcription.

    logits_fn(seqs, pos) -> float32 (rows, VOCAB): logits for predicting
    position `pos` of each row of `seqs` (history = seqs[:, :pos]).
    """
    B, Lp = prompt.shape
    nb = gen.num_beams
    input_ids = np.repeat(prompt, nb, axis=0)  # (B*nb, Lp)
    beam_scores = np.zeros((B, nb), np.float32)
    beam_scores[:, 1:] = -1e9
    hyps = [_BeamHypotheses415(nb, gen.length_penalty) for _ in range(B)]
    done = [False] * B
    cur_len = Lp

    while cur_len < gen.max_length:
        logits = logits_fn(input_ids, cur_len).astype(np.float32)
        next_scores = _log_softmax_np(logits)
        if gen.repetition_penalty != 1.0:  # RepetitionPenaltyLogitsProcessor
            # v4.15: gather scores at every history token (prompt included),
            # multiply negatives / divide positives by the penalty, scatter
            pen = np.float32(gen.repetition_penalty)
            for row in range(next_scores.shape[0]):
                toks = np.unique(input_ids[row])
                s = next_scores[row, toks]
                next_scores[row, toks] = np.where(s < 0, s * pen, s / pen)
        if cur_len < gen.min_length:  # MinLengthLogitsProcessor
            next_scores[:, gen.eos_token_id] = -np.inf
        next_scores = next_scores + beam_scores.reshape(-1)[:, None]
        next_scores = next_scores.reshape(B, nb * VOCAB)
        # torch.topk: sorted descending
        top_idx = np.argsort(-next_scores, axis=1, kind="stable")[:, : 2 * nb]
        top_scores = np.take_along_axis(next_scores, top_idx, axis=1)
        top_tokens = top_idx % VOCAB
        top_beams = top_idx // VOCAB

        next_beam_scores = np.zeros((B, nb), np.float32)
        next_beam_tokens = np.full((B, nb), gen.pad_token_id, np.int64)
        next_beam_indices = np.zeros((B, nb), np.int64)
        for b in range(B):
            if done[b]:
                continue  # scores 0, tokens pad, indices 0 already
            beam_idx = 0
            for rank in range(2 * nb):
                tok, sc, bi = top_tokens[b, rank], top_scores[b, rank], top_beams[b, rank]
                bb = b * nb + bi
                if tok == gen.eos_token_id:
                    if rank >= nb:  # worse than top num_beams: dropped
                        continue
                    hyps[b].add(input_ids[bb].copy(), float(sc))
                else:
                    next_beam_scores[b, beam_idx] = sc
                    next_beam_tokens[b, beam_idx] = tok
                    next_beam_indices[b, beam_idx] = bb
                    beam_idx += 1
                if beam_idx == nb:
                    break
            done[b] = done[b] or hyps[b].is_done(float(top_scores[b].max()), cur_len)

        beam_scores = next_beam_scores
        input_ids = np.concatenate(
            [input_ids[next_beam_indices.reshape(-1)], next_beam_tokens.reshape(-1, 1)], axis=1)
        cur_len += 1
        if all(done):
            break

    # finalize (v4.15 BeamSearchScorer.finalize, num_beam_hyps_to_keep=1)
    for b in range(B):
        if done[b]:
            continue
        for i in range(nb):
            bb = b * nb + i
            hyps[b].add(input_ids[bb].copy(), float(beam_scores[b, i]))

    decoded = np.full((B, gen.max_length), gen.pad_token_id, np.int64)
    for b in range(B):
        best_score, best_hyp = sorted(hyps[b].beams, key=lambda x: x[0])[-1]
        ln = len(best_hyp)
        decoded[b, :ln] = best_hyp
        if ln < gen.max_length:
            decoded[b, ln] = gen.eos_token_id
    return decoded


# ---------------------------------------------------------------------------
# deterministic bigram-table "model", identical float32 math on both sides
# ---------------------------------------------------------------------------

def _tables(seed: int, max_len: int, eos_bias: float):
    rng = np.random.RandomState(seed)
    t1 = (rng.randn(VOCAB, VOCAB) * 1.5).astype(np.float32)
    t2 = (rng.randn(VOCAB, VOCAB) * 0.7).astype(np.float32)
    pos = (rng.randn(max_len + 1, VOCAB) * 0.5).astype(np.float32)
    t1[:, EOS] += np.float32(eos_bias)
    return t1, t2, pos


def _np_logits_fn(t1, t2, pos):
    def fn(seqs, p):
        return (t1[seqs[:, p - 1]] + t2[seqs[:, p - 2]]) + pos[p]

    return fn


def _jax_closures(t1, t2, pos, B_total, max_len):
    jt1, jt2, jpos = jnp.asarray(t1), jnp.asarray(t2), jnp.asarray(pos)
    init_cache = jnp.zeros((B_total, max_len), jnp.int32)

    def prefill_fn(ids, cache):
        cache = jax.lax.dynamic_update_slice(cache, ids, (0, 0))
        Lp = ids.shape[1]
        logits = (jt1[cache[:, Lp - 1]] + jt2[cache[:, Lp - 2]]) + jpos[Lp]
        return logits, cache

    def step_fn(tokens, idx, cache):
        cache = jax.vmap(lambda s, t: s.at[idx].set(t))(cache, tokens)
        prev = jax.vmap(lambda s: s[idx - 1])(cache)
        logits = (jt1[tokens] + jt2[prev]) + jpos[idx + 1]
        return logits, cache

    def reorder_fn(cache, flat_idx):
        return cache[flat_idx]

    return init_cache, prefill_fn, step_fn, reorder_fn


CASES = [
    # (seed, max_len, min_len, length_penalty, eos_bias, label)
    (0, 16, 5, 1.0, 2.0, "baseline"),
    (1, 16, 9, 1.0, 2.5, "eos-blocked-until-min-length"),
    (2, 12, 5, 1.0, -9.0, "max-length-force-add"),
    (3, 16, 5, 2.0, 2.0, "length-penalty-2"),
    (4, 16, 5, 0.5, 2.0, "length-penalty-0.5"),
    (5, 20, 5, 1.0, 1.0, "rarer-eos-longer"),
]


@pytest.mark.parametrize("seed,max_len,min_len,lp,eos_bias,label", CASES)
def test_legacy_beam_matches_hf415_oracle(seed, max_len, min_len, lp, eos_bias, label):
    t1, t2, pos = _tables(seed, max_len, eos_bias)
    rng = np.random.RandomState(100 + seed)
    B, Lp, nb = 4, 3, 3
    prompt = rng.randint(6, VOCAB, size=(B, Lp)).astype(np.int32)

    gen = GenerationConfig(max_length=max_len, min_length=min_len, num_beams=nb,
                           eos_token_id=EOS, pad_token_id=PAD,
                           length_penalty=lp, length_norm="legacy")

    ref = hf415_beam_search(prompt.astype(np.int64), _np_logits_fn(t1, t2, pos), gen)

    cache, prefill_fn, step_fn, reorder_fn = _jax_closures(t1, t2, pos, B * nb, max_len)
    got, _ = beam_search(jnp.asarray(prompt), cache, prefill_fn, step_fn, reorder_fn, gen)
    np.testing.assert_array_equal(np.asarray(got), ref, err_msg=label)


def test_oracle_exercises_both_paths():
    """Sanity: the case set truly covers early-eos AND force-add endings."""
    gen = lambda ml, eb: GenerationConfig(max_length=ml, min_length=5, num_beams=3,
                                          eos_token_id=EOS, pad_token_id=PAD,
                                          length_norm="legacy")
    t1, t2, pos = _tables(0, 16, 2.0)
    prompt = np.random.RandomState(100).randint(6, VOCAB, size=(4, 3)).astype(np.int64)
    early = hf415_beam_search(prompt, _np_logits_fn(t1, t2, pos), gen(16, 2.0))
    assert (early == EOS).any() and (early == PAD).any()  # eos endings exist

    t1, t2, pos = _tables(2, 12, -9.0)
    prompt = np.random.RandomState(102).randint(6, VOCAB, size=(4, 3)).astype(np.int64)
    forced = hf415_beam_search(prompt, _np_logits_fn(t1, t2, pos), gen(12, -9.0))
    # eos never competitive: every row force-added at max_length, no room
    # for the appended eos -> full-length non-eos rows
    assert (forced[:, -1] != PAD).all() and not (forced == EOS).any()


@pytest.mark.slow
def test_fuzz_legacy_beam_vs_hf415_oracle():
    """60-config fuzz (VERDICT r3 #2): random beam counts, prompt/batch
    sizes, min/max lengths, length penalties, repetition penalties and eos
    competitiveness — every config token-identical to the v4.15
    transcription. Failing configs print their full parameterization."""
    master = np.random.RandomState(2024)
    n_cases = 60
    for case in range(n_cases):
        seed = int(master.randint(0, 10_000))
        rng = np.random.RandomState(seed)
        nb = int(rng.choice([2, 3, 4]))
        B = int(rng.choice([1, 2, 4]))
        Lp = int(rng.choice([2, 3, 5]))
        max_len = int(rng.choice([8, 12, 16, 24]))
        if max_len <= Lp + 1:
            max_len = Lp + 4
        min_len = int(rng.choice([0, Lp + 1, max_len - 2]))
        lp = float(rng.choice([0.5, 1.0, 1.5, 2.0]))
        rp = float(rng.choice([1.0, 1.0, 1.1, 1.3]))
        eos_bias = float(rng.choice([-9.0, 0.0, 1.0, 2.5, 4.0]))
        label = (f"case={case} seed={seed} nb={nb} B={B} Lp={Lp} "
                 f"max={max_len} min={min_len} lp={lp} rp={rp} eos={eos_bias}")

        t1, t2, pos = _tables(seed, max_len, eos_bias)
        prompt = rng.randint(6, VOCAB, size=(B, Lp)).astype(np.int32)
        gen = GenerationConfig(max_length=max_len, min_length=min_len,
                               num_beams=nb, eos_token_id=EOS, pad_token_id=PAD,
                               length_penalty=lp, repetition_penalty=rp,
                               length_norm="legacy")
        ref = hf415_beam_search(prompt.astype(np.int64),
                                _np_logits_fn(t1, t2, pos), gen)
        cache, prefill_fn, step_fn, reorder_fn = _jax_closures(
            t1, t2, pos, B * nb, max_len)
        got, _ = beam_search(jnp.asarray(prompt), cache, prefill_fn,
                             step_fn, reorder_fn, gen)
        np.testing.assert_array_equal(np.asarray(got), ref, err_msg=label)


@pytest.mark.slow
def test_fuzz_eos_near_ties():
    """eos logit EXACTLY equal to a competitor's: identical fp32 inputs give
    identical log-probs on both sides, so the outcome isolates the rank /
    tie-break bookkeeping (v4.15 drops eos candidates ranked >= num_beams;
    ties between eos and non-eos at the same score resolve by top-k index
    order). 20 crafted-tie configs, token-identical required."""
    for case in range(20):
        seed = 5000 + case
        rng = np.random.RandomState(seed)
        nb, B, Lp, max_len = 3, 2, 3, 14
        t1, t2, pos = _tables(seed, max_len, 0.0)
        # craft exact ties: eos column == column (EOS+1) everywhere
        t1[:, EOS] = t1[:, EOS + 1]
        t2[:, EOS] = t2[:, EOS + 1]
        pos[:, EOS] = pos[:, EOS + 1]
        prompt = rng.randint(6, VOCAB, size=(B, Lp)).astype(np.int32)
        gen = GenerationConfig(max_length=max_len, min_length=5, num_beams=nb,
                               eos_token_id=EOS, pad_token_id=PAD,
                               length_norm="legacy")
        ref = hf415_beam_search(prompt.astype(np.int64),
                                _np_logits_fn(t1, t2, pos), gen)
        cache, prefill_fn, step_fn, reorder_fn = _jax_closures(
            t1, t2, pos, B * nb, max_len)
        got, _ = beam_search(jnp.asarray(prompt), cache, prefill_fn,
                             step_fn, reorder_fn, gen)
        np.testing.assert_array_equal(np.asarray(got), ref,
                                      err_msg=f"tie case {case}")


# ---------------------------------------------------------------------------
# real-model oracle + pinned goldens (VERDICT r3 #2)
# ---------------------------------------------------------------------------

_CFG_CROSS = None


def _cross_cfg():
    global _CFG_CROSS
    if _CFG_CROSS is None:
        from vidil_tpu.config import MedConfig

        _CFG_CROSS = MedConfig(vocab_size=61, hidden_size=32, num_layers=2,
                               num_heads=4, intermediate_size=64,
                               max_position_embeddings=64, encoder_width=32)
    return _CFG_CROSS


@pytest.mark.slow
@pytest.mark.parametrize("seed", [21, 22])
def test_legacy_beam_real_model_matches_oracle(seed):
    """blip_generate_ids (the production captioning path: jitted cache
    decode + legacy beam bookkeeping) vs hf415_beam_search driven by FULL
    eager forwards of the same MED decoder — the oracle shares no cache or
    beam code with the engine. Token-identical."""
    from vidil_tpu.models import med as M
    from vidil_tpu.models.blip import blip_generate_ids

    cfg = _cross_cfg()
    params = M.init_med(jax.random.PRNGKey(seed), cfg, with_lm_head=True)
    rng = np.random.RandomState(seed)
    B, Lp, nb, max_len = 2, 3, 3, 14
    prompt = rng.randint(6, cfg.vocab_size, size=(B, Lp)).astype(np.int32)
    enc = jax.random.normal(jax.random.PRNGKey(seed + 100), (B, 5, cfg.encoder_width))
    gen = GenerationConfig(max_length=max_len, min_length=5, num_beams=nb,
                           eos_token_id=EOS, pad_token_id=PAD, length_norm="legacy")

    enc_rep = jnp.repeat(enc, nb, axis=0)
    enc_mask = jnp.ones((B * nb, enc.shape[1]), jnp.int32)

    def full_forward_logits(seqs, pos):
        ids = jnp.asarray(seqs[:, :pos].astype(np.int32))
        hidden = M.med_forward(params, ids, jnp.ones_like(ids), enc_rep, enc_mask,
                               cfg=cfg, mode="multimodal", is_decoder=True)
        return np.asarray(M.med_lm_logits(params, hidden[:, -1], cfg), np.float32)

    # oracle VOCAB differs from module constant: monkey-free local run
    global VOCAB
    vocab_save = VOCAB
    VOCAB = cfg.vocab_size
    try:
        ref = hf415_beam_search(prompt.astype(np.int64), full_forward_logits, gen)
    finally:
        VOCAB = vocab_save

    got = blip_generate_ids({"text_decoder": params}, enc,
                            jnp.asarray(prompt), cfg, gen)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_legacy_beam_goldens():
    """Pinned decoded ids from fixed seeds (generated by this repo at the
    point the real-model oracle test above passed): regression tripwire for
    any future change to the legacy dialect, cache layout or MED numerics.
    Seed 21 ends via the hypothesis store near max_length; seed 22 ends via
    early eos (visible EOS=5 + pad tail)."""
    from vidil_tpu.models import med as M
    from vidil_tpu.models.blip import blip_generate_ids

    cfg = _cross_cfg()
    golden = {
        21: [[15, 21, 10, 56, 50, 9, 58, 26, 56, 50, 30, 16, 39, 0],
             [54, 54, 41, 56, 50, 9, 58, 26, 56, 50, 30, 16, 39, 0]],
        22: [[59, 10, 50, 10, 41, 39, 14, 5, 0, 0, 0, 0, 0, 0],
             [6, 42, 44, 23, 7, 39, 14, 5, 0, 0, 0, 0, 0, 0]],
    }
    for seed, want in golden.items():
        params = M.init_med(jax.random.PRNGKey(seed), cfg, with_lm_head=True)
        rng = np.random.RandomState(seed)
        prompt = jnp.asarray(rng.randint(6, cfg.vocab_size, size=(2, 3)), jnp.int32)
        enc = jax.random.normal(jax.random.PRNGKey(seed + 100), (2, 5, cfg.encoder_width))
        gen = GenerationConfig(max_length=14, min_length=5, num_beams=3,
                               eos_token_id=EOS, pad_token_id=PAD,
                               length_norm="legacy")
        ids = blip_generate_ids({"text_decoder": params}, enc, prompt, cfg, gen)
        assert np.asarray(ids).tolist() == want, f"seed {seed}"
