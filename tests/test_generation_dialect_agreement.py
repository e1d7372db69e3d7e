"""Legacy-vs-modern beam dialect agreement properties.

The legacy (transformers v4.15, the reference's pin) dialect's oracle
test is the builder's own transcription of v4.15 semantics, so a
misreading of the SHARED beam machinery could hide in both the
implementation and its test. These properties pin the two dialects
against each other on inputs where they PROVABLY agree, so an error in
shared bookkeeping (top-2k selection, hypothesis store, reordering,
eos handling) cannot cancel out:

* length_penalty=0.0: both dialects' length normalizations become
  len**0 == 1, and cumulative log-probs strictly decrease with length,
  so both must select the same hypotheses — provided every beam
  finishes via eos well before max_length (the at-max force-add is the
  one structural difference that normalization can't neutralize).
* equal finish lengths at length_penalty=1.0: all stored hypotheses
  share one denominator per dialect, so the argmax is
  normalization-independent.

The model is a scripted Markov chain over logits (logits depend only on
the previous token + a step-indexed eos pressure), driven through the
same prefill/step/reorder closure interface the real decoders use.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidil_tpu.ops.generation import GenerationConfig, beam_search

V = 23
EOS = 2
PAD = 0


def make_markov_closures(seed: int, eos_pressure: float, eos_hard_step: int | None = None):
    """Logits = transition[last_token] + growing eos boost.

    eos_pressure > 0 guarantees every beam finishes via eos well before
    max_length; eos_hard_step forces ALL beams to emit eos at exactly
    that step (equal-length hypotheses).
    """
    rng = np.random.RandomState(seed)
    trans = jnp.asarray(rng.randn(V, V).astype(np.float32) * 2.0)
    # never propose eos/pad from the raw chain; only the scripted pressure does
    trans = trans.at[:, EOS].set(-8.0).at[:, PAD].set(-50.0)

    def eos_boost(idx):
        base = eos_pressure * idx.astype(jnp.float32)
        if eos_hard_step is not None:
            base = base + jnp.where(idx >= eos_hard_step, 200.0, 0.0)
        return base

    def prefill_fn(ids, cache):
        logits = trans[ids[:, -1]]
        return logits.at[:, EOS].add(eos_boost(jnp.int32(ids.shape[1] - 1))), cache

    def step_fn(tokens, idx, cache):
        logits = trans[tokens]
        return logits.at[:, EOS].add(eos_boost(idx)), cache

    def reorder_fn(cache, idx):
        return cache  # Markov model: no per-beam state

    return prefill_fn, step_fn, reorder_fn


def run_dialect(dialect: str, seed: int, length_penalty: float,
                eos_pressure: float = 1.5, eos_hard_step=None,
                max_length: int = 24, num_beams: int = 3, B: int = 4):
    gen = GenerationConfig(max_length=max_length, min_length=3,
                           num_beams=num_beams, eos_token_id=EOS,
                           pad_token_id=PAD, length_penalty=length_penalty,
                           length_norm=dialect)
    prefill_fn, step_fn, reorder_fn = make_markov_closures(
        seed, eos_pressure, eos_hard_step)
    prompt = jnp.asarray(
        np.random.RandomState(seed + 1000).randint(3, V, size=(B, 2)), jnp.int32)
    seqs, scores = beam_search(prompt, jnp.zeros(()), prefill_fn, step_fn,
                               reorder_fn, gen)
    return np.asarray(seqs), np.asarray(scores)


def _strip(row):
    """Tokens up to and including the first eos (pad tails may differ)."""
    row = list(row)
    return row[: row.index(EOS) + 1] if EOS in row else row


@pytest.mark.parametrize("seed", range(8))
def test_dialects_agree_with_zero_length_penalty(seed):
    legacy, _ = run_dialect("legacy", seed, length_penalty=0.0)
    modern, _ = run_dialect("modern", seed, length_penalty=0.0)
    for b in range(legacy.shape[0]):
        assert _strip(legacy[b]) == _strip(modern[b]), (
            f"batch {b}: legacy {legacy[b]} vs modern {modern[b]}"
        )


@pytest.mark.parametrize("seed", range(8))
def test_dialects_agree_on_equal_length_hypotheses(seed):
    # all beams forced to finish at one step -> one denominator per
    # dialect -> identical argmax at length_penalty=1.0
    legacy, _ = run_dialect("legacy", seed, length_penalty=1.0,
                            eos_pressure=0.0, eos_hard_step=9)
    modern, _ = run_dialect("modern", seed, length_penalty=1.0,
                            eos_pressure=0.0, eos_hard_step=9)
    for b in range(legacy.shape[0]):
        assert _strip(legacy[b]) == _strip(modern[b])


def test_sequences_terminate_via_eos_not_max_length():
    # precondition of the zero-penalty property: every sequence must end
    # in eos strictly before max_length (no at-max force-add involved)
    for dialect in ("legacy", "modern"):
        seqs, _ = run_dialect(dialect, 0, length_penalty=0.0)
        for row in seqs:
            assert EOS in list(row), f"{dialect}: no eos in {row}"
            assert list(row).index(EOS) < seqs.shape[1] - 1
