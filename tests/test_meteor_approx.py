"""METEOR approximation vs an independent nltk oracle.

``meteor_approx`` implements exact+stem METEOR (the WordNet synonym stage
is unavailable offline). nltk's ``meteor_score`` with a wordnet stub whose
``synsets`` always returns [] runs the *same* exact→stem→(empty synonym)
staging with code the builder did not write, so it pins our greedy
alignment, F-mean, and fragmentation-penalty arithmetic independently —
the cross-check discipline VERDICT r2 asked for on self-derived scorers.
Reference metric set: /root/reference/data/utils.py:205-216.
"""

import pytest

nltk_meteor = pytest.importorskip("nltk.translate.meteor_score")

from vidil_tpu.evals.caption_metrics import (  # noqa: E402
    _meteor_sentence,
    compute_caption_scores,
    meteor_approx,
)


class _StubWordnet:
    """WordNet stand-in: no synsets, so nltk's synonym stage is a no-op."""

    def synsets(self, word):
        return []


def _oracle(hyp, refs):
    return nltk_meteor.meteor_score(refs, hyp, wordnet=_StubWordnet())


CASES = [
    # identical
    (["the", "cat", "sat", "on", "the", "mat"],
     [["the", "cat", "sat", "on", "the", "mat"]]),
    # partial overlap with unmatched words on both sides
    (["a", "cat", "sitting", "on", "a", "mat"],
     [["the", "cat", "sat", "on", "the", "mat"]]),
    # stem-only matches (running/run, dogs/dog)
    (["the", "dogs", "running", "fast"],
     [["a", "dog", "runs", "quickly"]]),
    # reordered words -> fragmentation penalty
    (["mat", "the", "on", "sat", "cat", "the"],
     [["the", "cat", "sat", "on", "the", "mat"]]),
    # duplicate words: each reference word consumed at most once
    (["the", "the", "the", "cat"],
     [["the", "cat"]]),
    # zero overlap
    (["completely", "different", "words"],
     [["nothing", "matches", "here"]]),
    # hypothesis longer than reference
    (["a", "man", "is", "playing", "a", "guitar", "on", "the", "stage"],
     [["man", "plays", "guitar"]]),
    # multi-reference: best reference wins
    (["the", "dog", "ran", "fast"],
     [["dogs", "ran", "quickly"], ["a", "dog", "runs"], ["unrelated"]]),
]


@pytest.mark.parametrize("hyp,refs", CASES)
def test_meteor_sentence_matches_nltk(hyp, refs):
    ours = max(_meteor_sentence(hyp, r) for r in refs)
    assert ours == pytest.approx(_oracle(hyp, refs), abs=1e-12)


def test_corpus_is_mean_of_segments():
    gts = {"a": CASES[1][1], "b": CASES[2][1]}
    res = {"a": [CASES[1][0]], "b": [CASES[2][0]]}
    expected = (_oracle(CASES[1][0], CASES[1][1])
                + _oracle(CASES[2][0], CASES[2][1])) / 2
    assert meteor_approx(gts, res) == pytest.approx(expected, abs=1e-12)


def test_compute_caption_scores_reports_approx_key():
    gts = {"v0": ["a cat sat on the mat", "the cat is on a mat"],
           "v1": ["a man plays guitar"]}
    res = {"v0": ["the cat sat on the mat"], "v1": ["a man playing a guitar"]}
    out = compute_caption_scores(gts, res)
    if out.get("METEOR") is None:  # pure-Python fallback path (this env)
        assert 0.0 < out["METEOR_approx"] <= 1.0
    else:  # pragma: no cover - pycocoevalcap path reports exact METEOR
        assert "METEOR_approx" not in out


def test_fuzz_against_nltk_oracle():
    # small vocab with stem-equivalent pairs forces duplicate-word and
    # stem-stage alignment choices where greedy disciplines diverge
    import random

    vocab = ["cat", "cats", "run", "running", "the", "a", "mat",
             "dog", "dogs", "play", "played", "on"]
    rng = random.Random(1234)
    for _ in range(200):
        hyp = [rng.choice(vocab) for _ in range(rng.randint(1, 12))]
        ref = [rng.choice(vocab) for _ in range(rng.randint(1, 12))]
        assert _meteor_sentence(hyp, ref) == pytest.approx(
            _oracle(hyp, [ref]), abs=1e-12), (hyp, ref)


def test_empty_and_degenerate_inputs():
    assert _meteor_sentence([], ["a"]) == 0.0
    assert _meteor_sentence(["a"], []) == 0.0
    # single perfect match: fmean=1, one chunk, penalty=gamma*1 -> 0.5
    assert _meteor_sentence(["hello"], ["hello"]) == pytest.approx(0.5)


def test_corpus_tolerates_degenerate_entries():
    """A key with an empty reference list, or a res key absent from gts,
    must not crash the corpus scorer (bleu/rouge tolerate both; advisor
    finding r3: a single degenerate entry crashed the whole caption eval
    after generation had completed)."""
    from vidil_tpu.evals.caption_metrics import meteor_approx

    gts = {"a": [["dog", "runs"]], "b": []}
    res = {"a": [["dog", "runs"]], "b": [["cat"]], "c": [["bird"]]}
    score = meteor_approx(gts, res)  # 'b' scores 0.0; 'c' skipped
    assert score == pytest.approx(
        meteor_approx({"a": gts["a"]}, {"a": res["a"]}) / 2)
