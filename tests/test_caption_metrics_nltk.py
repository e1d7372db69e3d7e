"""Independent BLEU cross-check: pure-Python scorer vs nltk.

The golden-constant tests (test_caption_metrics_golden.py) share an
author with the implementation, so a shared misreading of the BLEU
definition could pass both. nltk's ``corpus_bleu`` is an independent
implementation of the same corpus BLEU the reference's pycocoevalcap
computes (clipped modified n-gram precision, 'closest' effective
reference length, exp brevity penalty; reference: data/utils.py:205-216).
With no smoothing and all n-gram precisions nonzero, pycocoevalcap's
tiny/small epsilons are ~1e-9-level noise, so the two must agree tightly.
"""

import random

import pytest

nltk = pytest.importorskip("nltk")
from nltk.translate.bleu_score import corpus_bleu  # noqa: E402

from vidil_tpu.evals.caption_metrics import compute_caption_scores  # noqa: E402

WEIGHTS = {1: (1.0,), 2: (0.5, 0.5), 3: (1 / 3, 1 / 3, 1 / 3), 4: (0.25,) * 4}


def _nltk_bleu(gts: dict, res: dict, n: int) -> float:
    keys = sorted(gts)
    refs = [[r.split() for r in gts[k]] for k in keys]
    hyps = [res[k][0].split() for k in keys]
    return corpus_bleu(refs, hyps, weights=WEIGHTS[n])


def _check(gts, res, tol=1e-6):
    out = compute_caption_scores(gts, res)
    for n in range(1, 5):
        expected = _nltk_bleu(gts, res, n)
        assert out[f"Bleu_{n}"] == pytest.approx(expected, abs=tol), (
            f"Bleu_{n}: ours {out[f'Bleu_{n}']} vs nltk {expected}"
        )


def test_bleu_matches_nltk_on_golden_fixtures():
    _check({"k1": ["the cat sat on the mat"], "k2": ["a b x y", "a q c z"]},
           {"k1": ["the cat sat on the mat"], "k2": ["a b c d"]})


def test_bleu_matches_nltk_brevity_penalty():
    # hyp half the ref length with all precisions 1: score == exp(-1).
    # NOTE: every hyp must have >= 4 tokens — nltk clamps an empty
    # n-gram denominator to 1 (corpus_bleu's max(1, denominator)) where
    # pycocoevalcap adds 0, so shorter hyps diverge by design.
    _check({"k": ["a b c d e f g h"]}, {"k": ["a b c d"]})


def test_bleu_matches_nltk_closest_ref_length():
    # hyp len 5; refs of len 4 and 6 are equidistant -- 'closest' must
    # tie-break the same way in both implementations (shorter wins in
    # both pycocoevalcap and nltk, giving brevity penalty 1 here; a
    # longer-wins tie-break would drag the corpus score below 1)
    _check({"k": ["a b c d", "a b c d e f"], "k0": ["p q r s t u"]},
           {"k": ["a b c d e"], "k0": ["p q r s t u"]})


def test_bleu_matches_nltk_randomized_corpora():
    vocab = ["cat", "dog", "man", "runs", "plays", "park", "ball", "red",
             "the", "a", "on", "in", "big", "sits"]
    rng = random.Random(7)
    for trial in range(20):
        gts, res = {}, {}
        # one identity pair guarantees every corpus n-gram precision > 0,
        # keeping the unsmoothed comparison exact
        gts["id"] = ["the big dog runs in the park"]
        res["id"] = ["the big dog runs in the park"]
        for i in range(rng.randint(2, 6)):
            n_refs = rng.randint(1, 3)
            gts[f"k{i}"] = [" ".join(rng.choices(vocab, k=rng.randint(4, 9)))
                            for _ in range(n_refs)]
            res[f"k{i}"] = [" ".join(rng.choices(vocab, k=rng.randint(4, 9)))]
        _check(gts, res)


def test_caption_eval_surfaces_missing_meteor(tmp_path, capsys):
    """Offline (no pycocoevalcap): the eval CLI path must warn loudly and
    write an explicit null for METEOR (reference reports it,
    data/utils.py:205-216)."""
    import json

    from vidil_tpu.evals.caption import video_caption_eval

    gt = [{"clip_name": "v1", "caption": "a man sings"}]
    res = [{"video_id": "v1", "caption": "a man sings"}]
    out = tmp_path / "metric.json"
    scores = video_caption_eval(gt, res, output_path=str(out))
    captured = capsys.readouterr().out
    if scores["METEOR"] is None:  # offline environment (this one)
        assert "METEOR unavailable" in captured
        assert json.load(open(out))["METEOR"] is None
    else:  # pycocoevalcap present: METEOR must be a real score
        assert isinstance(scores["METEOR"], float)


@pytest.mark.skipif(
    __import__("importlib").util.find_spec("pycocoevalcap") is None,
    reason="pycocoevalcap not installed (offline env); in environments with "
           "Java this verifies the pure-Python scorers against the real thing")
def test_pure_python_matches_pycocoevalcap():
    from vidil_tpu.evals.caption_metrics import bleu, cider, ptb_tokenize, rouge_l
    from pycocoevalcap.bleu.bleu import Bleu
    from pycocoevalcap.cider.cider import Cider
    from pycocoevalcap.rouge.rouge import Rouge

    gts_raw = {"k1": ["the cat sat on the mat"], "k2": ["a b x y", "a q c z"],
               "k3": ["a man plays a red guitar on the beach"]}
    res_raw = {"k1": ["the cat sat on the mat"], "k2": ["a b c d"],
               "k3": ["a man plays a guitar on the sand"]}
    gts = {k: [ptb_tokenize(c) for c in v] for k, v in gts_raw.items()}
    res = {k: [ptb_tokenize(c) for c in v] for k, v in res_raw.items()}
    ref_bleu, _ = Bleu(4).compute_score(gts, res)
    for ours, theirs in zip(bleu(gts, res), ref_bleu):
        assert ours == pytest.approx(theirs, abs=1e-9)
    assert rouge_l(gts, res) == pytest.approx(Rouge().compute_score(gts, res)[0], abs=1e-9)
    assert cider(gts, res) == pytest.approx(Cider().compute_score(gts, res)[0], abs=1e-9)
