"""Golden absolute values for the pure-Python caption metrics.

pycocoevalcap (the reference's scorer, data/utils.py:175-221) is not
installable in this offline environment, so the expected constants below
are hand-derived from the canonical algorithm definitions the package
implements — corpus BLEU with clipped n-gram precision, 'closest'
effective reference length, and brevity penalty; ROUGE-L LCS F-measure
with beta=1.2; CIDEr-D tf-idf cosine with count clipping, gaussian length
penalty (sigma=6) and the 10x multiplier. Inputs are simple pre-tokenized
lowercase words so the (Java) PTBTokenizer is a no-op and the constants
depend only on the scoring math.

Every expectation is written as an explicit arithmetic expression of the
published formulas, independent of the implementation under test.
"""

import math

from vidil_tpu.evals.caption_metrics import compute_caption_scores


def test_bleu_identity_is_one():
    gts = {"k": ["the cat sat on the mat"]}
    res = {"k": ["the cat sat on the mat"]}
    out = compute_caption_scores(gts, res)
    for n in range(1, 5):
        assert abs(out[f"Bleu_{n}"] - 1.0) < 1e-6


def test_bleu_corpus_hand_values():
    # key1: perfect 6-token match; key2: hyp 'a b c d' vs two 4-token refs
    gts = {"k1": ["the cat sat on the mat"], "k2": ["a b x y", "a q c z"]}
    res = {"k1": ["the cat sat on the mat"], "k2": ["a b c d"]}
    out = compute_caption_scores(gts, res)
    # hyp lens 6+4=10, closest ref lens 6+4=10 -> brevity penalty 1
    # clipped precisions (k1 contributes perfect counts):
    p1 = (6 + 3) / (6 + 4)        # k2 unigrams a,b,c matched
    p2 = (5 + 1) / (5 + 3)        # k2: only 'a b'
    p3 = (4 + 0) / (4 + 2)
    p4 = (3 + 0) / (3 + 1)
    assert abs(out["Bleu_1"] - p1) < 1e-5
    assert abs(out["Bleu_2"] - math.sqrt(p1 * p2)) < 1e-5
    assert abs(out["Bleu_3"] - (p1 * p2 * p3) ** (1 / 3)) < 1e-3  # p3 zero-correct term uses tiny/small smoothing
    assert abs(out["Bleu_4"] - (p1 * p2 * p3 * p4) ** (1 / 4)) < 1e-3


def test_bleu_brevity_penalty():
    # hyp half the ref length: bp = exp(1 - ref/hyp) = e^-1, precisions 1
    gts = {"k": ["a b c d"]}
    res = {"k": ["a b"]}
    out = compute_caption_scores(gts, res)
    assert abs(out["Bleu_1"] - math.exp(-1.0)) < 1e-6
    assert abs(out["Bleu_2"] - math.exp(-1.0)) < 1e-6


def test_rouge_l_hand_values():
    # k1 identity -> 1.0; k2: LCS('a b c d','a b x y') = 2,
    # prec = rec = 0.5 -> F(beta=1.2) = 0.5; average = 0.75
    gts = {"k1": ["a b c d"], "k2": ["a b x y"]}
    res = {"k1": ["a b c d"], "k2": ["a b c d"]}
    out = compute_caption_scores(gts, res)
    assert abs(out["ROUGE_L"] - 0.75) < 1e-9


def test_cider_identity_two_docs():
    # two single-ref keys, hyp == ref: cosine 1 for n=1,2; no 3/4-grams in
    # 2-token captions -> per-key score 10*(1+1+0+0)/4 = 5.0
    gts = {"k1": ["a b"], "k2": ["c d"]}
    res = {"k1": ["a b"], "k2": ["c d"]}
    out = compute_caption_scores(gts, res)
    assert abs(out["CIDEr"] - 5.0) < 1e-9


def test_cider_partial_match_hand_value():
    # k2 identity -> 5.0. k1: hyp 'a x' vs ref 'a b' — every unigram has
    # idf log(2) (df 1 of 2 docs; unseen 'x' hits the max(df,1) floor), so
    # cosine_1 = log2^2 / (sqrt(2)log2)^2 = 0.5; bigram 'a x' vs 'a b'
    # share nothing -> cosine_2 = 0. score k1 = 10*(0.5)/4 = 1.25.
    gts = {"k1": ["a b"], "k2": ["c d"]}
    res = {"k1": ["a x"], "k2": ["c d"]}
    out = compute_caption_scores(gts, res)
    assert abs(out["CIDEr"] - (1.25 + 5.0) / 2) < 1e-9


def test_cider_length_penalty():
    # k1: hyp 'a b c' vs ref 'a b': delta = 1 -> gaussian exp(-1/72).
    # unigram: hyp vec {a,b,c} each log2, norm sqrt(3)log2; ref {a,b} norm
    # sqrt(2)log2; clipped dot = 2log2^2 -> cos = 2/sqrt(6).
    # bigram: hyp {ab,bc}, ref {ab}: dot log2^2, norms sqrt(2)log2, log2
    # -> cos = 1/sqrt(2). trigram 'a b c' vs none -> 0 (ref norm 0).
    gts = {"k1": ["a b"], "k2": ["c d"]}
    res = {"k1": ["a b c"], "k2": ["c d"]}
    out = compute_caption_scores(gts, res)
    g = math.exp(-1.0 / (2 * 36.0))
    k1 = 10.0 * (2 / math.sqrt(6) + 1 / math.sqrt(2)) * g / 4
    assert abs(out["CIDEr"] - (k1 + 5.0) / 2) < 1e-9


def test_meteor_absence_is_explicit():
    out = compute_caption_scores({"k": ["a b"]}, {"k": ["a b"]})
    try:
        import pycocoevalcap  # noqa: F401

        assert isinstance(out["METEOR"], float)
    except ImportError:
        assert out["METEOR"] is None
