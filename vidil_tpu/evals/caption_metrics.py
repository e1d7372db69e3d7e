"""Caption metrics: PTB-style tokenization + BLEU / ROUGE-L / CIDEr.

The reference scores captions with pycocoevalcap (Java PTBTokenizer +
Bleu(4)/METEOR/ROUGE_L/CIDEr; reference: data/utils.py:175-221,
eval_video_captioning_results.py:74-144). This module implements the same
metrics in pure Python so evaluation runs in offline/Java-less
environments; when pycocoevalcap is importable it is used instead for
bit-identical numbers (including METEOR, which needs the Java jar).

Formulas follow the canonical implementations:
* BLEU-n: corpus-level, clipped n-gram precision, 'closest' effective
  reference length, brevity penalty (Papineni et al.; pycocoevalcap Bleu).
* ROUGE-L: LCS F-measure with beta=1.2, max over references (Lin 2004).
* CIDEr: tf-idf weighted n-gram cosine, n=1..4, gaussian length penalty
  sigma=6 (Vedantam et al. 2015; the CIDEr-D variant pycocoevalcap uses).
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

# PTBTokenizer-equivalent: lowercase, strip punctuation tokens the Stanford
# tokenizer removes, split on whitespace
_PTB_PUNCT = re.compile(
    r"[\"'`‘’“”(){}\[\]<>@#$%^&*\\/+=|~;:!?.,-]|\.\.\."
)


def ptb_tokenize(caption: str) -> list[str]:
    s = caption.lower()
    s = _PTB_PUNCT.sub(" ", s)
    return s.split()


def _ngrams(tokens: list[str], n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


# ---------------------------------------------------------------------------
# BLEU
# ---------------------------------------------------------------------------

def bleu(gts: dict, res: dict, n_max: int = 4):
    """Corpus BLEU-1..n. gts/res: {key: [token lists]} (res has 1 each)."""
    tiny, small = 1e-15, 1e-9
    total_hyp_len = 0
    total_ref_len = 0
    correct = [0] * n_max
    guess = [0] * n_max
    for key in gts:
        hyp = res[key][0]
        refs = gts[key]
        total_hyp_len += len(hyp)
        # 'closest' effective reference length
        total_ref_len += min((abs(len(r) - len(hyp)), len(r)) for r in refs)[1]
        for n in range(1, n_max + 1):
            hyp_ngrams = _ngrams(hyp, n)
            max_ref = Counter()
            for r in refs:
                for ng, c in _ngrams(r, n).items():
                    max_ref[ng] = max(max_ref[ng], c)
            guess[n - 1] += max(0, len(hyp) - n + 1)
            correct[n - 1] += sum(min(c, max_ref[ng]) for ng, c in hyp_ngrams.items())

    bleus = []
    log_sum = 0.0
    ratio = total_hyp_len / (total_ref_len + tiny)
    bp = 1.0 if ratio > 1.0 else math.exp(1.0 - 1.0 / (ratio + tiny))
    for n in range(n_max):
        p_n = (correct[n] + tiny) / (guess[n] + small)
        log_sum += math.log(p_n)
        bleus.append(bp * math.exp(log_sum / (n + 1)))
    return bleus


# ---------------------------------------------------------------------------
# ROUGE-L
# ---------------------------------------------------------------------------

def _lcs_len(a: list[str], b: list[str]) -> int:
    if not a or not b:
        return 0
    dp = [0] * (len(b) + 1)
    for x in a:
        prev = 0
        for j, y in enumerate(b, start=1):
            cur = dp[j]
            dp[j] = prev + 1 if x == y else max(dp[j], dp[j - 1])
            prev = cur
    return dp[len(b)]


def rouge_l(gts: dict, res: dict, beta: float = 1.2) -> float:
    scores = []
    for key in gts:
        hyp = res[key][0]
        best = 0.0
        for ref in gts[key]:
            lcs = _lcs_len(hyp, ref)
            if lcs == 0:
                continue
            prec = lcs / len(hyp) if hyp else 0.0
            rec = lcs / len(ref) if ref else 0.0
            if prec and rec:
                f = ((1 + beta**2) * prec * rec) / (rec + beta**2 * prec)
                best = max(best, f)
        scores.append(best)
    return sum(scores) / max(len(scores), 1)


# ---------------------------------------------------------------------------
# CIDEr-D
# ---------------------------------------------------------------------------

def cider(gts: dict, res: dict, n_max: int = 4, sigma: float = 6.0) -> float:
    # document frequencies over the reference corpus
    doc_freq = [defaultdict(int) for _ in range(n_max)]
    for key in gts:
        for n in range(n_max):
            seen = set()
            for ref in gts[key]:
                seen |= set(_ngrams(ref, n + 1).keys())
            for ng in seen:
                doc_freq[n][ng] += 1
    log_ref = math.log(max(len(gts), 1))

    def tfidf_vec(tokens):
        vecs, norms = [], []
        for n in range(n_max):
            counts = _ngrams(tokens, n + 1)
            vec = {}
            norm = 0.0
            for ng, c in counts.items():
                df = math.log(max(doc_freq[n][ng], 1.0))
                w = c * max(log_ref - df, 0.0)
                vec[ng] = w
                norm += w * w
            vecs.append(vec)
            norms.append(math.sqrt(norm))
        return vecs, norms

    scores = []
    for key in gts:
        hyp = res[key][0]
        h_vecs, h_norms = tfidf_vec(hyp)
        score = [0.0] * n_max
        for ref in gts[key]:
            r_vecs, r_norms = tfidf_vec(ref)
            delta = len(hyp) - len(ref)
            for n in range(n_max):
                # CIDEr-D: clip hyp counts at ref counts
                num = sum(min(w, r_vecs[n].get(ng, 0.0)) * r_vecs[n].get(ng, 0.0)
                          for ng, w in h_vecs[n].items())
                if h_norms[n] and r_norms[n]:
                    s = num / (h_norms[n] * r_norms[n])
                else:
                    s = 0.0
                s *= math.exp(-(delta**2) / (2 * sigma**2))
                score[n] += s
        n_refs = len(gts[key])
        scores.append(10.0 * sum(s / n_refs for s in score) / n_max)
    return sum(scores) / max(len(scores), 1)


# ---------------------------------------------------------------------------
# top-level scorer
# ---------------------------------------------------------------------------

def compute_caption_scores(gts_raw: dict, res_raw: dict) -> dict:
    """gts_raw: {key: [ref strings]}, res_raw: {key: [hyp string]}.

    Uses pycocoevalcap when importable (incl. METEOR); else the pure-Python
    implementations above (METEOR omitted).
    """
    try:  # pragma: no cover - optional dependency
        from pycocoevalcap.bleu.bleu import Bleu
        from pycocoevalcap.cider.cider import Cider
        from pycocoevalcap.meteor.meteor import Meteor
        from pycocoevalcap.rouge.rouge import Rouge
        from pycocoevalcap.tokenizer.ptbtokenizer import PTBTokenizer

        tok = PTBTokenizer()
        gts = tok.tokenize({k: [{"caption": c} for c in v] for k, v in gts_raw.items()})
        res = tok.tokenize({k: [{"caption": c} for c in v] for k, v in res_raw.items()})
        out = {}
        bleu_scores, _ = Bleu(4).compute_score(gts, res)
        for i, s in enumerate(bleu_scores):
            out[f"Bleu_{i+1}"] = s
        out["METEOR"], _ = Meteor().compute_score(gts, res)
        out["ROUGE_L"], _ = Rouge().compute_score(gts, res)
        out["CIDEr"], _ = Cider().compute_score(gts, res)
        return out
    except Exception:
        gts = {k: [ptb_tokenize(c) for c in v] for k, v in gts_raw.items()}
        res = {k: [ptb_tokenize(c) for c in v] for k, v in res_raw.items()}
        out = {}
        for i, s in enumerate(bleu(gts, res)):
            out[f"Bleu_{i+1}"] = s
        # METEOR needs pycocoevalcap's Java jar (WordNet synonym/paraphrase
        # matching); reporting an approximation under the reference's metric
        # name would mislead, so its absence is explicit (reference reports
        # Bleu/METEOR/ROUGE_L/CIDEr, data/utils.py:205-216)
        out["METEOR"] = None
        out["ROUGE_L"] = rouge_l(gts, res)
        out["CIDEr"] = cider(gts, res)
        return out
