"""Regression tripwire for the headline bench (VERDICT r4 item 8).

Compares a freshly measured bench record against the committed rows in
``benchmarks/capfilt.jsonl``, canary-normalized: the tunnel chip's
effective rate swings ~2x by time of day, so raw frames/s comparisons
across sessions are meaningless — value/canary is far more stable for the
same code, but still shows ~14% same-day spread between healthy runs
(2.151 vs 2.512 measured 2026-08-19, same commit). The baseline is
therefore the MEDIAN of the top-5 comparable committed rows, not the
single best (the luckiest run): median top-5 currently 2.279, so a
healthy 2.15 run passes while the r4 fused-ON default regression
(130.5 f/s @ canary 69.2 = 1.886, 17% below) trips the 15% tolerance.

Pure stdlib; never raises out (bench.py must always emit its one line).
"""

from __future__ import annotations

import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# fields that must match for two rows to be comparable (an A/B arm with
# the fused kernel forced on is not a regression of the default path)
_COMPARE_KEYS = ("metric", "unit")


def _normalized(row: dict) -> float | None:
    v = row.get("value")
    c = row.get("chip_canary_tflops")
    if not v or not c:
        return None
    return float(v) / float(c)


def check_regression(record: dict, artifact: str = "capfilt",
                     tolerance: float = 0.15) -> str | None:
    """Return a human-readable warning if `record` regresses vs the best
    committed row of ``benchmarks/<artifact>.jsonl``, else None."""
    path = os.path.join(_REPO, "benchmarks", f"{artifact}.jsonl")
    if not os.path.exists(path):
        return None
    new_norm = _normalized(record)
    if new_norm is None:
        return None
    norms = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                row = json.loads(line)
            except ValueError:
                continue
            if any(row.get(k) != record.get(k) for k in _COMPARE_KEYS):
                continue
            # compare like-for-like on the fused-block axis when both rows
            # carry the field (older rows predate it: compare anyway —
            # they were all effectively the default path)
            if ("fused_vit_block" in row
                    and row.get("fused_vit_block") != record.get("fused_vit_block")):
                continue
            n = _normalized(row)
            if n is not None:
                norms.append(n)
    if not norms:
        return None
    # baseline = median of the top-5 normalized rates: robust to one lucky
    # session at the top and to old slow rows at the bottom
    top = sorted(norms, reverse=True)[:5]
    baseline = sorted(top)[len(top) // 2]
    if new_norm < baseline * (1.0 - tolerance):
        return (f"canary-normalized rate {new_norm:.3f} f/s-per-canary-TFLOP is "
                f"{(1 - new_norm / baseline) * 100:.0f}% below the median of the "
                f"top-5 committed rows ({baseline:.3f}) — investigate before "
                f"shipping")
    return None


if __name__ == "__main__":
    import sys

    rec = json.loads(sys.stdin.read())
    warn = check_regression(rec)
    print(warn or "ok")
    sys.exit(0)
