"""Regression tripwire for the headline bench (VERDICT r4 item 8).

Compares a freshly measured bench record against the best committed row in
``benchmarks/capfilt.jsonl``, canary-normalized: the tunnel chip's
effective rate swings ~2x by time of day, so raw frames/s comparisons
across sessions are meaningless — but value/canary is stable for the same
code. Returns a warning string when the new row reads more than
``tolerance`` below the best prior normalized rate (the fused-ON default
regression of r4 — 130.5 f/s @ canary 69.2 vs 167.4 @ 76.9, i.e. 1.89 vs
2.18 f/s per canary-TFLOP — would have tripped this at 13%).

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
    best = None
    best_row = None
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
            if n is not None and (best is None or n > best):
                best, best_row = n, row
    if best is None:
        return None
    if new_norm < best * (1.0 - tolerance):
        return (f"canary-normalized rate {new_norm:.3f} f/s-per-canary-TFLOP is "
                f"{(1 - new_norm / best) * 100:.0f}% below the best committed row "
                f"({best:.3f}, {best_row.get('value')} f/s @ canary "
                f"{best_row.get('chip_canary_tflops')}, "
                f"{best_row.get('timestamp', '?')}) — investigate before shipping")
    return None


if __name__ == "__main__":
    import sys

    rec = json.loads(sys.stdin.read())
    warn = check_regression(rec)
    print(warn or "ok")
    sys.exit(0)
