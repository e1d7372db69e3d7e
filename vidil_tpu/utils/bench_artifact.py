"""Machine-readable benchmark artifacts.

Every tools/bench_*.py measurement prints its JSON line to stdout AND
appends it — stamped with timestamp, device, and the emitting script —
to ``benchmarks/<name>.jsonl`` at the repo root, so each headline number
quoted in README/ARCHITECTURE is traceable to a checked-in artifact and
round-over-round regressions are diffable (the reference publishes no
numbers at all; SURVEY.md §6 makes the baseline measured-not-copied).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def emit(name: str, record: dict, print_line: bool = True) -> dict:
    """Print ``record`` as one JSON line and append it to
    ``benchmarks/<name>.jsonl`` (stamped). Returns the stamped record."""
    try:
        import jax

        device = str(jax.devices()[0])
    except Exception:
        device = "unknown"
    stamped = {
        **record,
        "device": record.get("device", device),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        "script": os.path.basename(getattr(sys.modules.get("__main__"), "__file__", "?")),
    }
    if print_line:
        print(json.dumps(record), flush=True)
    bench_dir = os.path.join(_REPO, "benchmarks")
    os.makedirs(bench_dir, exist_ok=True)
    with open(os.path.join(bench_dir, f"{name}.jsonl"), "a") as f:
        f.write(json.dumps(stamped) + "\n")
    return stamped
