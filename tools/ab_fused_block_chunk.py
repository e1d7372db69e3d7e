"""Same-session A/B: fused ViT block ON vs OFF on the FULL CapFilt chunk
program (VERDICT r4 item 1).

Round 4 defaulted `ViTConfig.use_fused_block=True` on the strength of an
encode-only A/B (1.65x at 384px), but the only full chunk-program
datapoints — taken on different days — read fused-ON ~13% SLOWER
canary-normalized (130.5 f/s @ canary 69.2 vs 167.4 @ 76.9,
benchmarks/capfilt.jsonl). This driver settles it: alternating
OFF/ON/OFF/ON/... bench.py invocations in ONE session (interleaving
controls chip/tunnel drift better than grouped arms), each rep appending
its full record to benchmarks/capfilt.jsonl via bench.py's emit, plus a
consolidated verdict row to benchmarks/fused_block_chunk_ab.jsonl.

Run on an otherwise-idle host (CLAUDE.md: concurrent host work inflates
run_chunk timings 10-20% on the 1-core box).

Usage: python tools/ab_fused_block_chunk.py [reps_per_arm=3]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_rep(fused: str, budget: str = "900") -> dict | None:
    env = dict(os.environ, BENCH_FUSED_BLOCK=fused, BENCH_TIME_BUDGET=budget,
               BENCH_ITERS="8",  # aggregate timing: more steady chunks = finer
               BENCH_E2E="0")  # headline compute phase only: the A/B is
    # about the chunk program, and skipping the tunnel-bound upload phase
    # keeps reps fast + the arms noise-free
    p = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=1000)
    sys.stderr.write(p.stderr[-2000:] + "\n")
    for line in p.stdout.strip().splitlines():
        try:
            return json.loads(line)
        except ValueError:
            continue
    return None


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rows = {"0": [], "1": []}
    for r in range(reps):
        for arm in ("0", "1"):
            rec = run_rep(arm)
            if rec is None or not rec.get("value"):
                print(f"[ab] rep {r} arm fused={arm}: FAILED/degraded: {rec}",
                      file=sys.stderr)
                continue
            rows[arm].append(rec)
            print(f"[ab] rep {r} fused={arm}: {rec['value']} f/s "
                  f"@ canary {rec.get('chip_canary_tflops')}", file=sys.stderr)

    def summarize(arm):
        rs = rows[arm]
        if not rs:
            return None
        norm = [r["value"] / r["chip_canary_tflops"] for r in rs
                if r.get("chip_canary_tflops")]
        return {
            "reps": len(rs),
            "fps": [r["value"] for r in rs],
            "canary": [r.get("chip_canary_tflops") for r in rs],
            "fps_per_canary_tflop": [round(n, 4) for n in norm],
            "median_norm": round(sorted(norm)[len(norm) // 2], 4) if norm else None,
        }

    s0, s1 = summarize("0"), summarize("1")
    verdict = None
    if s0 and s1 and s0["median_norm"] and s1["median_norm"]:
        ratio = s1["median_norm"] / s0["median_norm"]
        verdict = ("fused_on_wins" if ratio > 1.03
                   else "fused_off_wins" if ratio < 0.97 else "wash")
    record = {
        "metric": "capfilt_chunk_fused_block_ab",
        "value": round(s1["median_norm"] / s0["median_norm"], 4) if s0 and s1 else None,
        "unit": "fused_on/fused_off canary-normalized throughput ratio",
        "vs_baseline": 1.0,
        "fused_off": s0,
        "fused_on": s1,
        "verdict": verdict,
        "note": "same-session interleaved OFF/ON reps of the full CapFilt "
                "chunk program (bench.py headline phase, BENCH_E2E=0); "
                "settles the r4 default flip (VERDICT item 1)",
    }
    from vidil_tpu.utils.bench_artifact import emit

    emit("fused_block_chunk_ab", record)


if __name__ == "__main__":
    main()
