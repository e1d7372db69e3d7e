"""Regression tripwire (tools/bench_check.py, VERDICT r4 item 8): bench.py
compares each fresh record against the best committed row of the artifact,
canary-normalized (raw f/s is meaningless across sessions — the tunnel
chip swings ~2x by time of day), and warns instead of failing (the bench
must always emit its one JSON line)."""

import json
import os

from tools.bench_check import check_regression

BASE = {"metric": "capfilt_caption_filter_compute_throughput",
        "unit": "frames/sec/chip"}


def _write(tmp_path, rows):
    bdir = tmp_path / "benchmarks"
    bdir.mkdir()
    with open(bdir / "capfilt.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return tmp_path


def _with_repo(monkeypatch, tmp_path):
    import tools.bench_check as bc

    monkeypatch.setattr(bc, "_REPO", str(tmp_path))


def test_regression_detected_canary_normalized(tmp_path, monkeypatch):
    # r4's actual shape: 167.4 f/s @ canary 76.9 committed; a new run at
    # 130.5 f/s @ canary 69.2 is ~13.5% below normalized -> trips at 10%
    _write(tmp_path, [dict(BASE, value=167.4, chip_canary_tflops=76.9)])
    _with_repo(monkeypatch, tmp_path)
    new = dict(BASE, value=130.5, chip_canary_tflops=69.2)
    warn = check_regression(new, tolerance=0.10)
    assert warn is not None and "below the median of the top-5 committed rows" in warn


def test_no_warning_within_tolerance(tmp_path, monkeypatch):
    _write(tmp_path, [dict(BASE, value=167.4, chip_canary_tflops=76.9)])
    _with_repo(monkeypatch, tmp_path)
    # same normalized rate at a slower chip: no warning
    new = dict(BASE, value=150.0, chip_canary_tflops=68.9)
    assert check_regression(new, tolerance=0.15) is None


def test_ab_arms_not_compared(tmp_path, monkeypatch):
    # a fused-ON A/B arm must not be judged against fused-OFF rows
    _write(tmp_path, [dict(BASE, value=167.4, chip_canary_tflops=76.9,
                           fused_vit_block=False)])
    _with_repo(monkeypatch, tmp_path)
    new = dict(BASE, value=100.0, chip_canary_tflops=76.9,
               fused_vit_block=True)
    assert check_regression(new, tolerance=0.15) is None


def test_missing_artifact_or_canary_is_silent(tmp_path, monkeypatch):
    _with_repo(monkeypatch, tmp_path)  # no benchmarks/ dir at all
    assert check_regression(dict(BASE, value=1.0, chip_canary_tflops=1.0)) is None
    _write(tmp_path, [dict(BASE, value=167.4)])  # committed row lacks canary
    assert check_regression(dict(BASE, value=1.0, chip_canary_tflops=1.0)) is None
    # new record lacks canary: not comparable, stay silent
    os.remove(tmp_path / "benchmarks" / "capfilt.jsonl")
    _write_rows = [dict(BASE, value=167.4, chip_canary_tflops=76.9)]
    with open(tmp_path / "benchmarks" / "capfilt.jsonl", "w") as f:
        for r in _write_rows:
            f.write(json.dumps(r) + "\n")
    assert check_regression(dict(BASE, value=1.0)) is None


def test_lucky_top_row_does_not_flag_normal_run(tmp_path, monkeypatch):
    # measured 2026-08-19 same-commit spread: 2.151 vs 2.512 normalized
    # (14.4%). Baseline = median of top-5, so one lucky session at the top
    # must not flag the next healthy run.
    rows = [dict(BASE, value=v, chip_canary_tflops=c) for v, c in
            [(167.07, 73.6), (167.08, 73.3), (166.90, 73.6),
             (167.99, 71.7), (194.15, 77.3)]]
    _write(tmp_path, rows)
    _with_repo(monkeypatch, tmp_path)
    healthy = dict(BASE, value=173.6, chip_canary_tflops=80.7)
    assert check_regression(healthy, tolerance=0.15) is None
    # but a genuine r4-scale regression still trips
    regressed = dict(BASE, value=130.5, chip_canary_tflops=69.2)
    assert check_regression(regressed, tolerance=0.15) is not None
