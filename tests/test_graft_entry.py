"""Driver-contract tests for __graft_entry__.

The driver compile-checks ``entry()`` single-chip and runs
``dryrun_multichip(n)`` to validate multi-chip sharding. The dryrun has
been red twice because it ran in-process and inherited the parent's
(possibly TPU-initialized, possibly unhealthy) JAX backend; it now
spawns a fresh subprocess that pins CPU before any JAX call. These tests
assert that contract from a parent whose backend is ALREADY initialized
— the exact condition that broke the in-process versions.
"""

import os
import pytest
import subprocess
import sys

import numpy as np

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__  # noqa: E402


@pytest.mark.slow
def test_dryrun_multichip_survives_initialized_parent_backend():
    # Initialize the parent's backend BEFORE the dryrun (conftest pins
    # CPU here; at driver time this would be the tunneled TPU). The
    # subprocess must be unaffected by parent backend state.
    _ = jax.devices()
    _ = float(jax.numpy.ones(()).sum())  # force a real dispatch
    __graft_entry__.dryrun_multichip(4)


@pytest.mark.slow
def test_dryrun_multichip_ignores_hostile_parent_env():
    # A parent env pinning the WRONG virtual device count (1) must be
    # scrubbed by the parent wrapper before spawning the child.
    child = subprocess.run(
        [sys.executable, "-c",
         "import os, sys\n"
         "os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'\n"
         f"sys.path.insert(0, {REPO!r})\n"
         "import __graft_entry__\n"
         "__graft_entry__.dryrun_multichip(4)\n"],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "XLA_FLAGS": "--xla_force_host_platform_device_count=1"},
    )
    assert child.returncode == 0, child.stderr[-3000:]
    assert "dryrun_multichip(4) ok" in child.stdout
    assert "dryrun_multichip(4) capfilt ok" in child.stdout


def test_entry_compiles_and_runs():
    fn, args = __graft_entry__.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


def test_analytic_tflops_model_sane():
    """The bench's FLOP model must put one ViT-B/384 forward near the
    published ~100 GFLOPs (sanity anchor for the MFU denominators), and
    the components must be positive and sum to the total."""
    import bench

    fl = bench.analytic_tflops(128, 32, 4, itm_rows_per_video=4,
                               itm_text_len=35, dec_steps=16)
    per_frame_gflops = fl["encode"] / 2 / 128 * 1e3
    assert 90 <= per_frame_gflops <= 130, per_frame_gflops
    assert fl["encode"] > fl["itm"] > fl["decode"] > 0
    assert fl["total"] == pytest.approx(fl["encode"] + fl["decode"] + fl["itm"])
