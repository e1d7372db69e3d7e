"""Persistent JAX compilation cache setup that actually works here.

Load-bearing discovery (r5): this jax build (0.9.0 + the axon tunnel
plugin) IGNORES the ``JAX_COMPILATION_CACHE_DIR`` environment variable —
``jax._src.config.compilation_cache_dir`` is defined with
``default=None`` and no env read (same quirk class as ``JAX_PLATFORMS``,
see tests/conftest.py). Every bench/tool in this repo used
``os.environ.setdefault(...)`` and therefore NEVER had a persistent
cache: each bench.py run cold-compiled every program (~60 s warmups for
the unfused CapFilt suite, and the fused-ViT-block encode's pathological
~21.6-min compile made the fused-ON arm un-benchable, BENCH_r04 rc=124).

The only working knob is ``jax.config.update("jax_compilation_cache_dir",
path)`` (or ``compilation_cache.set_cache_dir``). Measured on the axon
backend (tools/probe_* logs, 2026-08-19):

* entries persist and load in ~0.2 s (`lowered.compile()` on a hit);
* the FIRST dispatch of a cache-loaded executable can still take
  30-100 s (the remote worker finalizes the program at first run) — far
  cheaper than a big recompile but not free: benches must still warm up
  by executing once, not just compiling;
* the remote-compile service does NOT cache across processes on its own
  (a 21.6-min compile repeated verbatim in the next process).

Call :func:`enable_persistent_cache` BEFORE the first jit dispatch (any
time after ``import jax`` works; the cache initializes lazily at the
first compile).
"""

from __future__ import annotations

import os

DEFAULT_DIR = "~/.cache/vidil_tpu_jaxcache"


def enable_persistent_cache(path: str | None = None,
                            min_compile_time_secs: float = 1.0) -> str:
    """Point jax's persistent compilation cache at `path` and return it.

    Order of precedence: explicit `path` arg > JAX_COMPILATION_CACHE_DIR
    env var (honored here by hand since jax itself ignores it) >
    DEFAULT_DIR. Safe to call more than once.
    """
    import jax

    path = (path
            or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or DEFAULT_DIR)
    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    return path
