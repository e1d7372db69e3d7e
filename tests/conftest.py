"""Test env: virtual 8-device CPU mesh, fully offline HF.

The environment pins JAX_PLATFORMS=axon (TPU-over-tunnel); tests must run
on CPU with 8 virtual devices, so we override both the env var and the
jax config (the env var alone is not honored once the axon plugin is on
PYTHONPATH).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import jax

jax.config.update("jax_platforms", "cpu")

# Rebuild the native decode library when its source is newer than the
# checked-in .so (a stale binary once shipped without a new export and
# only the test suite caught it).
_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_src = os.path.join(_root, "native", "video_decode.cpp")
_so = os.path.join(_root, "native", "build", "libvidil_decode.so")
if os.path.exists(_src) and os.path.exists(_so) and os.path.getmtime(_src) > os.path.getmtime(_so):
    import subprocess

    subprocess.run(["bash", os.path.join(_root, "tools", "build_native.sh")], check=False)
