"""Seeding helpers.

The reference seeds ``random``/``np.random``/``torch`` with ``seed + rank``
(reference: run_video_CapFilt.py:230-233); the host-side RNG state is
load-bearing for frame sampling (headtail/rand) and support-set choice, so
we replicate it exactly. Device-side randomness uses jax PRNG keys derived
from the same seed.
"""

from __future__ import annotations

import random

import numpy as np

from vidil_tpu.utils.dist import get_rank


def seed_everything(seed: int, add_rank: bool = True) -> int:
    """Seed python + numpy RNGs with ``seed (+ rank)``; return the seed used."""
    s = seed + get_rank() if add_rank else seed
    random.seed(s)
    np.random.seed(s)
    return s
