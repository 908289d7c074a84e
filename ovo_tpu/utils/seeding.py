"""Deterministic seeding (reference: ovo/utils/gen_utils.py:6-17).

JAX is functionally deterministic by construction; we seed numpy/python for
the host-side bits (dataset shuffles, sampling) and return a jax PRNG key.
"""
from __future__ import annotations

import os
import random

import numpy as np


def setup_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)
    os.environ.setdefault("PYTHONHASHSEED", str(seed))
    import jax

    return jax.random.PRNGKey(seed)
