"""Seeding — numpy + JAX PRNG roots (replaces [recbole] init_seed)."""

from __future__ import annotations

import random

import jax
import numpy as np


def init_seed(seed: int, reproducibility: bool = True) -> jax.Array:
    """Seed python/numpy globals and return the root JAX PRNG key.

    JAX is deterministic by construction (explicit keys); the
    ``reproducibility`` flag exists for config parity with the
    reference and has no XLA equivalent of cudnn.deterministic.
    """
    random.seed(seed)
    np.random.seed(seed % (2 ** 32))
    return jax.random.PRNGKey(seed)
