"""Deterministic seeding (reference ``pl.seed_everything`` equivalent).

Every reference train/test script calls ``pl.seed_everything(5|15,
workers=True)`` (train_pet_cnn.py:125, test.py:19). In JAX, randomness is
explicit PRNG keys, so "seeding everything" means (a) seeding numpy/python
for host-side shuffling, and (b) deriving a root ``jax.random`` key.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def seed_everything(seed: int) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
