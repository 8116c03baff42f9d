"""Seeding helpers.

The reference seeds three global RNGs (torch_utils/seed.py:7-21); in JAX
randomness is explicit, so this module just provides a convenience for
creating root PRNG keys plus numpy seeding for host-side sampling.
"""
from __future__ import annotations

import random as _py_random

import jax
import numpy as np


def fix_random_seed(seed: int) -> jax.Array:
    """Seed host RNGs and return a root JAX PRNG key."""
    _py_random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def split_like(key, pytree):
    """Split a key into one per leaf of ``pytree`` (same structure)."""
    leaves, treedef = jax.tree_util.tree_flatten(pytree)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(treedef, list(keys))
