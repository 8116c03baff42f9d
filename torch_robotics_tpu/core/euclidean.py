"""Euclidean manifold maps (trivial log/exp/transport).

Mirrors /root/reference/torch_robotics/torch_kinematics_tree/geometrics/euclidean.py.
"""
from __future__ import annotations

import jax.numpy as jnp


def e_log_map(p, base=None):
    if base is None:
        return jnp.asarray(p)
    return jnp.asarray(p) - jnp.asarray(base)


def e_exp_map(v, base=None):
    if base is None:
        return jnp.asarray(v)
    return jnp.asarray(v) + jnp.asarray(base)


def e_parallel_transport(v, g=None, h=None):
    return jnp.asarray(v)
