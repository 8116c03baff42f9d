"""Pytree dataclass helpers shared across the framework.

Frozen dataclasses registered with jax so instances flow through
jit/vmap/grad; fields marked ``static`` become aux metadata (hashable,
recompile on change).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["pytree_dataclass", "static_field", "safe_norm"]


def pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = dataclasses.fields(cls)
    data = [f.name for f in fields if not f.metadata.get("static", False)]
    meta = [f.name for f in fields if f.metadata.get("static", False)]
    jax.tree_util.register_dataclass(cls, data_fields=data, meta_fields=meta)
    return cls


def static_field(**kwargs):
    return dataclasses.field(metadata={"static": True}, **kwargs)


def safe_norm(x, axis=-1):
    """||x|| with a zero (not NaN) gradient at x = 0.

    Values are bit-identical to jnp.linalg.norm; only the derivative at the
    origin changes (0 subgradient), which keeps jacfwd/grad of SDFs finite
    for points exactly on sphere centers or inside rounded boxes.
    """
    s = jnp.sum(jnp.square(x), axis=axis)
    nonzero = s > 0.0
    return jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, s, 1.0)), 0.0)
