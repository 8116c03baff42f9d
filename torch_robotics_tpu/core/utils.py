"""Array utilities and the framework-wide dtype policy.

Replaces the reference's ``tensor_args`` device/dtype dict convention
(/root/reference/torch_robotics/torch_utils/torch_utils.py:19) with a simple
dtype policy: in JAX device placement is implicit (jit + sharding), so only
the compute dtype is threaded through constructors.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_DTYPE = jnp.float32


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """Compute/accumulate dtype policy.

    compute: dtype for the bulk of the math (bfloat16 on the fast path).
    accum: dtype for reductions/factorizations (float32).
    """
    compute: Any = jnp.float32
    accum: Any = jnp.float32


DEFAULT_POLICY = DTypePolicy()


def to_jnp(x, dtype=DEFAULT_DTYPE):
    """Convert array-likes (numpy, lists, jax) to a jnp array of ``dtype``."""
    return jnp.asarray(x, dtype=dtype)


def to_numpy(x, dtype=np.float32):
    if isinstance(x, jax.Array):
        return np.asarray(x).astype(dtype)
    if isinstance(x, np.ndarray):
        return x.astype(dtype)
    return np.asarray(x).astype(dtype)


def batch_cov(points):
    """Batched covariance over (B, N, D) -> (B, D, D), unbiased for N > 1."""
    B, N, D = points.shape
    mean = points.mean(axis=1, keepdims=True)
    diffs = points - mean
    bcov = jnp.einsum("bni,bnj->bij", diffs, diffs)
    return bcov / max(N - 1, 1)


def batch_trace(covs):
    return jnp.trace(covs, axis1=-2, axis2=-1)


def tensor_linspace(start, end, steps: int = 10):
    """Vectorized linspace: shape start.shape + (steps,)."""
    start = jnp.asarray(start)
    end = jnp.asarray(end)
    w = jnp.linspace(0.0, 1.0, steps, dtype=start.dtype)
    return start[..., None] * (1.0 - w) + end[..., None] * w


def batched_weighted_dot_prod(x, M, y):
    """Batched x^T M y contracted over the second-to-last axis."""
    My = jnp.einsum("ij,...jk->...ik", M, y)
    return jnp.einsum("...ij,...ij->...j", x, My)


class MinMaxScaler:
    """Scale values to [0, 1] by (x - min) / (max - min).

    Mirrors the reference scaler (geometrics/utils.py:67-93); min/max are
    taken from the first array seen unless provided.
    """

    def __init__(self, min=None, max=None, dim=None):
        self.min = min
        self.max = max
        self.dim = dim

    def scale(self, X):
        if self.min is None:
            self.min = (jnp.min(X) if self.dim is None
                        else jnp.min(X, axis=self.dim))
        if self.max is None:
            self.max = (jnp.max(X) if self.dim is None
                        else jnp.max(X, axis=self.dim))
        return (X - self.min) / (self.max - self.min)


def euclidean_distance(x_batch, x_target, w_pos=1.0, normalized_input=False):
    """Weighted Euclidean distance (geometrics/utils.py:96-127 core path)."""
    if normalized_input:
        x_batch = MinMaxScaler(dim=-2).scale(x_batch)
        x_target = MinMaxScaler(dim=-2).scale(x_target)
    return w_pos * jnp.linalg.norm(x_batch - x_target, axis=-1)


def is_positive_semi_definite(mat) -> bool:
    """Host-side PSD check (torch_utils/torch_utils.py:147-149)."""
    m = np.asarray(mat)
    return bool(np.allclose(m, m.T) and (np.linalg.eigvals(m).real >= 0).all())


def is_positive_definite(mat) -> bool:
    m = np.asarray(mat)
    return bool(np.allclose(m, m.T) and (np.linalg.eigvals(m).real > 0).all())


def torch_intersect_1d(a, b):
    """Intersection of two 1-D integer arrays (host-side, data-dependent
    shape; mirrors torch_utils/torch_utils.py:156-159)."""
    return jnp.asarray(np.intersect1d(np.asarray(a), np.asarray(b)))


def finite_difference_vector(x, dt=1.0, method="forward"):
    """Finite differences along axis -2 with zero padding at the borders.

    Mirrors the reference (trajectory/utils.py:53-64).
    """
    x = jnp.asarray(x)
    zeros_one = jnp.zeros_like(x[..., :1, :])
    if method == "forward":
        d = (x[..., 1:, :] - x[..., :-1, :]) / dt
        return jnp.concatenate([d, zeros_one], axis=-2)
    if method == "backward":
        d = (x[..., 1:, :] - x[..., :-1, :]) / dt
        return jnp.concatenate([zeros_one, d], axis=-2)
    if method == "central":
        d = (x[..., 2:, :] - x[..., :-2, :]) / (2.0 * dt)
        return jnp.concatenate([zeros_one, d, zeros_one], axis=-2)
    raise NotImplementedError(method)
