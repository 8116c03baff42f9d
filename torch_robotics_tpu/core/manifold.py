"""Riemannian product manifolds R^n x (S^3)^m with Gaussians.

TPU-native re-design of the reference manifold module
(/root/reference/torch_robotics/torch_kinematics_tree/geometrics/manifold.py —
dead at import time there due to stale imports; revived here): product
manifolds of Euclidean and unit-quaternion factors with log/exp maps, parallel
transport, Karcher mean, and manifold Gaussians.  Points are flat vectors with
the factors concatenated; all ops are batched and jit-friendly except the
Karcher mean's fixed-iteration loop.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .euclidean import e_exp_map, e_log_map, e_parallel_transport
from .quaternion import q_exp_map, q_log_map, q_parallel_transport

__all__ = ["Manifold", "get_manifold_from_name", "Gaussian",
           "kl_divergence_mvn"]


@dataclasses.dataclass(frozen=True)
class _Factor:
    kind: str          # 'euclidean' | 'quaternion'
    dim_M: int         # ambient dimension (n or 4)
    dim_T: int         # tangent dimension (n or 3)


@dataclasses.dataclass(frozen=True)
class Manifold:
    """Product manifold; factors laid out contiguously in the point vector."""
    factors: Tuple[_Factor, ...]

    @classmethod
    def euclidean(cls, n: int) -> "Manifold":
        return cls((_Factor("euclidean", n, n),))

    @classmethod
    def sphere_S3(cls) -> "Manifold":
        return cls((_Factor("quaternion", 4, 3),))

    def cartesian_product(self, other: "Manifold") -> "Manifold":
        return Manifold(self.factors + other.factors)

    @property
    def dim_M(self) -> int:
        return sum(f.dim_M for f in self.factors)

    @property
    def dim_T(self) -> int:
        return sum(f.dim_T for f in self.factors)

    def _split(self, x, ambient=True):
        out, i = [], 0
        for f in self.factors:
            n = f.dim_M if ambient else f.dim_T
            out.append(x[..., i:i + n])
            i += n
        return out

    def log_map(self, x, base=None):
        """x (..., dim_M) -> tangent (..., dim_T) at base (or origin)."""
        xs = self._split(jnp.asarray(x))
        bs = (self._split(jnp.asarray(base)) if base is not None
              else [None] * len(self.factors))
        parts = []
        for f, xi, bi in zip(self.factors, xs, bs):
            if f.kind == "euclidean":
                parts.append(e_log_map(xi, bi))
            else:
                parts.append(q_log_map(xi, bi))
        return jnp.concatenate(parts, axis=-1)

    def exp_map(self, v, base=None):
        """tangent (..., dim_T) -> point (..., dim_M)."""
        vs = self._split(jnp.asarray(v), ambient=False)
        bs = (self._split(jnp.asarray(base)) if base is not None
              else [None] * len(self.factors))
        parts = []
        for f, vi, bi in zip(self.factors, vs, bs):
            if f.kind == "euclidean":
                parts.append(e_exp_map(vi, bi))
            else:
                parts.append(q_exp_map(vi, bi))
        return jnp.concatenate(parts, axis=-1)

    def parallel_transport(self, v, g, h):
        vs = self._split(jnp.asarray(v), ambient=False)
        gs = self._split(jnp.asarray(g))
        hs = self._split(jnp.asarray(h))
        parts = []
        for f, vi, gi, hi in zip(self.factors, vs, gs, hs):
            if f.kind == "euclidean":
                parts.append(e_parallel_transport(vi, gi, hi))
            else:
                parts.append(q_parallel_transport(vi, gi, hi))
        return jnp.concatenate(parts, axis=-1)

    def mean(self, points, n_iters: int = 20, step: float = 1.0):
        """Karcher mean of (N, dim_M) points by fixed-iteration gradient
        descent on the manifold (manifold.py:83-114)."""
        points = jnp.asarray(points)
        mu0 = points[0]

        def body(mu, _):
            v = self.log_map(points, base=mu)
            mu_next = self.exp_map(step * v.mean(axis=0), base=mu)
            return mu_next, None

        mu, _ = jax.lax.scan(body, mu0, None, length=n_iters)
        return mu

    def normal_distribution(self, mean, cov) -> "Gaussian":
        return Gaussian(self, jnp.asarray(mean), jnp.asarray(cov))


def get_manifold_from_name(name: str) -> Manifold:
    if name in ("euclidean", "R"):
        return Manifold.euclidean(1)
    if name in ("S3", "quaternion", "sphere"):
        return Manifold.sphere_S3()
    if name.startswith("R^"):
        return Manifold.euclidean(int(name[2:]))
    raise NotImplementedError(name)


@dataclasses.dataclass(frozen=True)
class Gaussian:
    """Gaussian on a manifold: mean point + tangent-space covariance
    (distributions.py:5-54)."""
    manifold: Manifold
    mean: jnp.ndarray            # (dim_M,)
    cov: jnp.ndarray             # (dim_T, dim_T)

    def pdf(self, x):
        v = self.manifold.log_map(jnp.asarray(x), base=self.mean)
        k = self.manifold.dim_T
        cov_inv = jnp.linalg.inv(self.cov)
        quad = jnp.einsum("...i,ij,...j->...", v, cov_inv, v)
        norm = jnp.sqrt((2 * jnp.pi) ** k * jnp.linalg.det(self.cov))
        return jnp.exp(-0.5 * quad) / norm

    def sample(self, key, n: int):
        L = jnp.linalg.cholesky(self.cov)
        z = jax.random.normal(key, (n, self.manifold.dim_T), self.mean.dtype)
        v = z @ L.T
        return jax.vmap(lambda vi: self.manifold.exp_map(vi, base=self.mean))(v)

    def transform(self, A, b=None):
        """Affine transform in the tangent space at the mean."""
        new_mean = self.manifold.exp_map(
            (A @ self.manifold.log_map(self.mean)[..., None])[..., 0]
            + (0.0 if b is None else b))
        new_cov = A @ self.cov @ A.T
        return Gaussian(self.manifold, new_mean, new_cov)

    def prod(self, other: "Gaussian") -> "Gaussian":
        """Gaussian product in the shared tangent space at self.mean
        (manifold.py:149-186 simplification)."""
        P1 = jnp.linalg.inv(self.cov)
        P2 = jnp.linalg.inv(other.cov)
        cov = jnp.linalg.inv(P1 + P2)
        v2 = self.manifold.log_map(other.mean, base=self.mean)
        v = (cov @ (P2 @ v2[..., None]))[..., 0]
        mean = self.manifold.exp_map(v, base=self.mean)
        return Gaussian(self.manifold, mean, cov)


def kl_divergence_mvn(g1: Gaussian, g2: Gaussian):
    """KL(N1 || N2) between Gaussians in a shared tangent space
    (distributions.py:56-85)."""
    k = g1.manifold.dim_T
    cov2_inv = jnp.linalg.inv(g2.cov)
    dm = g1.manifold.log_map(g2.mean, base=g1.mean)
    term_tr = jnp.trace(cov2_inv @ g1.cov)
    term_quad = dm @ cov2_inv @ dm
    term_logdet = (jnp.linalg.slogdet(g2.cov)[1]
                   - jnp.linalg.slogdet(g1.cov)[1])
    return 0.5 * (term_tr + term_quad - k + term_logdet)
