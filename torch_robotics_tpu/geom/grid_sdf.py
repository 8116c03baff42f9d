"""Precomputed voxel SDF grids with differentiable lookups.

TPU-native re-design of the reference ``GridMapSDF``
(/root/reference/torch_robotics/environments/grid_map_sdf.py):

- precompute is a single chunked ``vmap(value_and_grad(sdf))`` sweep over the
  grid (instead of the reference's per-x-slab autograd loop,
  grid_map_sdf.py:47-63), so it jits and shards;
- ``nearest`` lookup reproduces the reference's cell indexing and
  surrogate-gradient trick exactly (grid_map_sdf.py:93-113):
  sdf(x) ~= sdf(x_cell) + (x - stop_grad(x)) . grad_sdf(x_cell);
- ``trilinear`` lookup is the higher-quality mode (smooth values AND smooth
  gradients) used by the fast solver path.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .sdf import _pytree_dataclass, static_field

__all__ = ["GridSDF", "precompute_sdf_grid"]


def _min_sdf(obj_list, x):
    sdf = None
    for obj in obj_list:
        s = obj.signed_distance(x)
        sdf = s if sdf is None else jnp.minimum(sdf, s)
    return sdf


@partial(jax.jit, static_argnames=("sdf_fn", "chunk"))
def _precompute(points, sdf_fn, chunk):
    """points: (N, dim) -> (sdf (N,), grad (N, dim)) chunked to bound memory."""
    n = points.shape[0]
    pad = (-n) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    pts = pts.reshape(-1, chunk, points.shape[-1])
    vg = jax.vmap(jax.value_and_grad(sdf_fn))

    def body(p):
        return vg(p)

    sdf, grad = jax.lax.map(body, pts)
    return sdf.reshape(-1)[:n], grad.reshape(-1, points.shape[-1])[:n]


def precompute_sdf_grid(limits, cell_size, obj_list, chunk=8192):
    """Build a GridSDF for a list of objects with ``signed_distance``.

    limits: (2, dim) array [[mins], [maxs]]; cell_size: float.
    Grid layout matches the reference (grid_map_sdf.py:27-45):
    cmap_dim = ceil(extent / cell), points = inclusive linspaces, 'ij' indexed.
    """
    limits = jnp.asarray(limits)
    dim = limits.shape[-1]
    map_dim = jnp.abs(limits[1] - limits[0])
    cmap_dim = tuple(int(np.ceil(float(map_dim[d]) / cell_size))
                     for d in range(dim))
    axes = [jnp.linspace(limits[0][d], limits[1][d], cmap_dim[d])
            for d in range(dim)]
    mesh = jnp.meshgrid(*axes, indexing="ij")
    points = jnp.stack([m.reshape(-1) for m in mesh], axis=-1)

    sdf_fn = lambda x: _min_sdf(obj_list, x)
    sdf, grad = _precompute(points, sdf_fn, chunk)
    return GridSDF(
        limits=limits,
        sdf_grid=sdf.reshape(cmap_dim),
        grad_grid=grad.reshape(cmap_dim + (dim,)),
        cmap_dim=cmap_dim,
    )


@_pytree_dataclass
class GridSDF:
    """Voxel SDF + gradient grid over a box workspace."""
    limits: jnp.ndarray          # (2, dim)
    sdf_grid: jnp.ndarray        # cmap_dim
    grad_grid: jnp.ndarray       # cmap_dim + (dim,)
    cmap_dim: tuple = static_field(default=())

    @property
    def dim(self) -> int:
        return self.limits.shape[-1]

    def _cell_index(self, x):
        """Reference cell indexing (grid_map_sdf.py:93-97), clamped."""
        map_dim = jnp.abs(self.limits[1] - self.limits[0])
        idx = jnp.floor((x - self.limits[0]) / map_dim
                        * jnp.asarray(self.cmap_dim, x.dtype)).astype(jnp.int32)
        max_idx = jnp.asarray(self.cmap_dim, jnp.int32) - 1
        return jnp.clip(idx, 0, max_idx)

    def signed_distance(self, x):
        """Nearest-cell lookup with the surrogate-gradient linearization.

        Value equals the cell SDF; gradient w.r.t. x equals the cell gradient
        (matching grid_map_sdf.py:100-113).
        x: (..., dim) -> (...,)
        """
        idx = self._cell_index(jax.lax.stop_gradient(x))
        query = tuple(jnp.moveaxis(idx, -1, 0))
        sdf_vals = self.sdf_grid[query]
        grad = self.grad_grid[query]
        delta = x - jax.lax.stop_gradient(x)
        return sdf_vals + jnp.sum(delta * grad, axis=-1)

    def signed_distance_trilinear(self, x):
        """Multilinear interpolation of the SDF grid (smooth value + grad)."""
        map_dim = jnp.abs(self.limits[1] - self.limits[0])
        cmap = jnp.asarray(self.cmap_dim, x.dtype)
        # continuous grid coordinates: node d sits at limits0 + d * extent/(n-1)
        coord = (x - self.limits[0]) / map_dim * (cmap - 1.0)
        coord = jnp.clip(coord, 0.0, cmap - 1.0)
        i0 = jnp.clip(jnp.floor(coord).astype(jnp.int32), 0,
                      jnp.asarray(self.cmap_dim, jnp.int32) - 2)
        frac = coord - i0.astype(x.dtype)
        dim = self.dim
        out = 0.0
        for corner in range(2 ** dim):
            offs = jnp.array([(corner >> d) & 1 for d in range(dim)],
                             dtype=jnp.int32)
            idx = i0 + offs
            w = jnp.prod(jnp.where(offs.astype(bool), frac, 1.0 - frac),
                         axis=-1)
            vals = self.sdf_grid[tuple(jnp.moveaxis(idx, -1, 0))]
            out = out + w * vals
        return out

    # Reference-compatible aliases (grid_map_sdf.py:75-82).
    def __call__(self, x):
        return self.signed_distance(x)

    def compute_signed_distance(self, x):
        return self.signed_distance(x)

    def compute_cost(self, x):
        return self.signed_distance(x)
