"""Binary occupancy grids for sampling-based collision checking.

TPU-native analogue of the reference ``OccupancyMap``
(/root/reference/torch_robotics/environments/occupancy_map.py).  The map is
rasterized directly from the analytic SDF (cell occupied iff sdf <= 0 at the
cell center) instead of the reference's per-primitive cell loops
(primitives.py:118-171) — same occupancy semantics, one fused XLA sweep.
The lookup (``get_collisions``) reproduces the reference cell indexing
(occupancy_map.py:100-127): cells are centered on the workspace origin.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .sdf import _pytree_dataclass, static_field

__all__ = ["OccupancyMap", "build_occupancy_map"]


@_pytree_dataclass
class OccupancyMap:
    map: jnp.ndarray             # cmap_dim binary grid (float 0/1)
    cell_size: float = static_field(default=0.01)
    cmap_dim: tuple = static_field(default=())

    @property
    def dim(self) -> int:
        return len(self.cmap_dim)

    @property
    def origin(self):
        return np.array([d // 2 for d in self.cmap_dim])

    def get_collisions(self, x):
        """x: (..., dim) world points -> occupancy value at each point."""
        offset = jnp.asarray(self.origin, x.dtype)
        idx = jnp.floor(x / self.cell_size + offset).astype(jnp.int32)
        max_idx = jnp.asarray(self.cmap_dim, jnp.int32) - 1
        idx = jnp.clip(idx, 0, max_idx)
        return self.map[tuple(jnp.moveaxis(idx, -1, 0))]

    def compute_distances(self, x, occupied_points=None):
        """Euclidean distances from x to occupied cell centers.

        Mirrors the reference ``OccupancyMap.compute_distances``
        (occupancy_map.py:131-143): when ``occupied_points`` is omitted the
        occupied cells are computed here (host-side ``nonzero`` — the result
        shape is data-dependent, so like the reference this path is eager;
        pass precomputed points for use under jit).
        """
        if occupied_points is None:
            occupied_points = jnp.asarray(self.occupied_points(), x.dtype)
        return jnp.linalg.norm(x[..., None, :] - occupied_points, axis=-1)

    def occupied_points(self):
        """Host-side: world coordinates of occupied cells (static shapes)."""
        idxs = np.argwhere(np.asarray(self.map) > 0)
        return (idxs - self.origin) * self.cell_size

    def compute_cost(self, x):
        return self.get_collisions(x)

    def plot(self, ax=None, save_path=None):
        """Render the occupancy grid (reference ``OccupancyMap.plot``,
        occupancy_map.py:146-168): 2D filled contours / 3D voxels.

        Returns the matplotlib axis; saves the figure when ``save_path``.
        """
        import matplotlib.pyplot as plt
        grid = np.asarray(self.map)
        if ax is None:
            if self.dim == 2:
                _, ax = plt.subplots()
            else:
                ax = plt.figure().add_subplot(projection="3d")
        if self.dim == 2:
            axes = [(np.arange(self.cmap_dim[d]) - self.origin[d])
                    * self.cell_size for d in range(2)]
            # contourf(x, y, Z) expects Z[y, x]; the grid is 'ij'-indexed
            ax.contourf(axes[0], axes[1], np.clip(grid.T, 0, 1), 2,
                        cmap="Greys")
        else:
            coords = np.indices(np.array(grid.shape) + 1, dtype=float)
            coords = [(coords[d] - self.origin[d]) * self.cell_size
                      for d in range(3)]
            ax.voxels(coords[0], coords[1], coords[2], grid > 0,
                      facecolors="gray", edgecolor="black", shade=False,
                      alpha=0.05)
        if save_path is not None:
            ax.figure.savefig(save_path, dpi=120)
        return ax


def build_occupancy_map(limits, cell_size, obj_list, chunk=8192):
    """Rasterize objects into a binary occupancy grid.

    Cells are laid out as in the reference OccupancyMap: the grid spans
    ``map_dim = limits[1]-limits[0]`` centered on the origin of that box,
    with cmap_dim = ceil(map_dim / cell).
    """
    limits = jnp.asarray(limits)
    dim = limits.shape[-1]
    map_dim = np.abs(np.asarray(limits[1] - limits[0]))
    cmap_dim = tuple(int(np.ceil(map_dim[d] / cell_size)) for d in range(dim))
    origin = np.array([d // 2 for d in cmap_dim])
    # cell-center world coordinates, matching get_collisions' inverse mapping
    axes = [(jnp.arange(cmap_dim[d]) - origin[d]) * cell_size
            for d in range(dim)]
    mesh = jnp.meshgrid(*axes, indexing="ij")
    points = jnp.stack([m.reshape(-1) for m in mesh], axis=-1)

    def occ_chunk(p):
        sdf = None
        for obj in obj_list:
            s = obj.signed_distance(p)
            sdf = s if sdf is None else jnp.minimum(sdf, s)
        return (sdf <= 0.0).astype(jnp.float32)

    n = points.shape[0]
    pad = (-n) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0))).reshape(-1, chunk, dim)
    occ = jax.lax.map(occ_chunk, pts).reshape(-1)[:n]
    return OccupancyMap(map=occ.reshape(cmap_dim), cell_size=cell_size,
                        cmap_dim=cmap_dim)
