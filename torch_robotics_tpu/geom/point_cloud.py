"""Point-cloud obstacles: large sphere sets backed by the Pallas SDF kernel.

A new capability beyond the reference's hand-placed primitive envs: perceived
obstacles (depth-camera point clouds, sphere-decomposed meshes) become a
``PointCloudSpheres`` field with hundreds to thousands of spheres.  Queries
route to the fused MXU Pallas kernel (ops/pallas_sdf.py), which streams
(points x spheres) tiles through VMEM without materializing the distance
matrix in HBM; small clouds fall back to the jnp path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.pytrees import pytree_dataclass, static_field

__all__ = ["PointCloudSpheres"]

_PALLAS_MIN_SPHERES = 128


@pytree_dataclass
class PointCloudSpheres:
    """Sphere cloud: centers (S, 3), radii (S,) (or a shared scalar radius)."""
    centers: jnp.ndarray
    radii: jnp.ndarray
    use_pallas: bool = static_field(default=True)

    @classmethod
    def create(cls, centers, radius=0.02, dtype=jnp.float32,
               use_pallas: bool = True):
        centers = jnp.asarray(centers, dtype)
        radii = jnp.broadcast_to(jnp.asarray(radius, dtype),
                                 centers.shape[:1])
        return cls(centers=centers, radii=radii, use_pallas=use_pallas)

    @property
    def dim(self) -> int:
        return self.centers.shape[-1]

    def signed_distance(self, x):
        """x: (..., 3) -> (...,) min over the cloud."""
        S = self.centers.shape[0]
        flat = x.reshape(-1, x.shape[-1])
        on_tpu = jax.default_backend() not in ("cpu",)
        if self.use_pallas and S >= _PALLAS_MIN_SPHERES and on_tpu \
                and x.shape[-1] == 3:
            from ..ops.pallas_sdf import sphere_sdf_pallas
            out = sphere_sdf_pallas(flat, self.centers, self.radii)
        else:
            d = jnp.linalg.norm(flat[:, None, :] - self.centers[None], axis=-1)
            out = jnp.min(d - self.radii, axis=-1)
        return out.reshape(x.shape[:-1])

    compute_signed_distance = signed_distance
