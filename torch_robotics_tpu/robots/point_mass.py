"""Point-mass robots (2-D / 3-D): identity FK.

Mirrors the reference ``RobotPointMass`` / ``RobotPointMass3D``
(/root/reference/torch_robotics/robots/robot_point_mass.py:13-108).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..geom.sdf import _pytree_dataclass, static_field
from .base import RobotAPI

__all__ = ["RobotPointMass", "RobotPointMass3D"]


@_pytree_dataclass
class RobotPointMass(RobotAPI):
    q_min: jnp.ndarray
    q_max: jnp.ndarray
    object_margins: jnp.ndarray
    name: str = static_field(default="RobotPointMass")
    object_coll_idxs: tuple = static_field(default=(0,))
    dt: float = static_field(default=1.0)

    @classmethod
    def create(cls, q_limits=((-1.0, -1.0), (1.0, 1.0)), margin=0.01,
               dt=1.0, name="RobotPointMass", dtype=jnp.float32):
        q_limits = jnp.asarray(q_limits, dtype)
        return cls(q_min=q_limits[0], q_max=q_limits[1],
                   object_margins=jnp.asarray([margin], dtype),
                   name=name, dt=dt)

    @property
    def ws_dim(self) -> int:
        return self.q_dim

    def fk_map_collision(self, q):
        """Identity FK: one task-space point per configuration
        (robot_point_mass.py:29-32)."""
        return q[..., None, :]

    def fk_map_collision_with_jac(self, q):
        d = self.q_dim
        J = jnp.broadcast_to(jnp.eye(d, dtype=q.dtype),
                             q.shape[:-1] + (1, d, d))
        return q[..., None, :], J


def RobotPointMass3D(margin=0.01, dt=1.0, dtype=jnp.float32):
    return RobotPointMass.create(
        q_limits=((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)), margin=margin, dt=dt,
        name="RobotPointMass3D", dtype=dtype)
