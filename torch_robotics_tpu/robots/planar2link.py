"""Planar 2-link arm with closed-form FK.

Mirrors the reference ``RobotPlanar2Link``
(/root/reference/torch_robotics/robots/robot_planar2link.py:8-49) with link
lengths l1 = 0.2, l2 = 0.4.  Collision points are the 3 joint/EE positions
interpolated to ``object_num_interp`` points along the arm (the reference
builds margins for 10->12 interpolated points, robot_base.py:58-74).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..geom.sdf import _pytree_dataclass, static_field
from .base import RobotAPI, build_object_margins

__all__ = ["RobotPlanar2Link"]


@_pytree_dataclass
class RobotPlanar2Link(RobotAPI):
    q_min: jnp.ndarray
    q_max: jnp.ndarray
    object_margins: jnp.ndarray
    l1: float = static_field(default=0.2)
    l2: float = static_field(default=0.4)
    name: str = static_field(default="RobotPlanar2Link")
    object_coll_idxs: tuple = static_field(default=(0, 1, 2))
    object_interpolate: bool = static_field(default=True)
    object_num_interp: int = static_field(default=12)
    dt: float = static_field(default=1.0)

    @classmethod
    def create(cls, margin=0.01, num_interpolated_points=10, dt=1.0,
               dtype=jnp.float32):
        margins, _, num_interp = build_object_margins(
            [margin] * 3, num_interpolated_points, dtype=dtype)
        eps = 0.01
        q_limits = jnp.asarray(
            [[-np.pi, -np.pi + eps], [np.pi, np.pi - eps]], dtype)
        return cls(q_min=q_limits[0], q_max=q_limits[1],
                   object_margins=margins, object_num_interp=num_interp, dt=dt)

    @property
    def ws_dim(self) -> int:
        return 2

    def link_positions(self, q):
        """Closed-form joint/EE positions (robot_planar2link.py:29-40).

        q: (..., 2) -> (p0, p1, p2) each (..., 2)
        """
        p0 = jnp.zeros(q.shape[:-1] + (2,), q.dtype)
        c1 = jnp.cos(q[..., 0]) * self.l1
        s1 = jnp.sin(q[..., 0]) * self.l1
        p1 = jnp.stack([c1, s1], axis=-1)
        c12 = jnp.cos(q[..., 0] + q[..., 1]) * self.l2
        s12 = jnp.sin(q[..., 0] + q[..., 1]) * self.l2
        p2 = p1 + jnp.stack([c12, s12], axis=-1)
        return p0, p1, p2

    def fk_map_collision(self, q):
        """q: (..., 2) -> (..., 3, 2) link points on a dedicated axis."""
        p0, p1, p2 = self.link_positions(q)
        return jnp.stack([p0, p1, p2], axis=-2)

    def fk_map_collision_with_jac(self, q):
        """Closed-form point Jacobians of the 3 link points: (..., 3, 2, 2)."""
        pts = self.fk_map_collision(q)
        s1 = jnp.sin(q[..., 0]) * self.l1
        c1 = jnp.cos(q[..., 0]) * self.l1
        s12 = jnp.sin(q[..., 0] + q[..., 1]) * self.l2
        c12 = jnp.cos(q[..., 0] + q[..., 1]) * self.l2
        zero = jnp.zeros_like(s1)
        J0 = jnp.stack([zero, zero, zero, zero], axis=-1)
        J1 = jnp.stack([-s1, zero, c1, zero], axis=-1)
        J2 = jnp.stack([-s1 - s12, -s12, c1 + c12, c12], axis=-1)
        J = jnp.stack([J0, J1, J2], axis=-2)
        return pts, J.reshape(J.shape[:-1] + (2, 2))
