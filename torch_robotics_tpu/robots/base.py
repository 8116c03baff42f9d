"""Robot embodiments: configuration space + collision model + FK map.

TPU-native re-design of the reference ``RobotBase``
(/root/reference/torch_robotics/robots/robot_base.py): a robot is a frozen
dataclass pytree carrying joint limits and the collision-model arrays
(collision link indices, per-point margins, self-collision pair indices), with
a pure ``fk_map_collision(q) -> (..., P, ws_dim)`` map.

The self-collision pair-index construction follows the reference exactly
(robot_base.py:105-141): points are grouped per configured link
(points_per_link p), and for each (link_1 -> link_2) entry of the pairs dict
all p x p point pairs are added, with per-pair margins; grasped-object points
add pairs against the configured links.

Deviations from the reference (documented):
- ``fk_map_collision`` stacks link points on a dedicated axis for every robot
  (the reference's planar-2-link concatenated along the batch axis,
  robot_planar2link.py:42-49, which breaks for batched trajectories);
- interpolated collision points and margins are kept consistent (the
  reference builds interpolated margins but never interpolates points in the
  default pipeline, robot_base.py:70-74 vs distance_fields.py:134-155).
"""
from __future__ import annotations

import dataclasses
import itertools
from math import ceil
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..costs.fields import interpolate_points

__all__ = ["RobotAPI", "build_self_collision_pairs", "build_object_margins"]


def build_object_margins(link_margins: Sequence[float], num_interpolated: int,
                         grasped_n_points: int = 0,
                         grasped_margin: float = 0.001, dtype=jnp.float32):
    """Per-collision-point margins with interpolation + grasped-object rows.

    Mirrors robot_base.py:58-82: margins are repeat-interleaved to the number
    of interpolated points per link; grasped-object points append their own
    margin rows.  Returns (margins (P,), points_per_link, total points).
    """
    n_links = len(link_margins)
    assert num_interpolated >= n_links
    if num_interpolated % n_links != 0:
        per_link = ceil(num_interpolated / n_links)
        num_interpolated = per_link * n_links
    else:
        per_link = num_interpolated // n_links
    margins = np.repeat(np.asarray(link_margins, np.float64), per_link)
    if grasped_n_points > 0:
        margins = np.concatenate(
            [margins, np.full(grasped_n_points, grasped_margin)])
    return jnp.asarray(margins, dtype), per_link, num_interpolated


def build_self_collision_pairs(
        link_names: Sequence[str], pairs: dict, points_per_link: int,
        margin_robot: float, grasped_n_points: int = 0,
        grasped_links: Optional[Sequence[str]] = None,
        grasped_margin: float = 0.05, dtype=jnp.float32):
    """Pair index matrix + margins (robot_base.py:105-141)."""
    p = points_per_link
    idxs = []
    margins = []
    for i, link_1 in enumerate(link_names):
        if link_1 in pairs:
            for link_2 in pairs[link_1]:
                j = link_names.index(link_2)
                for m, n in itertools.product(range(p), range(p)):
                    idxs.append((i * p + m, j * p + n))
                    margins.append(margin_robot)
    if grasped_n_points > 0 and grasped_links:
        base = len(link_names) * p
        for link_1 in grasped_links:
            j = link_names.index(link_1)
            for m, n in itertools.product(range(grasped_n_points), range(p)):
                idxs.append((base + m, j * p + n))
                margins.append(grasped_margin)
    return (np.asarray(idxs, np.int32) if idxs else np.zeros((0, 2), np.int32),
            jnp.asarray(np.asarray(margins), dtype))


class RobotAPI:
    """Shared robot behavior (mixin over the concrete robot dataclasses).

    Mirrors RobotBase's state accessors (robot_base.py:143-174): states
    ``x = [q, qd, qdd]`` concatenated on the last axis; missing derivatives
    fall back to finite differences along the horizon axis.
    """
    dt: float = 1.0

    @property
    def q_dim(self) -> int:
        return self.q_min.shape[-1]

    def random_q(self, key, n_samples: int = 10):
        u = jax.random.uniform(key, (n_samples, self.q_dim),
                               dtype=self.q_min.dtype)
        return self.q_min + u * (self.q_max - self.q_min)

    def get_position(self, x):
        return x[..., :self.q_dim]

    def get_velocity(self, x):
        from ..core.utils import finite_difference_vector
        if x.shape[-1] >= 2 * self.q_dim:
            return x[..., self.q_dim:2 * self.q_dim]
        return finite_difference_vector(x, dt=self.dt, method="central")

    def get_acceleration(self, x):
        from ..core.utils import finite_difference_vector
        if x.shape[-1] >= 3 * self.q_dim:
            return x[..., 2 * self.q_dim:3 * self.q_dim]
        return finite_difference_vector(self.get_velocity(x), dt=self.dt,
                                        method="central")

    def distance_q(self, q1, q2):
        return jnp.linalg.norm(q1 - q2, axis=-1)

    # ------------------------------------------------------------------
    # Collision model plumbing shared by the fields
    # ------------------------------------------------------------------
    def fk_map_collision(self, q):
        """q: (..., q_dim) -> all collision-relevant points (..., P, ws_dim)."""
        raise NotImplementedError

    def fk_map_collision_with_jac(self, q):
        """q: (..., q_dim) -> (points (..., P, ws_dim),
        J (..., P, ws_dim, q_dim)) analytic point Jacobians.

        Optional fast path for Gauss-Newton solvers; robots without it fall
        back to autodiff through ``fk_map_collision``.
        """
        raise NotImplementedError

    def select_collision_jacobians(self, J_full, idxs, interpolate=False,
                                   num_interp=0):
        """Apply the same selection/interpolation as the point selectors to a
        stack of per-point Jacobians (interpolation is linear, so Jacobians
        interpolate identically)."""
        J = J_full[..., np.asarray(idxs), :, :]
        if interpolate:
            P, dim, d = J.shape[-3:]
            J_flat = J.reshape(J.shape[:-2] + (dim * d,))
            J_flat = interpolate_points(J_flat, num_interp)
            J = J_flat.reshape(J_flat.shape[:-1] + (dim, d))
        if self.grasped_n_points > 0:
            J = jnp.concatenate(
                [J, J_full[..., -self.grasped_n_points:, :, :]], axis=-3)
        return J

    def object_collision_points(self, link_pos):
        """Select/interpolate the object-collision points from fk output."""
        pts = link_pos[..., np.asarray(self.object_coll_idxs), :]
        if self.object_interpolate:
            pts = interpolate_points(pts, self.object_num_interp)
        if self.grasped_n_points > 0:
            pts = jnp.concatenate(
                [pts, link_pos[..., -self.grasped_n_points:, :]], axis=-2)
        return pts

    def self_collision_points(self, link_pos):
        if self.self_coll_idxs is None:
            return None
        pts = link_pos[..., np.asarray(self.self_coll_idxs), :]
        if self.grasped_n_points > 0:
            pts = jnp.concatenate(
                [pts, link_pos[..., -self.grasped_n_points:, :]], axis=-2)
        return pts

    # defaults (overridden by concrete robots)
    self_coll_idxs = None
    self_pair_idxs = None
    grasped_n_points = 0
    object_interpolate = False
    object_num_interp = 0
