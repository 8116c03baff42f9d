"""Multi-robot embodiment: several arms in one configuration space with
mutual-collision costs.

Greenfield capability required by the north star (BASELINE.json configs:
"UR10 + dual-arm Panda: multi-robot mutual-collision costs in receding-
horizon MPC loop").  A ``MultiRobot`` concatenates the member robots'
configuration spaces, places each member at a fixed base pose, and exposes:

- object-collision points = union of members' object-collision points
  (with their margins);
- self-collision pairs = each member's own pairs PLUS mutual pairs between
  every cross-member pair of object-collision points, with margin =
  margin_i + margin_j (sphere-sphere clearance).

The result plugs into ``PlanningTask`` unchanged, and provides analytic
point Jacobians (block-diagonal across members) for the Gauss-Newton fast
path.
"""
from __future__ import annotations

import itertools
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..core.pytrees import pytree_dataclass, static_field
from .base import RobotAPI

__all__ = ["MultiRobot"]


@pytree_dataclass
class MultiRobot(RobotAPI):
    robots: tuple                      # member robot pytrees
    base_rots: jnp.ndarray             # (n, 3, 3) world base rotations
    base_trans: jnp.ndarray            # (n, 3) world base translations
    q_min: jnp.ndarray
    q_max: jnp.ndarray
    object_margins: jnp.ndarray        # concat of member object margins
    self_margins: jnp.ndarray          # member pairs + mutual pairs
    name: str = static_field(default="MultiRobot")
    q_dims: tuple = static_field(default=())
    obj_counts: tuple = static_field(default=())    # P_obj per member
    self_counts: tuple = static_field(default=())   # P_self per member
    object_coll_idxs: tuple = static_field(default=())
    self_coll_idxs: tuple = static_field(default=())
    self_pair_idxs: tuple = static_field(default=())
    dt: float = static_field(default=1.0)

    @classmethod
    def create(cls, robots: Sequence, base_poses: Sequence, dt: float = 1.0,
               mutual_collision: bool = True, dtype=jnp.float32):
        """robots: member robots (ws_dim 3); base_poses: list of (R, t)."""
        robots = tuple(robots)
        base_rots = jnp.stack([jnp.asarray(R, dtype) for R, _ in base_poses])
        base_trans = jnp.stack([jnp.asarray(t, dtype) for _, t in base_poses])

        q_min = jnp.concatenate([r.q_min for r in robots])
        q_max = jnp.concatenate([r.q_max for r in robots])
        q_dims = tuple(r.q_dim for r in robots)

        obj_counts = tuple(int(r.object_margins.shape[0]) for r in robots)
        margins = jnp.concatenate([r.object_margins for r in robots])

        # layout of the fk output: [obj_0 .. obj_n, self_0 .. self_n]
        self_counts = []
        for r in robots:
            if r.self_coll_idxs is not None and len(r.self_coll_idxs):
                self_counts.append(len(r.self_coll_idxs)
                                   + r.grasped_n_points)
            else:
                self_counts.append(0)
        self_counts = tuple(self_counts)

        n_obj_total = sum(obj_counts)
        obj_offsets = np.cumsum([0] + list(obj_counts))[:-1]
        self_offsets = n_obj_total + np.cumsum([0] + list(self_counts))[:-1]

        pair_idxs = []
        self_margin_list = []
        for i, r in enumerate(robots):
            if self_counts[i] == 0:
                continue
            own = np.asarray(r.self_pair_idxs)
            pair_idxs.extend((self_offsets[i] + a, self_offsets[i] + b)
                             for a, b in own)
            self_margin_list.extend(np.asarray(r.self_margins).tolist())
        if mutual_collision:
            for i, j in itertools.combinations(range(len(robots)), 2):
                mi = np.asarray(robots[i].object_margins)
                mj = np.asarray(robots[j].object_margins)
                for a in range(obj_counts[i]):
                    for b in range(obj_counts[j]):
                        pair_idxs.append((obj_offsets[i] + a,
                                          obj_offsets[j] + b))
                        self_margin_list.append(float(mi[a]) + float(mj[b]))

        return cls(
            robots=robots, base_rots=base_rots, base_trans=base_trans,
            q_min=q_min, q_max=q_max,
            object_margins=margins,
            self_margins=jnp.asarray(np.asarray(self_margin_list), dtype),
            q_dims=q_dims, obj_counts=obj_counts, self_counts=self_counts,
            object_coll_idxs=tuple(range(n_obj_total)),
            # pair indices address the FULL fk layout (mutual pairs live in
            # the object sections), so the self-point selection is identity
            self_coll_idxs=tuple(range(n_obj_total + sum(self_counts))),
            self_pair_idxs=tuple(pair_idxs),
            dt=dt,
        )

    @property
    def ws_dim(self) -> int:
        return 3

    def _split_q(self, q):
        out, i = [], 0
        for d in self.q_dims:
            out.append(q[..., i:i + d])
            i += d
        return out

    def fk_map_collision(self, q):
        """q: (..., sum d_i) -> (..., P_obj_total + P_self_total, 3)."""
        qs = self._split_q(q)
        obj_parts, self_parts = [], []
        for i, (r, qi) in enumerate(zip(self.robots, qs)):
            pts_full = r.fk_map_collision(qi)
            R_b, t_b = self.base_rots[i], self.base_trans[i]
            obj = r.object_collision_points(pts_full)
            obj_parts.append(jnp.einsum("ij,...pj->...pi", R_b, obj) + t_b)
            if self.self_counts[i] > 0:
                sp = r.self_collision_points(pts_full)
                self_parts.append(jnp.einsum("ij,...pj->...pi", R_b, sp) + t_b)
        return jnp.concatenate(obj_parts + self_parts, axis=-2)

    def fk_map_collision_with_jac(self, q):
        """Points + block-diagonal analytic Jacobians (..., P, 3, sum d_i)."""
        qs = self._split_q(q)
        d_total = self.q_dim
        obj_pts, obj_jacs, self_pts, self_jacs = [], [], [], []
        offset = 0
        for i, (r, qi) in enumerate(zip(self.robots, qs)):
            pts_full, J_full = r.fk_map_collision_with_jac(qi)
            R_b, t_b = self.base_rots[i], self.base_trans[i]
            d_i = self.q_dims[i]

            def place(J):
                J = jnp.einsum("ij,...pjk->...pik", R_b, J)
                pad_before = jnp.zeros(J.shape[:-1] + (offset,), J.dtype)
                pad_after = jnp.zeros(
                    J.shape[:-1] + (d_total - offset - d_i,), J.dtype)
                return jnp.concatenate([pad_before, J, pad_after], axis=-1)

            obj = r.object_collision_points(pts_full)
            obj_pts.append(jnp.einsum("ij,...pj->...pi", R_b, obj) + t_b)
            obj_jacs.append(place(r.select_collision_jacobians(
                J_full, r.object_coll_idxs, r.object_interpolate,
                r.object_num_interp)))
            if self.self_counts[i] > 0:
                sp = r.self_collision_points(pts_full)
                self_pts.append(jnp.einsum("ij,...pj->...pi", R_b, sp) + t_b)
                self_jacs.append(place(r.select_collision_jacobians(
                    J_full, r.self_coll_idxs)))
            offset += d_i
        pts = jnp.concatenate(obj_pts + self_pts, axis=-2)
        J = jnp.concatenate(obj_jacs + self_jacs, axis=-3)
        return pts, J
