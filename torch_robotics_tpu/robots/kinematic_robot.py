"""Generic URDF-backed robot embodiment + the UR10 instance.

The reference only wraps the Panda (robots/robot_panda.py); this generic
class turns any compiled ``KinematicModel`` plus a collision-link/margin
table into a full embodiment (needed e.g. for the UR10 + dual-Panda
multi-robot MPC config in BASELINE.json).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..core.pytrees import pytree_dataclass, static_field
from ..kin import KinematicModel, fk_all_links, fk_rot_trans, robot_zoo
from .base import RobotAPI, build_object_margins, build_self_collision_pairs

__all__ = ["KinematicRobot", "RobotUR10"]


@pytree_dataclass
class KinematicRobot(RobotAPI):
    model: KinematicModel
    q_min: jnp.ndarray
    q_max: jnp.ndarray
    object_margins: jnp.ndarray
    self_margins: jnp.ndarray
    name: str = static_field(default="KinematicRobot")
    object_coll_idxs: tuple = static_field(default=())
    self_coll_idxs: tuple = static_field(default=())
    self_pair_idxs: tuple = static_field(default=())
    link_name_ee: str = static_field(default="ee_link")
    dt: float = static_field(default=1.0)

    @classmethod
    def create(cls, model: KinematicModel,
               object_coll_links: Sequence[str],
               object_coll_margins: Sequence[float],
               self_coll_pairs: Optional[dict] = None,
               self_collision_margin: float = 0.05,
               link_name_ee: str = "ee_link",
               name: str = "KinematicRobot", dt: float = 1.0,
               dtype=jnp.float32):
        name_to_idx = {n: i for i, n in enumerate(model.link_names)}
        object_coll_idxs = tuple(name_to_idx[n] for n in object_coll_links)
        object_margins, _, _ = build_object_margins(
            list(object_coll_margins), len(object_coll_links), dtype=dtype)

        self_coll_idxs = ()
        pair_tuple = ()
        self_margins = jnp.zeros((0,), dtype)
        if self_coll_pairs:
            self_names = []
            for k, v in self_coll_pairs.items():
                self_names.append(k)
                self_names.extend(v)
            self_names = sorted(set(self_names))
            self_coll_idxs = tuple(name_to_idx[n] for n in self_names)
            pair_idxs, self_margins = build_self_collision_pairs(
                self_names, self_coll_pairs, points_per_link=1,
                margin_robot=self_collision_margin, dtype=dtype)
            pair_tuple = tuple(map(tuple, pair_idxs.tolist()))

        return cls(model=model, q_min=model.q_lower, q_max=model.q_upper,
                   object_margins=object_margins, self_margins=self_margins,
                   name=name, object_coll_idxs=object_coll_idxs,
                   self_coll_idxs=self_coll_idxs or None,
                   self_pair_idxs=pair_tuple or None,
                   link_name_ee=link_name_ee, dt=dt)

    @property
    def ws_dim(self) -> int:
        return 3

    def fk_map_collision(self, q):
        # lane-layout FK for batched calls (the AoS (B, 3, 3) rotation path
        # tile-pads ~40x on TPU, ops/lanes_fk.py); per-sample/vmapped calls
        # (q.ndim == 1) keep AoS — vmap would batch the lanes scalars into
        # trailing-dim-1 (B, 1) arrays (128x padding, exploded graph)
        if jnp.asarray(q).ndim == 1:
            _, t = fk_rot_trans(self.model, q)
            return t
        from ..ops.lanes_fk import fk_positions_lanes
        return fk_positions_lanes(self.model, q)

    def fk_map_collision_with_jac(self, q):
        if jnp.asarray(q).ndim == 1:
            from ..kin.fk import point_jacobians
            R, t = fk_rot_trans(self.model, q)
            J = point_jacobians(self.model, R, t, t,
                                list(range(self.model.n_links)), q=q)
            return t, J
        from ..ops.lanes_fk import fk_points_jacobians_lanes
        return fk_points_jacobians_lanes(self.model, q)

    def get_EE_pose(self, q):
        return fk_all_links(self.model, q, link_list=[self.link_name_ee])

    def get_EE_position(self, q):
        return self.get_EE_pose(q)[..., 0, :3, 3]

    # grasped-object plumbing defaults
    grasped_n_points = 0


UR10_OBJECT_COLL_LINKS = [
    "shoulder_link", "upper_arm_link", "forearm_link",
    "wrist_1_link", "wrist_2_link", "wrist_3_link",
]
UR10_OBJECT_COLL_MARGINS = [0.15, 0.12, 0.1, 0.08, 0.08, 0.08]
UR10_SELF_COLL_PAIRS = {
    "forearm_link": ["base_link"],
    "wrist_1_link": ["base_link", "shoulder_link"],
    "wrist_3_link": ["base_link", "shoulder_link", "upper_arm_link"],
}


def RobotUR10(dt: float = 1.0, dtype=jnp.float32) -> KinematicRobot:
    """UR10 embodiment with a sphere-margin collision model."""
    model = robot_zoo.ur10()
    return KinematicRobot.create(
        model,
        object_coll_links=UR10_OBJECT_COLL_LINKS,
        object_coll_margins=UR10_OBJECT_COLL_MARGINS,
        self_coll_pairs=UR10_SELF_COLL_PAIRS,
        link_name_ee="ee_link", name="RobotUR10", dt=dt, dtype=dtype)
