"""Franka Panda embodiment: URDF kinematics + sphere collision model.

Mirrors the reference ``RobotPanda``
(/root/reference/torch_robotics/robots/robot_panda.py:21-184): object-collision
links {panda_link2,3,5,7,hand} with margins {.125,.125,.13,.1,.08}
(robot_panda.py:47-71), self-collision pair table (robot_panda.py:81-106), and
optional grasped-object collision points transformed by the hand FK
(robot_panda.py:153-168).
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..geom.sdf import _pytree_dataclass, static_field
from ..kin import KinematicModel, fk_all_links, robot_zoo
from .base import RobotAPI, build_object_margins, build_self_collision_pairs

__all__ = ["RobotPanda", "PANDA_OBJECT_COLL_LINKS", "PANDA_OBJECT_COLL_MARGINS",
           "PANDA_SELF_COLL_PAIRS"]

PANDA_OBJECT_COLL_LINKS = [
    "panda_link2", "panda_link3", "panda_link5", "panda_link7", "panda_hand",
]
PANDA_OBJECT_COLL_MARGINS = [0.125, 0.125, 0.13, 0.1, 0.08]

PANDA_SELF_COLL_PAIRS = OrderedDict({
    "panda_link4": ["panda_link1"],
    "panda_link5": ["panda_link0", "panda_link1", "panda_link2"],
    "panda_link6": ["panda_link0", "panda_link1", "panda_link2"],
    "panda_hand": ["panda_link0", "panda_link1", "panda_link2"],
})
PANDA_SELF_COLL_LINKS_GRASPED = [
    "panda_link0", "panda_link1", "panda_link2", "panda_link3",
]


@_pytree_dataclass
class RobotPanda(RobotAPI):
    model: KinematicModel
    q_min: jnp.ndarray
    q_max: jnp.ndarray
    object_margins: jnp.ndarray
    self_margins: jnp.ndarray
    grasped_points: jnp.ndarray          # (G, 3) in object frame (G may be 0)
    # learned self-collision SDF replacing the pair-distance field when set
    # (the reference's STORM override, robot_panda.py:131-136)
    self_collision_net: object = None
    name: str = static_field(default="RobotPanda")
    object_coll_idxs: tuple = static_field(default=())
    self_coll_idxs: tuple = static_field(default=())
    self_pair_idxs: tuple = static_field(default=())  # tuple of (i, j)
    grasped_n_points: int = static_field(default=0)
    link_name_ee: str = static_field(default="ee_link")
    link_name_grasped_object: str = static_field(default="grasped_object")
    dt: float = static_field(default=1.0)

    @classmethod
    def create(cls, grasped_object=None, dt=1.0,
               margin_for_grasped_object_collision_checking=0.001,
               self_collision_margin_robot=0.05,
               self_collision_margin_grasped_object=0.05,
               use_learned_self_collision: bool = False,
               self_collision_net_path=None,
               dtype=jnp.float32):
        """``use_learned_self_collision`` swaps the pair-distance
        self-collision field for the learned SDF net — the reference's
        ``use_self_collision_storm`` (robot_panda.py:131-136).  Like the
        reference it is incompatible with a grasped object (the net was not
        trained with one).  ``self_collision_net_path`` overrides the bundled
        npz checkpoint."""
        self_collision_net = None
        if use_learned_self_collision:
            assert grasped_object is None, (
                "learned self-collision model does not cover grasped objects"
                " (train a net for the grasping robot instead); see reference"
                " robot_panda.py:131-134")
            from ..costs.self_collision_net import SelfCollisionNet
            if self_collision_net_path is None:
                from ..utils.files import get_data_path
                self_collision_net_path = (
                    get_data_path() / "panda_self_collision_net.npz")
            self_collision_net = SelfCollisionNet.from_npz(
                self_collision_net_path)
        model = robot_zoo.franka_panda(grasped_object=grasped_object)
        name_to_idx = {n: i for i, n in enumerate(model.link_names)}

        grasped_n = 0
        grasped_points = jnp.zeros((0, 3), dtype)
        if grasped_object is not None:
            grasped_points = jnp.asarray(
                grasped_object.base_points_for_collision, dtype)
            grasped_n = grasped_points.shape[0]

        object_coll_idxs = tuple(name_to_idx[n] for n in PANDA_OBJECT_COLL_LINKS)
        object_margins, _, _ = build_object_margins(
            PANDA_OBJECT_COLL_MARGINS, len(PANDA_OBJECT_COLL_LINKS),
            grasped_n_points=grasped_n,
            grasped_margin=margin_for_grasped_object_collision_checking,
            dtype=dtype)

        # unique sorted self-collision link names (robot_panda.py:94-101)
        self_names = []
        for k, v in PANDA_SELF_COLL_PAIRS.items():
            self_names.append(k)
            self_names.extend(v)
        self_names.extend(PANDA_SELF_COLL_LINKS_GRASPED)
        self_names = sorted(set(self_names))
        self_coll_idxs = tuple(name_to_idx[n] for n in self_names)
        pair_idxs, self_margins = build_self_collision_pairs(
            self_names, PANDA_SELF_COLL_PAIRS, points_per_link=1,
            margin_robot=self_collision_margin_robot,
            grasped_n_points=grasped_n,
            grasped_links=PANDA_SELF_COLL_LINKS_GRASPED,
            grasped_margin=self_collision_margin_grasped_object,
            dtype=dtype)

        return cls(
            model=model,
            q_min=model.q_lower, q_max=model.q_upper,
            object_margins=object_margins, self_margins=self_margins,
            grasped_points=grasped_points,
            self_collision_net=self_collision_net,
            object_coll_idxs=object_coll_idxs,
            self_coll_idxs=self_coll_idxs,
            self_pair_idxs=tuple(map(tuple, pair_idxs.tolist())),
            grasped_n_points=grasped_n,
            dt=dt,
        )

    @property
    def ws_dim(self) -> int:
        return 3

    def fk_map_collision(self, q):
        """q: (..., 7) -> (..., n_links [+ G], 3) world link positions.

        All link positions (URDF order) plus, when grasping, the object's
        collision base points transformed by the grasped-object frame
        (robot_panda.py:138-170).  Batched calls route through the
        lane-layout FK chain (ops/lanes_fk.py) — the AoS (B, 3, 3) rotation
        path tile-pads ~40x on TPU; values identical.  Per-sample calls
        (q.ndim == 1, e.g. under jax.vmap) keep the AoS path: the lanes
        reshape would make every scalar a trailing-dim-1 array, which vmap
        batches into (B, 1) lanes — 128x tile padding and an exploded graph.
        """
        if jnp.asarray(q).ndim == 1:
            return self._fk_map_collision_aos(q)
        from ..ops.lanes_fk import fk_positions_lanes
        extra = None
        if self.grasped_n_points > 0:
            gi = self.model.link_index(self.link_name_grasped_object)
            extra = [(gi, self.grasped_points[g])
                     for g in range(self.grasped_n_points)]
        return fk_positions_lanes(self.model, q, extra_points=extra)

    def _fk_map_collision_aos(self, q):
        from ..kin.fk import fk_rot_trans
        R, t = fk_rot_trans(self.model, q)
        if self.grasped_n_points == 0:
            return t
        gi = self.model.link_index(self.link_name_grasped_object)
        R_g = R[..., gi, :, :]
        t_g = t[..., gi, :]
        pts = (jnp.einsum("...ij,gj->...gi", R_g, self.grasped_points)
               + t_g[..., None, :])
        return jnp.concatenate([t, pts], axis=-2)

    def fk_map_collision_with_jac(self, q):
        """Analytic point Jacobians for all collision points from one FK pass
        (points (..., P, 3), J (..., P, 3, 7)); lanes chain for batched
        calls, AoS for per-sample/vmapped calls (see fk_map_collision)."""
        if jnp.asarray(q).ndim == 1:
            from ..kin.fk import fk_rot_trans, point_jacobians
            R, t = fk_rot_trans(self.model, q)
            point_link_idx = list(range(self.model.n_links))
            pts = t
            if self.grasped_n_points > 0:
                gi = self.model.link_index(self.link_name_grasped_object)
                R_g = R[..., gi, :, :]
                t_g = t[..., gi, :]
                pts_g = (jnp.einsum("...ij,gj->...gi", R_g,
                                    self.grasped_points)
                         + t_g[..., None, :])
                pts = jnp.concatenate([t, pts_g], axis=-2)
                point_link_idx = (point_link_idx
                                  + [gi] * self.grasped_n_points)
            J = point_jacobians(self.model, R, t, pts, point_link_idx, q=q)
            return pts, J
        from ..ops.lanes_fk import fk_points_jacobians_lanes
        extra = None
        if self.grasped_n_points > 0:
            gi = self.model.link_index(self.link_name_grasped_object)
            extra = [(gi, self.grasped_points[g])
                     for g in range(self.grasped_n_points)]
        return fk_points_jacobians_lanes(self.model, q, extra_points=extra)

    # ------------------------------------------------------------------
    # EE pose accessors (robot_panda.py:172-184)
    # ------------------------------------------------------------------
    def get_EE_pose(self, q):
        return fk_all_links(self.model, q, link_list=[self.link_name_ee])

    def get_EE_position(self, q):
        return self.get_EE_pose(q)[..., 0, :3, 3]

    def get_EE_orientation(self, q, rotation_matrix=True):
        H = self.get_EE_pose(q)
        if rotation_matrix:
            return H[..., 0, :3, :3]
        from ..core.se3 import link_quat_from_link_tensor
        return link_quat_from_link_tensor(H[..., 0, :, :])
