"""Compiled kinematic model: URDF -> static arrays + pure batched FK.

TPU-native re-design of the reference kinematics tree
(/root/reference/torch_robotics/torch_kinematics_tree/models/robot_tree.py and
rigid_body.py): instead of a Python object tree with recursive
``forward_kinematics`` (rigid_body.py:146-211), the robot is compiled once on
the host into a ``KinematicModel`` pytree of per-link arrays (parent indices
in topological order, joint-type masks, fixed origin transforms, axes,
limits).  FK is then a statically-unrolled chain of batched (R, t) composes —
pure, jit/vmap/grad-friendly, with no Python at trace time beyond an unrolled
loop of length n_links.

Semantics parity with the reference FK:
- joint local pose: R = R_rpy(origin) @ R_axis(q), t = origin_xyz
  (+ axis * q for prismatic)                       (rigid_body.py:153-192)
- q is clamped to limits inside FK for revolute/prismatic but NOT for
  continuous joints                                 (rigid_body.py:157-160)
- link ordering and q ordering follow URDF file order
  (robot_tree.py:101-119)
- a revolute joint with a missing/zero axis rotates about z, matching the
  reference's axis dispatch fallback                (rigid_body.py:162-168)
- DELIBERATE deviation: a NON-axis-aligned joint axis (e.g. the Shadow
  hand's LFJ5, axis (0.574, 0, 0.819)) rotates about the true axis via
  Rodrigues; the reference snaps any axis that is not exactly e_x/e_y to
  z_rot (rigid_body.py:100-105), which is wrong physics — closed-form
  check in tests/test_kin_fk.py::test_shadow_lfj5_true_axis_closed_form
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.se3 import rpy_to_rotation_matrix
from ..geom.sdf import _pytree_dataclass, static_field
from .urdf import UrdfRobot, parse_urdf

__all__ = ["KinematicModel", "JOINT_FIXED", "JOINT_REVOLUTE",
           "JOINT_CONTINUOUS", "JOINT_PRISMATIC"]

JOINT_FIXED = 0
JOINT_REVOLUTE = 1
JOINT_CONTINUOUS = 2
JOINT_PRISMATIC = 3

_JOINT_CODES = {
    "fixed": JOINT_FIXED,
    "revolute": JOINT_REVOLUTE,
    "continuous": JOINT_CONTINUOUS,
    "prismatic": JOINT_PRISMATIC,
}

_BIG = 1e9


def _np_rpy_to_rotation_matrix(rpy: np.ndarray) -> np.ndarray:
    """Host-side (numpy) Rz(yaw) @ Ry(pitch) @ Rx(roll) — avoids eager device
    dispatch during model compilation (slow on remote-compile backends)."""
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    R = np.empty(rpy.shape[:-1] + (3, 3), np.float64)
    R[..., 0, 0] = cy * cp
    R[..., 0, 1] = cy * sp * sr - sy * cr
    R[..., 0, 2] = cy * sp * cr + sy * sr
    R[..., 1, 0] = sy * cp
    R[..., 1, 1] = sy * sp * sr + cy * cr
    R[..., 1, 2] = sy * sp * cr - cy * sr
    R[..., 2, 0] = -sp
    R[..., 2, 1] = cp * sr
    R[..., 2, 2] = cp * cr
    return R


@_pytree_dataclass
class KinematicModel:
    """Static-array robot model.  All per-link arrays are in URDF file order."""
    # per-link joint parameters
    joint_trans: jnp.ndarray        # (n_links, 3)
    joint_fixed_rot: jnp.ndarray    # (n_links, 3, 3)
    joint_axis: jnp.ndarray         # (n_links, 3)
    rot_mask: jnp.ndarray           # (n_links,) 1.0 if revolute/continuous
    prism_mask: jnp.ndarray         # (n_links,) 1.0 if prismatic
    clamp_lower: jnp.ndarray        # (n_links,) -BIG if not clamped
    clamp_upper: jnp.ndarray        # (n_links,) +BIG if not clamped
    q_map: jnp.ndarray              # (n_links,) int32 index into q (0 if fixed)
    # per-dof limits (URDF file order of movable joints)
    q_lower: jnp.ndarray            # (n_dofs,)
    q_upper: jnp.ndarray
    q_velocity: jnp.ndarray
    q_effort: jnp.ndarray
    joint_damping: jnp.ndarray
    # static structure
    name: str = static_field(default="robot")
    link_names: tuple = static_field(default=())
    joint_names: tuple = static_field(default=())
    parent_idx: tuple = static_field(default=())   # -1 for root
    joint_types: tuple = static_field(default=())  # per-link type codes
    n_dofs: int = static_field(default=0)

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------
    @classmethod
    def from_urdf(cls, path, name: Optional[str] = None,
                  dtype=jnp.float32) -> "KinematicModel":
        robot = parse_urdf(path)
        return cls.from_urdf_robot(robot, name=name or robot.name, dtype=dtype)

    @classmethod
    def from_urdf_robot(cls, robot: UrdfRobot, name: str = "robot",
                        dtype=jnp.float32) -> "KinematicModel":
        joint_for_child = robot.joint_for_child()
        link_names = robot.link_names()
        name_to_idx = {n: i for i, n in enumerate(link_names)}
        n = len(link_names)

        trans = np.zeros((n, 3), np.float64)
        rpy = np.zeros((n, 3), np.float64)
        axis = np.zeros((n, 3), np.float64)
        rot_mask = np.zeros(n, np.float32)
        prism_mask = np.zeros(n, np.float32)
        clamp_lower = np.full(n, -_BIG, np.float64)
        clamp_upper = np.full(n, _BIG, np.float64)
        q_map = np.zeros(n, np.int32)
        parent_idx = [-1] * n
        joint_types = [JOINT_FIXED] * n
        joint_names = ["base_joint"] * n

        q_lower, q_upper, q_vel, q_eff, q_damp = [], [], [], [], []
        n_dofs = 0

        for i, lname in enumerate(link_names):
            j = joint_for_child.get(lname)
            if j is None:
                continue  # root: identity joint
            if j.type not in _JOINT_CODES:
                raise NotImplementedError(f"joint type {j.type} ({j.name})")
            code = _JOINT_CODES[j.type]
            parent_idx[i] = name_to_idx[j.parent]
            joint_types[i] = code
            joint_names[i] = j.name
            trans[i] = j.origin_xyz
            rpy[i] = j.origin_rpy
            if code in (JOINT_REVOLUTE, JOINT_CONTINUOUS):
                a = np.asarray(j.axis, np.float64)
                if np.linalg.norm(a) == 0.0:
                    a = np.array([0.0, 0.0, 1.0])  # reference fallback
                axis[i] = a
                rot_mask[i] = 1.0
            elif code == JOINT_PRISMATIC:
                axis[i] = j.axis
                prism_mask[i] = 1.0
            if code != JOINT_FIXED:
                q_map[i] = n_dofs
                lower, upper = j.limit_lower, j.limit_upper
                if code == JOINT_CONTINUOUS:
                    # reference convention (models/utils.py:241-243)
                    lower, upper = -np.pi, np.pi
                elif j.has_limit:
                    # clamped inside FK (rigid_body.py:157-160)
                    clamp_lower[i] = lower
                    clamp_upper[i] = upper
                q_lower.append(lower)
                q_upper.append(upper)
                q_vel.append(j.limit_velocity)
                q_eff.append(j.limit_effort)
                q_damp.append(j.damping)
                n_dofs += 1

        # verify the structure is a forest reachable from a single root
        for i, p in enumerate(parent_idx):
            if p == i:
                raise ValueError(f"link {link_names[i]} is its own parent")

        fixed_rot = _np_rpy_to_rotation_matrix(rpy)
        return cls(
            joint_trans=jnp.asarray(trans, dtype),
            joint_fixed_rot=jnp.asarray(fixed_rot, dtype),
            joint_axis=jnp.asarray(axis, dtype),
            rot_mask=jnp.asarray(rot_mask, dtype),
            prism_mask=jnp.asarray(prism_mask, dtype),
            clamp_lower=jnp.asarray(clamp_lower, dtype),
            clamp_upper=jnp.asarray(clamp_upper, dtype),
            q_map=jnp.asarray(q_map, jnp.int32),
            q_lower=jnp.asarray(np.array(q_lower), dtype),
            q_upper=jnp.asarray(np.array(q_upper), dtype),
            q_velocity=jnp.asarray(np.array(q_vel), dtype),
            q_effort=jnp.asarray(np.array(q_eff), dtype),
            joint_damping=jnp.asarray(np.array(q_damp), dtype),
            name=name,
            link_names=tuple(link_names),
            joint_names=tuple(joint_names),
            parent_idx=tuple(parent_idx),
            joint_types=tuple(joint_types),
            n_dofs=n_dofs,
        )

    # ------------------------------------------------------------------
    # Introspection
    # ------------------------------------------------------------------
    @property
    def n_links(self) -> int:
        return len(self.link_names)

    def link_index(self, link_name: str) -> int:
        return self.link_names.index(link_name)

    def topological_order(self) -> Sequence[int]:
        """Indices ordered so parents precede children (root first)."""
        order, seen = [], set()

        def visit(i):
            if i in seen:
                return
            p = self.parent_idx[i]
            if p >= 0:
                visit(p)
            seen.add(i)
            order.append(i)

        for i in range(self.n_links):
            visit(i)
        return order

    def controlled_link_idxs(self) -> Sequence[int]:
        """Link indices whose joints are movable, in q order.

        q indices are assigned in URDF file order during compilation, so file
        order IS q order (static — safe to call under jit tracing).
        """
        return tuple(i for i, t in enumerate(self.joint_types)
                     if t != JOINT_FIXED)

    def ancestry_matrix(self) -> np.ndarray:
        """(n_links, n_dofs) bool: joint j moves link i."""
        ctrl = self.controlled_link_idxs()
        joint_of_link = {li: d for d, li in enumerate(ctrl)}
        A = np.zeros((self.n_links, self.n_dofs), bool)
        for i in range(self.n_links):
            p = i
            while p >= 0:
                if p in joint_of_link:
                    A[i, joint_of_link[p]] = True
                p = self.parent_idx[p]
        return A
