"""Frame and MotionVec: thin batched containers over the functional core.

API-parity layer with the reference
(/root/reference/torch_robotics/torch_kinematics_tree/geometrics/frame.py and
spatial_vector.py).  Inside kernels the framework passes raw (R, t) arrays;
these classes exist for interactive/compat use and are immutable pytrees.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .pytrees import pytree_dataclass as _pytree_dataclass
from .quaternion import q_convert_xyzw, q_to_rotation_matrix, rotation_matrix_to_q
from .se3 import (invert_transform, multiply_transform, pack_homogeneous,
                  vector3_to_skew_symm_matrix)

__all__ = ["Frame", "MotionVec"]


@_pytree_dataclass
class Frame:
    """Batched rigid transform (R: (..., 3, 3), t: (..., 3))."""
    rot: jnp.ndarray
    trans: jnp.ndarray

    @classmethod
    def identity(cls, batch_shape=(), dtype=jnp.float32):
        return cls(jnp.broadcast_to(jnp.eye(3, dtype=dtype),
                                    batch_shape + (3, 3)),
                   jnp.zeros(batch_shape + (3,), dtype))

    @classmethod
    def from_pose(cls, pose):
        """pose: (..., 7) = [x, y, z, qw, qx, qy, qz] (frame.py:41-49)."""
        pose = jnp.asarray(pose)
        return cls(q_to_rotation_matrix(pose[..., 3:]), pose[..., :3])

    @property
    def rotation(self):
        return self.rot

    @property
    def translation(self):
        return self.trans

    def multiply_transform(self, other: "Frame") -> "Frame":
        R, t = multiply_transform(self.rot, self.trans, other.rot, other.trans)
        return Frame(R, t)

    def inverse(self) -> "Frame":
        R, t = invert_transform(self.rot, self.trans)
        return Frame(R, t)

    def get_transform_matrix(self):
        return pack_homogeneous(self.rot, self.trans)

    def get_quaternion(self, wxyz: bool = False):
        """Quaternion of the rotation; xyzw by default like the reference
        (frame.py:87-114), wxyz with the flag."""
        q = rotation_matrix_to_q(self.rot)
        return q if wxyz else q_convert_xyzw(q)

    def transform_point(self, point):
        """point: (..., n, 3) -> rotated + translated (frame.py:116-118)."""
        return (jnp.matmul(point, jnp.swapaxes(self.rot, -1, -2))
                + self.trans[..., None, :])

    def trans_cross_rot(self):
        return vector3_to_skew_symm_matrix(self.trans) @ self.rot

    def get_euler(self):
        R = self.rot
        return (jnp.arctan2(R[..., 2, 1], R[..., 2, 2]),
                jnp.arcsin(-R[..., 2, 0]),
                jnp.arctan2(R[..., 1, 0], R[..., 0, 0]))


@_pytree_dataclass
class MotionVec:
    """Spatial motion vector (linear + angular), batched
    (spatial_vector.py:50-105)."""
    lin: jnp.ndarray
    ang: jnp.ndarray

    @classmethod
    def zero(cls, batch_shape=(), dtype=jnp.float32):
        z = jnp.zeros(batch_shape + (3,), dtype)
        return cls(z, z)

    def add_motion_vec(self, mv: "MotionVec") -> "MotionVec":
        return MotionVec(self.lin + mv.lin, self.ang + mv.ang)

    def cross_motion_vec(self, mv: "MotionVec") -> "MotionVec":
        new_ang = jnp.cross(self.ang, mv.ang)
        new_lin = jnp.cross(self.ang, mv.lin) + jnp.cross(self.lin, mv.ang)
        return MotionVec(new_lin, new_ang)

    def transform(self, frame: Frame) -> "MotionVec":
        new_ang = jnp.einsum("...ij,...j->...i", frame.rot, self.ang)
        new_lin = (jnp.einsum("...ij,...j->...i", frame.trans_cross_rot(),
                              self.ang)
                   + jnp.einsum("...ij,...j->...i", frame.rot, self.lin))
        return MotionVec(new_lin, new_ang)

    def get_vector(self):
        return jnp.concatenate([self.ang, self.lin], axis=-1)

    def dot(self, mv: "MotionVec"):
        return (jnp.sum(self.ang * mv.ang, axis=-1)
                + jnp.sum(self.lin * mv.lin, axis=-1))
