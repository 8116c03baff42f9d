"""Grasped objects: primitives attached to the end-effector with collision
base points.

Mirrors /root/reference/torch_robotics/environments/objects.py:10-89: a
grasped object is a posed ObjectField (pose relative to the EE link) plus a
set of base collision points (box vertices + face centers) that the robot's
FK transforms into the world frame.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .sdf import MultiBoxField, ObjectField, RoundedBoxes

__all__ = ["GraspedObject", "GraspedObjectPandaBox"]


@dataclasses.dataclass
class GraspedObject:
    """Object field + collision base points, posed in the EE frame."""
    object_field: ObjectField
    base_points_for_collision: jnp.ndarray   # (G, 3) in the object frame
    reference_frame: str = "panda_hand"

    @property
    def pos(self):
        return self.object_field.pos

    @property
    def ori(self):
        return self.object_field.ori

    @property
    def n_base_points_for_collision(self) -> int:
        return self.base_points_for_collision.shape[0]

    def render(self, ax, pos=None, ori=None, color="gray", **kw):
        self.object_field.render(ax, pos=pos, ori=ori, color=color, **kw)


def _box_collision_points(size, dtype=jnp.float32):
    """8 vertices + 6 face centers of an axis-aligned box
    (objects.py:60-89)."""
    x, y, z = (float(s) for s in size)
    vertices = np.array([
        [x / 2, y / 2, -z / 2], [x / 2, -y / 2, -z / 2],
        [-x / 2, -y / 2, -z / 2], [-x / 2, y / 2, -z / 2],
        [x / 2, y / 2, z / 2], [x / 2, -y / 2, z / 2],
        [-x / 2, -y / 2, z / 2], [-x / 2, y / 2, z / 2],
    ])
    faces = np.array([
        [x / 2, 0, 0], [0, -y / 2, 0], [-x / 2, 0, 0],
        [0, y / 2, 0], [0, 0, z / 2], [0, 0, -z / 2],
    ])
    return jnp.asarray(np.concatenate([vertices, faces]), dtype)


def GraspedObjectPandaBox(size=(0.05, 0.05, 0.15), dtype=jnp.float32):
    """A box grasped by the Panda hand (objects.py:37-58): 0.11 m along the
    hand z-axis, rotated 90 deg about y."""
    boxes = MultiBoxField(np.zeros((1, 3)), np.asarray([size]), dtype=dtype)
    pos = jnp.asarray([0.0, 0.0, 0.11], dtype)
    ori = jnp.asarray([0.0, 0.7071081, 0.0, 0.7071055], dtype)
    field = ObjectField.create([boxes], name="GraspedObjectPandaBox",
                               pos=pos, ori=ori,
                               reference_frame="panda_hand", dtype=dtype)
    return GraspedObject(object_field=field,
                         base_points_for_collision=_box_collision_points(size, dtype),
                         reference_frame="panda_hand")
