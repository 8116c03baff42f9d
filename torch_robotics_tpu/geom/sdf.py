"""Analytic signed-distance-field primitives and posed composite objects.

TPU-native re-design of the reference primitives
(/root/reference/torch_robotics/environments/primitives.py): primitive groups
are frozen dataclass pytrees of packed arrays (all spheres of an object in one
(n, dim) array, etc.), and every SDF is a pure batched function of query
points ``x: (..., dim) -> (...,)``.  Exact same math as the reference:

- spheres: min_j ||x - c_j|| - r_j                        (primitives.py:108-112)
- sharp boxes: min_j max_i (|x - c_j| - h_j)_i            (primitives.py:220-223)
- rounded boxes (default ``MultiBoxField``): Linus-style rounded rect with
  radius = 0.15 * min(size)                               (primitives.py:325-334)
- ``ObjectField``: min over member primitive groups after transforming the
  query into the object frame                             (primitives.py:387-405)
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.pytrees import pytree_dataclass as _pytree_dataclass
from ..core.pytrees import safe_norm, static_field
from ..core.quaternion import q_to_rotation_matrix
from ..core.se3 import rotate_point

__all__ = ["Spheres", "SharpBoxes", "RoundedBoxes", "ObjectField",
           "MultiSphereField", "MultiSharpBoxField", "MultiBoxField",
           "safe_norm"]


@_pytree_dataclass
class Spheres:
    """A group of spheres: centers (n, dim), radii (n,)."""
    centers: jnp.ndarray
    radii: jnp.ndarray

    @property
    def dim(self) -> int:
        return self.centers.shape[-1]

    def signed_distance(self, x):
        """x: (..., dim) -> (...,) min over spheres."""
        d = safe_norm(x[..., None, :] - self.centers, axis=-1)
        return jnp.min(d - self.radii, axis=-1)

    def render(self, ax, pos=None, ori=None, color="gray", cmap="gray", **kw):
        from ..viz.render_primitives import render_spheres
        render_spheres(self, ax, pos=pos, ori=ori, color=color, cmap=cmap, **kw)


@_pytree_dataclass
class SharpBoxes:
    """Axis-aligned boxes with the reference's max-norm SDF: centers (n, dim),
    half_sizes (n, dim)."""
    centers: jnp.ndarray
    half_sizes: jnp.ndarray

    @property
    def dim(self) -> int:
        return self.centers.shape[-1]

    @property
    def sizes(self):
        return 2.0 * self.half_sizes

    def signed_distance(self, x):
        d = jnp.abs(x[..., None, :] - self.centers) - self.half_sizes
        return jnp.min(jnp.max(d, axis=-1), axis=-1)

    def render(self, ax, pos=None, ori=None, color="gray", cmap="gray", **kw):
        from ..viz.render_primitives import render_boxes
        render_boxes(self, ax, pos=pos, ori=ori, color=color, cmap=cmap, **kw)


@_pytree_dataclass
class RoundedBoxes:
    """Rounded boxes — the differentiable default for optimization.

    round_radii defaults to 0.15 * min(size) per box (primitives.py:325).
    """
    centers: jnp.ndarray
    half_sizes: jnp.ndarray
    round_radii: jnp.ndarray

    @classmethod
    def from_sizes(cls, centers, sizes):
        centers = jnp.asarray(centers)
        sizes = jnp.asarray(sizes)
        return cls(centers, sizes / 2.0, jnp.min(sizes, axis=-1) * 0.15)

    @property
    def dim(self) -> int:
        return self.centers.shape[-1]

    @property
    def sizes(self):
        return 2.0 * self.half_sizes

    def signed_distance(self, x):
        q = (jnp.abs(x[..., None, :] - self.centers) - self.half_sizes
             + self.round_radii[..., None])
        max_q = jnp.max(q, axis=-1)
        sdfs = (jnp.minimum(max_q, 0.0)
                + safe_norm(jax.nn.relu(q), axis=-1) - self.round_radii)
        return jnp.min(sdfs, axis=-1)

    def render(self, ax, pos=None, ori=None, color="gray", cmap="gray", **kw):
        from ..viz.render_primitives import render_boxes
        render_boxes(self, ax, pos=pos, ori=ori, color=color, cmap=cmap,
                     rounding=self.round_radii, **kw)


@_pytree_dataclass
class ObjectField:
    """A posed composite of primitive groups (env_base objects).

    The pose (pos: (3,), ori: wxyz quaternion (4,)) places the object in the
    world; SDF queries are pulled back into the object frame first.  For 2-D
    scenes the query is lifted to 3-D with z = 0 (primitives.py:387-399).
    """
    fields: tuple
    pos: jnp.ndarray
    ori: jnp.ndarray
    name: str = static_field(default="object")
    reference_frame: str = static_field(default="base")

    @classmethod
    def create(cls, fields: Sequence, name="object", pos=None, ori=None,
               reference_frame="base", dtype=jnp.float32):
        pos = jnp.zeros(3, dtype) if pos is None else jnp.asarray(pos, dtype)
        ori = (jnp.array([1.0, 0, 0, 0], dtype) if ori is None
               else jnp.asarray(ori, dtype))
        return cls(tuple(fields), pos, ori, name=name,
                   reference_frame=reference_frame)

    @property
    def dim(self) -> int:
        return self.fields[0].dim

    def with_pose(self, pos=None, ori=None):
        new_pos = self.pos if pos is None else jnp.asarray(pos, self.pos.dtype)
        new_ori = self.ori if ori is None else jnp.asarray(ori, self.ori.dtype)
        return dataclasses.replace(self, pos=new_pos, ori=new_ori)

    def _to_object_frame(self, x):
        dim = x.shape[-1]
        if dim == 2:
            x = jnp.concatenate([x, jnp.zeros_like(x[..., :1])], axis=-1)
        rot_inv = jnp.swapaxes(q_to_rotation_matrix(self.ori), -1, -2)
        x = rotate_point(x - self.pos, rot_inv)
        if dim == 2:
            x = x[..., :2]
        return x

    def signed_distance(self, x):
        """x: (..., dim) in world frame -> (...,) min over member groups."""
        x_obj = self._to_object_frame(x)
        sdfs = [f.signed_distance(x_obj) for f in self.fields]
        if len(sdfs) == 1:
            return sdfs[0]
        return jnp.min(jnp.stack(sdfs, axis=-1), axis=-1)

    # Reference-compatible alias (primitives.py:31).
    def compute_signed_distance(self, x):
        return self.signed_distance(x)

    def render(self, ax, pos=None, ori=None, color="gray", **kw):
        pos = self.pos if pos is None else pos
        ori = self.ori if ori is None else ori
        for f in self.fields:
            f.render(ax, pos=pos, ori=ori, color=color, **kw)


def MultiSphereField(centers, radii, dtype=jnp.float32):
    """Reference-named constructor (primitives.py:90)."""
    return Spheres(jnp.asarray(np.asarray(centers), dtype),
                   jnp.asarray(np.asarray(radii), dtype))


def MultiSharpBoxField(centers, sizes, dtype=jnp.float32):
    """Reference-named constructor (primitives.py:201)."""
    return SharpBoxes(jnp.asarray(np.asarray(centers), dtype),
                      jnp.asarray(np.asarray(sizes), dtype) / 2.0)


def MultiBoxField(centers, sizes, dtype=jnp.float32):
    """Reference-named constructor — rounded boxes (primitives.py:309)."""
    return RoundedBoxes.from_sizes(jnp.asarray(np.asarray(centers), dtype),
                                   jnp.asarray(np.asarray(sizes), dtype))
