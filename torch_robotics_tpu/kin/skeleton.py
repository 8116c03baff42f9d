"""Skeleton: link-frame graph utilities for visualization and distances.

Mirrors /root/reference/torch_robotics/torch_kinematics_tree/geometrics/skeleton.py
without the networkx dependency: the compiled KinematicModel already stores the
parent structure, so the skeleton is (names, parent edges, link positions).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..core.utils import to_numpy
from .fk import fk_rot_trans
from .model import KinematicModel

__all__ = ["Skeleton", "get_skeleton_from_model",
           "get_skeleton_from_landmarks"]


@dataclasses.dataclass
class Skeleton:
    link_names: Sequence[str]
    parent_idx: Sequence[int]
    positions: np.ndarray            # (n_links, 3)
    variances: Optional[np.ndarray] = None   # (n_links,) posture variance

    @property
    def edges(self):
        return [(p, i) for i, p in enumerate(self.parent_idx) if p >= 0]

    def link_lengths(self):
        out = {}
        for p, i in self.edges:
            out[(self.link_names[p], self.link_names[i])] = float(
                np.linalg.norm(self.positions[i] - self.positions[p]))
        return out

    def compute_self_distance(self):
        """All-pairs link-frame distances (n, n) (skeleton.py:71-90)."""
        d = self.positions[:, None, :] - self.positions[None, :, :]
        return np.linalg.norm(d, axis=-1)

    def sample_posture(self, key, batch_size: int):
        """Sample node positions ~ N(pos, var * I) per node
        (skeleton.py:127-131).  Returns (batch, n_links, dim)."""
        import jax
        var = (self.variances if self.variances is not None
               else np.full((len(self.link_names),), 1e-3))
        std = jnp.sqrt(jnp.asarray(var, jnp.float32))[:, None]
        mean = jnp.asarray(self.positions, jnp.float32)
        noise = jax.random.normal(key, (batch_size,) + mean.shape)
        return mean + std * noise

    def draw_skeleton(self, ax=None, color="blue", alpha=1.0, linewidth=2.0):
        for p, i in self.edges:
            seg = np.stack([self.positions[p], self.positions[i]])
            if getattr(ax, "name", "") == "3d":
                ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], color=color,
                        alpha=alpha, linewidth=linewidth)
            else:
                ax.plot(seg[:, 0], seg[:, 1], color=color, alpha=alpha,
                        linewidth=linewidth)


def get_skeleton_from_model(model: KinematicModel, q,
                            link_list: Optional[Sequence[str]] = None
                            ) -> Skeleton:
    q = jnp.asarray(to_numpy(q)).reshape(-1)
    _, t = fk_rot_trans(model, q)
    return Skeleton(link_names=list(model.link_names),
                    parent_idx=list(model.parent_idx),
                    positions=to_numpy(t))


def get_skeleton_from_landmarks(landmarks, connections,
                                present_thres: float = 0.5,
                                vis_thres: float = 0.5,
                                mirror: bool = False,
                                relative_pose: bool = False,
                                shift=np.zeros(3)) -> Optional[Skeleton]:
    """Build a Skeleton from pose-landmark detections.

    Dependency-free equivalent of the reference
    ``get_skeleton_from_mediapipe`` (skeleton.py:161-205): ``landmarks`` is a
    sequence of objects with ``x, y, z`` and optional ``visibility`` /
    ``presence`` attributes (mediapipe-style duck typing); ``connections``
    are (start, end) index pairs.  The camera frame is remapped to the robot
    frame exactly as the reference does ((z, -x, -y); mirrored:
    (-z, -x, y)).  Returns None when no landmarks pass the thresholds.
    """
    if landmarks is None:
        return None
    plotted = {}
    for idx, lm in enumerate(landmarks):
        vis = getattr(lm, "visibility", None)
        pres = getattr(lm, "presence", None)
        if (vis is not None and vis < vis_thres) or \
           (pres is not None and pres < present_thres):
            continue
        if mirror:
            plotted[idx] = np.array([-lm.z, -lm.x, lm.y], np.float64)
        else:
            plotted[idx] = np.array([lm.z, -lm.x, -lm.y], np.float64)
    if not plotted:
        return None
    base = plotted[min(plotted)] if relative_pose else 0.0
    ids = sorted(plotted)
    id_to_row = {i: r for r, i in enumerate(ids)}
    positions = np.stack([plotted[i] - base + shift for i in ids])
    parent = [-1] * len(ids)
    for s, e in connections:
        if not (0 <= s < len(landmarks) and 0 <= e < len(landmarks)):
            raise ValueError(
                f"Landmark index out of range in connection ({s}, {e})")
        if s in plotted and e in plotted and parent[id_to_row[e]] < 0 \
                and id_to_row[s] != id_to_row[e]:
            parent[id_to_row[e]] = id_to_row[s]
    return Skeleton(link_names=[str(i) for i in ids], parent_idx=parent,
                    positions=positions,
                    variances=np.full((len(ids),), 1e-3))
