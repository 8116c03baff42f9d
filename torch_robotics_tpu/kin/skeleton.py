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

__all__ = ["Skeleton", "get_skeleton_from_model"]


@dataclasses.dataclass
class Skeleton:
    link_names: Sequence[str]
    parent_idx: Sequence[int]
    positions: np.ndarray            # (n_links, 3)

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
