"""Small plotting helpers (coordinate frames).

Mirrors /root/reference/torch_robotics/visualizers/plot_utils.py:8-32.
"""
from __future__ import annotations


from ..core.utils import to_numpy


def plot_coordinate_frame(ax, rot, trans, arrow_length=0.1, arrow_alpha=1.0,
                          arrow_linewidth=2.0):
    """Draw RGB xyz arrows of a frame given (R, t) or a 4x4 matrix."""
    rot = to_numpy(rot)
    if rot.shape[-1] == 4:  # homogeneous matrix
        trans = rot[:3, 3]
        rot = rot[:3, :3]
    trans = to_numpy(trans).reshape(-1)
    colors = ["red", "green", "blue"]
    for i, c in enumerate(colors):
        axis = rot[:, i] * arrow_length
        if getattr(ax, "name", "") == "3d":
            ax.quiver(trans[0], trans[1], trans[2], axis[0], axis[1], axis[2],
                      color=c, alpha=arrow_alpha, linewidth=arrow_linewidth)
        else:
            ax.quiver(trans[0], trans[1], axis[0], axis[1], color=c,
                      alpha=arrow_alpha, linewidth=arrow_linewidth)
