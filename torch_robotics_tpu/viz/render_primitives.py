"""Matplotlib rendering of SDF primitives (host-side).

Mirrors the render paths of the reference primitives
(/root/reference/torch_robotics/environments/primitives.py:78-88,178-306):
spheres as circles / surface plots, boxes as (rotated) rectangles or wire
boxes; object poses applied via matplotlib affine transforms in 2-D and point
transforms in 3-D.
"""
from __future__ import annotations

import numpy as np

from ..core.utils import to_numpy


def _pose_np(pos, ori):
    from ..core.quaternion import q_to_rotation_matrix
    pos = np.zeros(3) if pos is None else to_numpy(pos).reshape(-1)
    if ori is None:
        rot = np.eye(3)
    else:
        rot = to_numpy(q_to_rotation_matrix(np.asarray(ori, np.float32)))
        rot = rot.reshape(3, 3)
    return pos, rot


def plot_sphere(ax, center, pos, radius, cmap):
    u, v = np.mgrid[0:2 * np.pi:30j, 0:np.pi:20j]
    x = radius * (np.cos(u) * np.sin(v))
    y = radius * (np.sin(u) * np.sin(v))
    z = radius * np.cos(v)
    ax.plot_surface(x + center[0] + pos[0], y + center[1] + pos[1],
                    z + center[2] + pos[2], cmap=cmap, alpha=1)


def render_spheres(spheres, ax, pos=None, ori=None, color="gray",
                   cmap="gray", **kwargs):
    import matplotlib.pyplot as plt
    pos_np, _ = _pose_np(pos, ori)
    centers = to_numpy(spheres.centers)
    radii = to_numpy(spheres.radii)
    for center, radius in zip(centers, radii):
        if getattr(ax, "name", "") == "3d":
            plot_sphere(ax, center, pos_np, float(radius), cmap)
        else:
            circle = plt.Circle((center[0] + pos_np[0], center[1] + pos_np[1]),
                                float(radius), color=color, linewidth=0,
                                alpha=1)
            ax.add_patch(circle)


def _patch_rotate_translate(ax, patch, rot2, trans2):
    from matplotlib import transforms
    deg = np.rad2deg(np.arctan2(rot2[1, 0], rot2[0, 0]))
    tf = (transforms.Affine2D().rotate_deg(deg)
          .translate(trans2[0], trans2[1]) + ax.transData)
    patch.set_transform(tf)
    ax.add_patch(patch)


def render_boxes(boxes, ax, pos=None, ori=None, color="gray", cmap="gray",
                 rounding=None, **kwargs):
    import matplotlib.pyplot as plt
    from matplotlib.patches import BoxStyle, FancyBboxPatch
    pos_np, rot = _pose_np(pos, ori)
    centers = to_numpy(boxes.centers)
    sizes = to_numpy(boxes.sizes)
    if getattr(ax, "name", "") == "3d":
        for center, size in zip(centers, sizes):
            _render_box_3d(ax, center, size, rot, pos_np, cmap)
        return
    rounding_np = None if rounding is None else to_numpy(rounding)
    for i, (center, size) in enumerate(zip(centers, sizes)):
        a, b = float(size[0]), float(size[1])
        corner = (center[0] - a / 2, center[1] - b / 2)
        if rounding_np is not None:
            patch = FancyBboxPatch(
                corner, a, b, color=color,
                boxstyle=BoxStyle.Round(pad=0.0,
                                        rounding_size=float(rounding_np[i])))
        else:
            patch = plt.Rectangle(corner, a, b, color=color, linewidth=0,
                                  alpha=1)
        _patch_rotate_translate(ax, patch, rot[:2, :2], pos_np[:2])


def _render_box_3d(ax, center, size, rot, pos, cmap):
    phi = np.arange(1, 10, 2) * np.pi / 4
    Phi, Theta = np.meshgrid(phi, phi, indexing="ij")
    x = np.cos(Phi) * np.sin(Theta)
    y = np.sin(Phi) * np.sin(Theta)
    z = np.cos(Theta) / np.sqrt(2)
    pts = np.stack([center[0] + x.ravel() * size[0],
                    center[1] + y.ravel() * size[1],
                    center[2] + z.ravel() * size[2]], axis=-1)
    pts = pts @ rot.T + pos
    d = x.shape[0]
    ax.plot_surface(pts[:, 0].reshape(d, d), pts[:, 1].reshape(d, d),
                    pts[:, 2].reshape(d, d), cmap=cmap, alpha=0.25)
