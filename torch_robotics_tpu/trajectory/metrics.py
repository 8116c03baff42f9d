"""Trajectory quality metrics.

Mirrors /root/reference/torch_robotics/trajectory/metrics.py:7-35.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["compute_path_length", "compute_variance_waypoints",
           "compute_smoothness"]


def compute_path_length(trajs, robot):
    """Sum of consecutive waypoint distances: (B, H, D) -> (B,)."""
    trajs_pos = robot.get_position(trajs)
    return jnp.sum(jnp.linalg.norm(jnp.diff(trajs_pos, axis=-2), axis=-1),
                   axis=-1)


def compute_variance_waypoints(trajs, robot):
    """Sum over the horizon of the variance of pairwise waypoint distances.

    Parity with the reference (metrics.py:14-24): per time step, the variance
    of the strict upper-triangular pairwise distances between the batch's
    waypoints (including the zero diagonal entries as the reference's
    ``torch.triu(...).view(-1)`` does).
    """
    trajs_pos = robot.get_position(trajs)  # (B, H, D)
    pts = jnp.swapaxes(trajs_pos, 0, 1)    # (H, B, D)
    d = jnp.linalg.norm(pts[:, :, None, :] - pts[:, None, :, :], axis=-1)
    B = d.shape[-1]
    triu = jnp.triu(d, k=1).reshape(d.shape[0], -1)
    # reference flattens the full triu'ed matrix (zeros included) and takes
    # torch.var (unbiased)
    var = jnp.var(triu, axis=-1, ddof=1)
    return jnp.sum(var)


def compute_smoothness(trajs, robot, trajs_vel=None):
    """Sum over horizon of ||delta velocity||: (B, H, D) -> (B,)."""
    if trajs_vel is None:
        trajs_vel = robot.get_velocity(trajs)
    return jnp.sum(jnp.linalg.norm(jnp.diff(trajs_vel, axis=-2), axis=-1),
                   axis=-1)
