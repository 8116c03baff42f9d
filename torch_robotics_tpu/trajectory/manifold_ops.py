"""Trajectory operations on Riemannian manifolds.

Revives the reference's manifold-trajectory module
(/root/reference/torch_robotics/torch_kinematics_tree/geometrics/trajectory.py
— dead there due to stale imports): derivative estimation in the tangent
space and smoothing for trajectories living on product manifolds (e.g.
position x orientation paths).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.manifold import Manifold

__all__ = ["compute_traj_velocity", "compute_traj_derivatives", "smooth_traj"]


def compute_traj_velocity(traj, dt: float, manifold: Manifold):
    """Finite-difference velocities in the tangent space.

    traj: (..., H, dim_M) manifold points -> (..., H, dim_T): v_t =
    log_{x_t}(x_{t+1}) / dt with the final velocity repeated.
    """
    x_t = traj[..., :-1, :]
    x_t1 = traj[..., 1:, :]
    v = manifold.log_map(x_t1, base=x_t) / dt
    return jnp.concatenate([v, v[..., -1:, :]], axis=-2)


def compute_traj_derivatives(traj, dt: float, manifold: Manifold,
                             smooth: bool = False, window: int = 5):
    """(position, velocity, acceleration) along a manifold trajectory."""
    if smooth:
        traj = smooth_traj(traj, manifold, window=window)
    vel = compute_traj_velocity(traj, dt, manifold)
    acc = (jnp.concatenate([vel[..., 1:, :], vel[..., -1:, :]], axis=-2)
           - vel) / dt
    return traj, vel, acc


def smooth_traj(traj, manifold: Manifold, window: int = 5):
    """Moving-average smoothing in the tangent space of each point
    (tangent-space analogue of the reference's Kaiser-window smoothing)."""
    H = traj.shape[-2]
    half = window // 2
    out = [traj[..., :1, :]]
    for t in range(1, H - 1):
        lo, hi = max(0, t - half), min(H, t + half + 1)
        base = traj[..., t, :]
        vs = [manifold.log_map(traj[..., s, :], base=base)
              for s in range(lo, hi)]
        mean_v = sum(vs) / len(vs)
        out.append(manifold.exp_map(mean_v, base=base)[..., None, :])
    out.append(traj[..., -1:, :])
    return jnp.concatenate(out, axis=-2)
