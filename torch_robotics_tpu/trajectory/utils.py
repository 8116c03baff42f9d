"""Trajectory interpolation / smoothing / finite differences.

Mirrors /root/reference/torch_robotics/trajectory/utils.py with jnp (the
cubic-spline smoother replaces scipy with a natural-clamped spline solved as a
small tridiagonal system so it also jits).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.utils import finite_difference_vector  # re-export

__all__ = ["interpolate_traj_via_points", "finite_difference_vector",
           "smoothen_trajectory"]


def interpolate_traj_via_points(trajs, num_interpolation: int = 10):
    """Linear interpolation between consecutive waypoints.

    Parity with the reference (trajectory/utils.py:37-50): for each of the
    H-1 segments, ``num_interpolation`` points are placed at
    alpha in linspace(0,1,n+2)[1:n+1] mixing waypoint_t * alpha +
    waypoint_{t+1} * (1 - alpha); output length (H-1)*n.
    trajs: (..., H, D)
    """
    trajs = jnp.asarray(trajs)
    H, D = trajs.shape[-2:]
    if num_interpolation <= 0:
        return trajs
    alpha = jnp.linspace(0.0, 1.0, num_interpolation + 2,
                         dtype=trajs.dtype)[1:num_interpolation + 1]
    alpha = alpha.reshape((1,) * (trajs.ndim - 1) + (-1, 1))
    left = trajs[..., : H - 1, None, :]
    right = trajs[..., 1:H, None, :]
    out = left * alpha + right * (1.0 - alpha)
    return out.reshape(trajs.shape[:-2] + ((H - 1) * num_interpolation, D))


def _clamped_cubic_spline(y, t_eval):
    """Evaluate a clamped (zero end-slope) cubic spline through y at t_eval.

    y: (N, D) knots at t = linspace(0, 1, N); t_eval: (M,) in [0, 1].
    Solves the standard tridiagonal second-derivative system with clamped
    boundary conditions (replaces scipy.interpolate.make_interp_spline with
    bc_type='clamped', trajectory/utils.py:13).
    """
    N, D = y.shape
    h = 1.0 / (N - 1)
    # clamped-spline tridiagonal system for the second derivatives m:
    #   h/3 m0   + h/6 m1                 = dy0 - s0            (s0 = 0)
    #   h/6 m_i-1 + 2h/3 m_i + h/6 m_i+1  = dy_i - dy_i-1
    #   h/6 m_n-2 + h/3 m_n-1             = s1 - dy_n-2         (s1 = 0)
    diag = jnp.concatenate([jnp.array([h / 3.0]),
                            jnp.full((N - 2,), 2.0 * h / 3.0),
                            jnp.array([h / 3.0])])
    off = jnp.full((N - 1,), h / 6.0)
    dy = (y[1:] - y[:-1]) / h
    rhs = jnp.concatenate([dy[:1], dy[1:] - dy[:-1], -dy[-1:]], axis=0)

    # Thomas algorithm (sequential over N; N is small)
    def solve(rhs_col):
        c_prime = jnp.zeros(N)
        d_prime = jnp.zeros(N)
        c_prime = c_prime.at[0].set(off[0] / diag[0])
        d_prime = d_prime.at[0].set(rhs_col[0] / diag[0])

        def body(i, val):
            c_p, d_p = val
            denom = diag[i] - off[i - 1] * c_p[i - 1]
            c_p = c_p.at[i].set(jnp.where(i < N - 1, off[jnp.minimum(i, N - 2)] / denom, 0.0))
            d_p = d_p.at[i].set((rhs_col[i] - off[i - 1] * d_p[i - 1]) / denom)
            return (c_p, d_p)

        c_prime, d_prime = jax.lax.fori_loop(1, N, body, (c_prime, d_prime))

        def back(i, m):
            j = N - 2 - i
            return m.at[j].set(d_prime[j] - c_prime[j] * m[j + 1])

        m = jnp.zeros(N).at[N - 1].set(d_prime[N - 1])
        m = jax.lax.fori_loop(0, N - 1, back, m)
        return m

    m = jax.vmap(solve, in_axes=1, out_axes=1)(rhs)

    # evaluate
    t_eval = jnp.clip(t_eval, 0.0, 1.0)
    seg = jnp.clip((t_eval / h).astype(jnp.int32), 0, N - 2)
    t0 = seg.astype(y.dtype) * h
    u = (t_eval - t0)[:, None]
    y0, y1 = y[seg], y[seg + 1]
    m0, m1 = m[seg], m[seg + 1]
    a = (m1 - m0) / (6.0 * h)
    b = m0 / 2.0
    c = (y1 - y0) / h - h * (2.0 * m0 + m1) / 6.0
    pos = y0 + u * (c + u * (b + u * a))
    vel = c + u * (2.0 * b + 3.0 * u * a)
    return pos, vel


def smoothen_trajectory(traj_pos, n_support_points: int = 30, dt: float = 0.02,
                        set_average_velocity: bool = True,
                        zero_velocity: bool = False):
    """Cubic-spline smoothing with clamped (zero-velocity) BCs.

    Parity in intent with the reference (trajectory/utils.py:8-34): resamples
    a coarse path onto ``n_support_points`` with either zero, average, or
    spline velocities.
    traj_pos: (N, D) -> (pos (n, D), vel (n, D))
    """
    assert not (set_average_velocity and zero_velocity)
    traj_pos = jnp.asarray(traj_pos)
    if traj_pos.shape[0] < 2:
        traj_pos = jnp.concatenate([traj_pos, traj_pos[-1:]], axis=0)
    t_eval = jnp.linspace(0.0, 1.0, n_support_points)
    pos, vel_spline = _clamped_cubic_spline(traj_pos, t_eval)
    vel = jnp.zeros_like(pos)
    if zero_velocity:
        pass
    elif set_average_velocity:
        avg_vel = (traj_pos[1] - traj_pos[0]) / (n_support_points * dt)
        vel = vel.at[1:-1].set(avg_vel)
    else:
        vel = vel_spline
    return pos, vel
