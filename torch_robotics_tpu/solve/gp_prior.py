"""Constant-velocity Gauss-Markov (GP) trajectory prior.

The GPMP2 smoothness prior implied by the reference's planner presets
(``sigma_gp`` / ``sigma_start`` / ``sigma_goal_prior``, e.g.
/root/reference/torch_robotics/environments/env_dense_2d.py:93-121): states
x_t = [q_t, qd_t] follow a constant-velocity LTV-SDE; consecutive states are
tied by the transition Phi(dt) with process noise Q(dt) driven by Qc =
sigma_gp^2 I.  The induced trajectory prior precision is block-tridiagonal —
exactly the structure ``btridiag`` factorizes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gp_transition", "gp_Q_inv", "gp_prior_terms",
           "sample_gp_prior_trajs", "straight_line_trajs"]


def gp_transition(d: int, dt: float, dtype=jnp.float32):
    """State transition Phi = [[I, dt I], [0, I]] for x = [q, qd]."""
    eye = jnp.eye(d, dtype=dtype)
    top = jnp.concatenate([eye, dt * eye], axis=-1)
    bot = jnp.concatenate([jnp.zeros((d, d), dtype), eye], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def gp_Q_inv(d: int, dt: float, sigma_gp: float, dtype=jnp.float32):
    """Inverse process noise for the constant-velocity model.

    Q = [[dt^3/3 Qc, dt^2/2 Qc], [dt^2/2 Qc, dt Qc]],  Qc = sigma_gp^2 I
    Q^-1 = [[12/dt^3, -6/dt^2], [-6/dt^2, 4/dt]] (x) Qc^-1.
    """
    qc_inv = 1.0 / (sigma_gp ** 2)
    eye = jnp.eye(d, dtype=dtype)
    a = 12.0 / dt ** 3 * qc_inv
    b = -6.0 / dt ** 2 * qc_inv
    c = 4.0 / dt * qc_inv
    top = jnp.concatenate([a * eye, b * eye], axis=-1)
    bot = jnp.concatenate([b * eye, c * eye], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def gp_prior_blocks(d: int, H: int, dt: float, sigma_start: float,
                    sigma_gp: float, sigma_goal: float, dtype=jnp.float32):
    """Static block-tridiagonal Hessian of the GP factor graph.

    The prior Hessian does not depend on the trajectory; returns
    (D (H, m, m), U (H-1, m, m)).  Built by concatenation — scatter ops
    compile pathologically slowly on some TPU toolchains.
    """
    m = 2 * d
    Phi = gp_transition(d, dt, dtype)
    Qi = gp_Q_inv(d, dt, sigma_gp, dtype)
    PhiT_Qi = Phi.T @ Qi
    PhiT_Qi_Phi = PhiT_Qi @ Phi
    eye_m = jnp.eye(m, dtype=dtype)
    ks = 1.0 / (sigma_start ** 2)
    kg = 1.0 / (sigma_goal ** 2)

    first = PhiT_Qi_Phi + ks * eye_m
    mid = PhiT_Qi_Phi + Qi
    last = Qi + kg * eye_m
    D = jnp.concatenate([first[None],
                         jnp.broadcast_to(mid, (H - 2, m, m)),
                         last[None]], axis=0)
    U = jnp.broadcast_to(-PhiT_Qi, (H - 1, m, m))
    return D, U


def gp_prior_terms(theta, start_state, goal_state, dt, sigma_start, sigma_gp,
                   sigma_goal):
    """Gradient and block-tridiagonal Hessian blocks of the GP factor graph.

    theta: (..., H, 2d) trajectory states.
    Returns (g (..., H, 2d), D (H, 2d, 2d), U (H-1, 2d, 2d)) for the quadratic
    form 0.5 ||x_0 - start||^2_Ks + 0.5 sum ||x_{t+1} - Phi x_t||^2_Q
    + 0.5 ||x_{H-1} - goal||^2_Kg, i.e. g = A theta - b_prior and (D, U) = A.
    D/U carry no batch dims (the Hessian is state-independent) — broadcast
    against per-problem terms as needed.
    """
    H = theta.shape[-2]
    m = theta.shape[-1]
    d = m // 2
    dtype = theta.dtype
    Phi = gp_transition(d, dt, dtype)
    Qi = gp_Q_inv(d, dt, sigma_gp, dtype)
    PhiT_Qi = Phi.T @ Qi

    # GP factor residuals e_t = x_{t+1} - Phi x_t, t = 0..H-2
    e = theta[..., 1:, :] - jnp.einsum("ij,...j->...i", Phi, theta[..., :-1, :])
    Qi_e = jnp.einsum("ij,...j->...i", Qi, e)
    neg_PhiT_Qi_e = -jnp.einsum("ij,...j->...i", Phi.T, Qi_e)

    zeros1 = jnp.zeros_like(theta[..., :1, :])
    g = (jnp.concatenate([neg_PhiT_Qi_e, zeros1], axis=-2)
         + jnp.concatenate([zeros1, Qi_e], axis=-2))

    ks = 1.0 / (sigma_start ** 2)
    kg = 1.0 / (sigma_goal ** 2)
    g0 = g[..., :1, :] + ks * (theta[..., :1, :] - start_state[..., None, :])
    gH = g[..., -1:, :] + kg * (theta[..., -1:, :] - goal_state[..., None, :])
    g = jnp.concatenate([g0, g[..., 1:-1, :], gH], axis=-2)

    D, U = gp_prior_blocks(d, H, dt, sigma_start, sigma_gp, sigma_goal, dtype)
    return g, D, U


def straight_line_trajs(start_state, goal_state, H: int):
    """Constant-velocity straight-line trajectory between state endpoints.

    start/goal: (..., 2d) -> (..., H, 2d); positions interpolate linearly,
    velocities set to the constant segment velocity.
    """
    m = start_state.shape[-1]
    d = m // 2
    w = jnp.linspace(0.0, 1.0, H, dtype=start_state.dtype)
    pos = (start_state[..., None, :d] * (1.0 - w)[:, None]
           + goal_state[..., None, :d] * w[:, None])
    vel = jnp.broadcast_to(
        (goal_state[..., None, :d] - start_state[..., None, :d]) / (H - 1),
        pos.shape)
    return jnp.concatenate([pos, vel], axis=-1)


def sample_gp_prior_trajs(key, start_state, goal_state, H: int,
                          num_samples: int, dt: float, sigma_gp_init: float):
    """Sample smooth initial trajectories around the straight line.

    Brownian-bridge position noise with matched velocity noise approximates
    samples from the constant-velocity GP prior pinned at the endpoints
    (replaces the reference planners' prior sampling configured by
    ``sigma_gp_init`` / ``sigma_start_init`` / ``sigma_goal_init``).
    start/goal: (2d,) -> (num_samples, H, 2d)
    """
    mean = straight_line_trajs(start_state, goal_state, H)
    m = start_state.shape[-1]
    d = m // 2
    key_w, _ = jax.random.split(key)
    dw = jax.random.normal(key_w, (num_samples, H, d), mean.dtype)
    w = jnp.cumsum(dw, axis=-2) * jnp.sqrt(dt) * sigma_gp_init
    t_frac = jnp.linspace(0.0, 1.0, H, dtype=mean.dtype)[:, None]
    bridge = w - t_frac * w[..., -1:, :]
    vel_noise = jnp.gradient(bridge, axis=-2) / dt
    noise = jnp.concatenate([bridge, vel_noise], axis=-1)
    return mean + noise
