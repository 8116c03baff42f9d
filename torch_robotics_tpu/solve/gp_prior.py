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

import functools

import jax
import jax.numpy as jnp

__all__ = ["gp_transition", "gp_Q_inv", "gp_prior_terms",
           "gp_bridge_sampler_matrix", "gp_bridge_mean",
           "gp_bridge_mean_matrices", "sample_gp_prior_trajs",
           "straight_line_trajs"]


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


def _gp_bridge_precision(d: int, H: int, dt: float, sigma_gp: float,
                         sigma_endpoint: float):
    """Dense (n, n) float64 numpy precision of the endpoint-conditioned
    constant-velocity GP prior (transition factors + endpoint state priors).
    Host-side: everything is static, and the factorizations derived from it
    (Cholesky for sampling, inverse columns for the conditioned mean) are
    trace-time constants."""
    import numpy as np

    m = 2 * d
    eye = np.eye(d)
    Phi = np.block([[eye, dt * eye], [np.zeros((d, d)), eye]])
    qc_inv = 1.0 / float(sigma_gp) ** 2
    Qi = np.block([[12.0 / dt ** 3 * eye, -6.0 / dt ** 2 * eye],
                   [-6.0 / dt ** 2 * eye, 4.0 / dt * eye]]) * qc_inv
    PtQ = Phi.T @ Qi
    P = np.zeros((H, m, H, m))
    for t in range(H - 1):
        P[t, :, t, :] += PtQ @ Phi
        P[t + 1, :, t + 1, :] += Qi
        P[t, :, t + 1, :] -= PtQ
        P[t + 1, :, t, :] -= PtQ.T
    ke = 1.0 / float(sigma_endpoint) ** 2
    P[0, :, 0, :] += ke * np.eye(m)
    P[-1, :, -1, :] += ke * np.eye(m)
    return P.reshape(H * m, H * m), ke


@functools.lru_cache(maxsize=32)
def gp_bridge_mean_matrices(d: int, H: int, dt: float, sigma_gp: float,
                            sigma_endpoint: float = 1e-5,
                            dtype=jnp.float32):
    """(W_s, W_g), each (H*2d, 2d): the conditioned GP prior MEAN is
    ``mu = start @ W_s.T + goal @ W_g.T`` reshaped (..., H, 2d) — the
    minimum-GP-energy trajectory between the endpoint STATES (zero endpoint
    velocities give the classic cubic-blended profile).  A constant-velocity
    straight line cannot satisfy zero endpoint velocities, so its energy
    under the endpoint priors is ~1e10; this mean is the correct
    initialization for optimizers that score candidates under the GP cost.
    """
    import numpy as np

    m = 2 * d
    P, ke = _gp_bridge_precision(d, H, dt, sigma_gp, sigma_endpoint)
    Pinv = np.linalg.inv(P)
    W_s = ke * Pinv[:, :m]
    W_g = ke * Pinv[:, -m:]
    return jnp.asarray(W_s, dtype), jnp.asarray(W_g, dtype)


def gp_bridge_mean(start_state, goal_state, H: int, dt: float,
                   sigma_gp: float, sigma_endpoint: float = 1e-5):
    """Conditioned GP prior mean trajectories: (..., 2d) -> (..., H, 2d)."""
    d = start_state.shape[-1] // 2
    W_s, W_g = gp_bridge_mean_matrices(
        d, H, dt, sigma_gp, sigma_endpoint, start_state.dtype)
    mu = start_state @ W_s.T + goal_state @ W_g.T
    return mu.reshape(start_state.shape[:-1] + (H, 2 * d))


@functools.lru_cache(maxsize=32)
def gp_bridge_sampler_matrix(d: int, H: int, dt: float, sigma_gp: float,
                             sigma_endpoint: float = 1e-5,
                             dtype=jnp.float32):
    """Exact sampler for the endpoint-conditioned GP prior: returns M (n, n),
    n = H*2d, such that ``eps = xi @ M.T`` with ``xi ~ N(0, I)`` is
    distributed N(0, P^{-1}) where P is the block-tridiagonal precision of
    the constant-velocity GP bridge (transition factors weighted by
    Q^{-1}(sigma_gp) plus ``1/sigma_endpoint^2 I`` priors pinning both
    endpoint states).

    Unlike a Brownian-bridge-with-finite-difference-velocities heuristic,
    these samples satisfy the transition model statistically: their expected
    GP energy under the same precision is n/2, so a sampling-based optimizer
    evaluating candidates under the GP cost is not drowned by the
    perturbation's own smoothness penalty (the heuristic's central-difference
    velocities violate the integrator and cost ~1e8 at H=32).

    Precision assembly + Cholesky + triangular inverse run host-side in
    float64 numpy at trace time (everything is static); applying the factor
    is one (KB, n) x (n, n) MXU matmul.  M = L^{-T} with P = L L^T:
    cov(L^{-T} xi) = (L L^T)^{-1} = P^{-1}.
    """
    import numpy as np

    P, _ = _gp_bridge_precision(d, H, dt, sigma_gp, sigma_endpoint)
    L = np.linalg.cholesky(P)
    M = np.linalg.inv(L).T        # upper triangular
    return jnp.asarray(M, dtype)


def straight_line_trajs(start_state, goal_state, H: int, dt: float = None):
    """Constant-velocity straight-line trajectory between state endpoints.

    start/goal: (..., 2d) -> (..., H, 2d); positions interpolate linearly,
    velocities set to the constant segment velocity Δq/dt (so the state
    sequence satisfies the integrator q_{t+1} = q_t + dt·qd_t exactly and
    its GP transition energy is ~0 — without the 1/dt the "straight line"
    carried ~1e7-scale GP energy at H=32, which poisoned sampling-based
    optimizers that score candidates under the GP prior).

    dt=None keeps the legacy per-step convention (velocity = Δq per step)
    for callers that only use the positions.
    """
    m = start_state.shape[-1]
    d = m // 2
    w = jnp.linspace(0.0, 1.0, H, dtype=start_state.dtype)
    pos = (start_state[..., None, :d] * (1.0 - w)[:, None]
           + goal_state[..., None, :d] * w[:, None])
    step_t = (H - 1) * dt if dt is not None else (H - 1)
    vel = jnp.broadcast_to(
        (goal_state[..., None, :d] - start_state[..., None, :d]) / step_t,
        pos.shape)
    return jnp.concatenate([pos, vel], axis=-1)


def sample_gp_prior_trajs(key, start_state, goal_state, H: int,
                          num_samples: int, dt: float, sigma_gp_init: float):
    """Sample smooth initial trajectories from the endpoint-conditioned GP.

    EXACT samples: conditioned prior mean (zero-endpoint-velocity cubic
    bridge) + N(0, P^{-1}) noise via the host-factored precision
    (``gp_bridge_sampler_matrix``) — one MXU matmul.  Replaces the earlier
    Brownian-bridge + finite-difference-velocity heuristic, whose velocity
    noise violated the integrator transition model (GP energy ~1e8/sample
    at H=32 instead of the prior's expected n/2).  Matches the reference
    planners' prior sampling configured by ``sigma_gp_init`` /
    ``sigma_start_init`` / ``sigma_goal_init``.
    start/goal: (2d,) -> (num_samples, H, 2d)
    """
    m = start_state.shape[-1]
    d = m // 2
    mean = gp_bridge_mean(start_state, goal_state, H, dt, sigma_gp_init)
    M = gp_bridge_sampler_matrix(d, H, dt, sigma_gp_init, dtype=mean.dtype)
    key_w, _ = jax.random.split(key)
    xi = jax.random.normal(key_w, (num_samples, H * m), mean.dtype)
    noise = (xi @ M.T).reshape((num_samples, H, m))
    # plain broadcasting, as before: callers pass num_samples=B with batched
    # endpoints for one sample per problem, or unbatched endpoints for
    # num_samples particles
    return mean + noise
