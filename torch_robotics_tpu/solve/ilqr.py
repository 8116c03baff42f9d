"""Batched iLQR trajectory optimizer on constant-velocity dynamics.

The iLQR variant of the solver engine (the reference ships no optimizers at
all — its envs only carry hyperparameters for external planners, e.g.
/root/reference/torch_robotics/environments/env_dense_2d.py:93-121).  Where
GPMP2 (solve/gpmp2.py) treats the trajectory as a factor graph and solves the
joint block-tridiagonal system, iLQR keeps the trajectory *dynamically
feasible by construction*: states x_t = [q_t, qd_t] follow the
double-integrator x_{t+1} = Phi x_t + B u_t exactly (u = joint acceleration),
and the optimizer runs a Riccati backward pass + rolled-out forward pass.

TPU-native shape: both sweeps are `lax.scan`s over the horizon with all
small (m, m) linear algebra batched over problems via `vmap`; the line
search evaluates all candidate step sizes in one batched rollout and picks
the argmin — no data-dependent control flow, jits end-to-end.

Cost model matches GPMP2's factors so presets transfer: hinge obstacle
residuals (sigma_coll), control effort (R approx the GP process-noise
penalty), terminal goal prior (sigma_goal_prior).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["ILQRParams", "ILQRResult", "ilqr_solve"]


@dataclasses.dataclass(frozen=True)
class ILQRParams:
    n_support_points: int = 64
    dt: float = 0.04
    opt_iters: int = 50
    sigma_coll: float = 1e-2
    sigma_goal_prior: float = 1e-2
    r_control: float = 1e-4          # control-effort weight (R = r I)
    mu: float = 1e-6                 # Levenberg regularization on Q_uu
    alphas: tuple = (1.0, 0.5, 0.25, 0.1, 0.03)   # line-search step sizes


class ILQRResult(NamedTuple):
    trajs: jnp.ndarray        # (..., H, 2d) optimized state trajectories
    controls: jnp.ndarray     # (..., H-1, d) optimized accelerations
    costs: jnp.ndarray        # (...) final total costs
    cost_trace: jnp.ndarray   # (opt_iters, ...) total cost per iteration


def _dynamics_mats(d: int, dt: float, dtype):
    """Phi = [[I, dt I], [0, I]], B = [[dt^2/2 I], [dt I]]."""
    eye = jnp.eye(d, dtype=dtype)
    Phi = jnp.concatenate([
        jnp.concatenate([eye, dt * eye], axis=-1),
        jnp.concatenate([jnp.zeros((d, d), dtype), eye], axis=-1)], axis=-2)
    Bm = jnp.concatenate([0.5 * dt * dt * eye, dt * eye], axis=-2)
    return Phi, Bm


def _rollout(x0, U, Phi, Bm):
    """x0 (m,), U (H-1, d) -> states (H, m).  Exact linear dynamics."""
    def step(x, u):
        x_next = Phi @ x + Bm @ u
        return x_next, x_next
    _, xs = jax.lax.scan(step, x0, U)
    return jnp.concatenate([x0[None], xs], axis=0)


def _make_costs(residual_fn, goal_state, params: ILQRParams, d: int):
    lam = 1.0 / (params.sigma_coll ** 2)
    kg = 1.0 / (params.sigma_goal_prior ** 2)
    r = params.r_control

    def run_cost(x, u):
        res = residual_fn(x[:d])
        return 0.5 * lam * jnp.sum(jnp.square(res)) + 0.5 * r * jnp.sum(
            jnp.square(u))

    def term_cost(x):
        return 0.5 * kg * jnp.sum(jnp.square(x - goal_state))

    def total_cost(xs, U):
        rc = jax.vmap(run_cost)(xs[:-1], U)
        return jnp.sum(rc) + term_cost(xs[-1])

    return run_cost, term_cost, total_cost, lam, kg, r


def _ilqr_single(residual_fn, x0, goal_state, params: ILQRParams,
                 u_init=None):
    """iLQR for one problem: x0 (m,), goal_state (m,).  vmap over batches."""
    m = x0.shape[-1]
    d = m // 2
    H = params.n_support_points
    dtype = x0.dtype
    Phi, Bm = _dynamics_mats(d, params.dt, dtype)
    run_cost, term_cost, total_cost, lam, kg, r = _make_costs(
        residual_fn, goal_state, params, d)

    raj = getattr(residual_fn, "residuals_and_jacobian", None)

    def quadratize_state(x):
        """Gauss-Newton (l_x, l_xx) of the obstacle term at state x."""
        q = x[:d]
        if raj is not None:
            res, J = raj(q)
        else:
            res = residual_fn(q)
            J = jax.jacfwd(residual_fn)(q)
        g_q = lam * (J.T @ res)                       # (d,)
        H_qq = lam * (J.T @ J)                        # (d, d)
        l_x = jnp.concatenate([g_q, jnp.zeros((m - d,), dtype)])
        l_xx = jnp.concatenate([
            jnp.concatenate([H_qq, jnp.zeros((d, m - d), dtype)], axis=-1),
            jnp.zeros((m - d, m), dtype)], axis=-2)
        return l_x, l_xx

    eye_u = jnp.eye(d, dtype=dtype)
    eye_m = jnp.eye(m, dtype=dtype)

    def backward(xs, U):
        """Riccati sweep; returns feedforward k (H-1, d), feedback K
        (H-1, d, m).  Linear dynamics make the dynamics expansion exact."""
        l_x_T = kg * (xs[-1] - goal_state)
        l_xx_T = kg * eye_m

        l_xs, l_xxs = jax.vmap(quadratize_state)(xs[:-1])

        def step(carry, inp):
            Vx, Vxx = carry
            u, l_x, l_xx = inp
            Qx = l_x + Phi.T @ Vx
            Qu = r * u + Bm.T @ Vx
            Qxx = l_xx + Phi.T @ Vxx @ Phi
            Quu = r * eye_u + Bm.T @ Vxx @ Bm + params.mu * eye_u
            Qux = Bm.T @ Vxx @ Phi
            # solve Quu k = -Qu, Quu K = -Qux via Cholesky (Quu is PD)
            L = jnp.linalg.cholesky(Quu)
            k = -jax.scipy.linalg.cho_solve((L, True), Qu)
            K = -jax.scipy.linalg.cho_solve((L, True), Qux)
            Vx_new = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
            Vxx_new = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
            Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
            return (Vx_new, Vxx_new), (k, K)

        _, (ks, Ks) = jax.lax.scan(
            step, (l_x_T, l_xx_T), (U, l_xs, l_xxs), reverse=True)
        return ks, Ks

    def forward(xs, U, ks, Ks, alpha):
        """Closed-loop rollout with step size alpha."""
        def step(x, inp):
            x_ref, u_ref, k, K = inp
            u = u_ref + alpha * k + K @ (x - x_ref)
            x_next = Phi @ x + Bm @ u
            return x_next, (x_next, u)
        _, (xs_new, U_new) = jax.lax.scan(step, xs[0], (xs[:-1], U, ks, Ks))
        xs_new = jnp.concatenate([xs[:1], xs_new], axis=0)
        return xs_new, U_new

    def iteration(carry, _):
        xs, U, cost = carry
        ks, Ks = backward(xs, U)
        # batched line search: all alphas in one vmapped rollout, take argmin
        alphas = jnp.asarray(params.alphas, dtype)
        xs_c, U_c = jax.vmap(lambda a: forward(xs, U, ks, Ks, a))(alphas)
        costs_c = jax.vmap(total_cost)(xs_c, U_c)
        best = jnp.argmin(costs_c)
        improved = costs_c[best] < cost
        xs_n = jnp.where(improved, xs_c[best], xs)
        U_n = jnp.where(improved, U_c[best], U)
        cost_n = jnp.where(improved, costs_c[best], cost)
        return (xs_n, U_n, cost_n), cost_n

    U0 = jnp.zeros((H - 1, d), dtype) if u_init is None else u_init
    xs0 = _rollout(x0, U0, Phi, Bm)
    cost0 = total_cost(xs0, U0)
    (xs, U, cost), trace = jax.lax.scan(
        iteration, (xs0, U0, cost0), None, length=params.opt_iters)
    return ILQRResult(trajs=xs, controls=U, costs=cost, cost_trace=trace)


@partial(jax.jit, static_argnames=("residual_fn", "params"))
def ilqr_solve(residual_fn: Callable, start_state, goal_state,
               params: ILQRParams, u_init=None) -> ILQRResult:
    """Batched iLQR solve.

    residual_fn: (d,) -> (P,) per-waypoint hinge obstacle residuals (e.g.
    ``PlanningTask.collision_residuals``; its ``residuals_and_jacobian``
    analytic fast path is used when present).
    start_state/goal_state: (..., 2d).  u_init (optional): warm-start
    controls (..., H-1, d) — e.g. from a previous MPC step or a
    coarse plan; defaults to a zero-control rollout.
    Returns dynamically-feasible trajectories (states obey the double
    integrator exactly).  Runs at float32 matmul precision like the GN
    solver (the Riccati recursions inherit the GN systems' conditioning).
    """
    with jax.default_matmul_precision("float32"):
        solve = partial(_ilqr_single, residual_fn, params=params)
        batch = start_state.shape[:-1]
        if batch:
            flat_s = start_state.reshape((-1, start_state.shape[-1]))
            flat_g = goal_state.reshape((-1, goal_state.shape[-1]))
            if u_init is None:
                res = jax.vmap(lambda s, g: solve(s, g))(flat_s, flat_g)
            else:
                flat_u = u_init.reshape((-1,) + u_init.shape[-2:])
                res = jax.vmap(lambda s, g, u: solve(s, g, u_init=u))(
                    flat_s, flat_g, flat_u)
            return ILQRResult(
                trajs=res.trajs.reshape(batch + res.trajs.shape[1:]),
                controls=res.controls.reshape(batch + res.controls.shape[1:]),
                costs=res.costs.reshape(batch),
                cost_trace=jnp.moveaxis(
                    res.cost_trace, -1, 0).reshape(
                        (params.opt_iters,) + batch)
                if res.cost_trace.ndim > 1 else res.cost_trace)
        return solve(start_state, goal_state, u_init=u_init)
