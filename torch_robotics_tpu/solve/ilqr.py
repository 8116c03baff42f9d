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
    # running goal-POSITION cost (receding-horizon regulation): 0.0 disables.
    # With terminal-only goal cost an MPC loop executing the first control
    # of each plan never contracts — "always H steps left to arrive" leaves
    # the immediate motion unconstrained; a small running pull toward the
    # goal position makes the loop contractive.  Position-only: including
    # velocity in the pull damps motion itself and slows convergence
    # (A/B'd: state-pull sigma=0.1 reaches 0.41 rad in 30 steps, 0.05 only
    # 0.46; position-only is strictly better at equal weight).
    sigma_goal_running: float = 0.0
    # joint-limit hinge weight (0.0 disables): running cost
    # 0.5/sigma^2 * (relu(q - q_max)^2 + relu(q_min - q)^2), active only
    # when limits are passed to ilqr_solve via q_limits — the unconstrained
    # double integrator otherwise overshoots clipped-to-limit goals and the
    # executed states leave the joint range (trajectory validators count
    # out-of-limit states as collisions)
    sigma_limits: float = 0.0
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


def _make_costs(residual_fn, refs, params: ILQRParams, d: int,
                q_limits=None):
    """refs (H, m): per-step targets of the running/terminal goal costs —
    a broadcast goal state (regulation) or a planned trajectory window
    (tracking MPC)."""
    lam = 1.0 / (params.sigma_coll ** 2)
    kg = 1.0 / (params.sigma_goal_prior ** 2)
    kr = (0.0 if params.sigma_goal_running == 0.0
          else 1.0 / (params.sigma_goal_running ** 2))
    kl = (0.0 if params.sigma_limits == 0.0 or q_limits is None
          else 1.0 / (params.sigma_limits ** 2))
    r = params.r_control

    def run_cost(x, u, ref):
        res = residual_fn(x[:d])
        c = 0.5 * lam * jnp.sum(jnp.square(res)) + 0.5 * r * jnp.sum(
            jnp.square(u))
        if kr:
            c = c + 0.5 * kr * jnp.sum(jnp.square(x[:d] - ref[..., :d]))
        if kl:
            q = x[:d]
            c = c + 0.5 * kl * jnp.sum(
                jnp.square(jax.nn.relu(q - q_limits[1]))
                + jnp.square(jax.nn.relu(q_limits[0] - q)))
        return c

    def term_cost(x):
        return 0.5 * kg * jnp.sum(jnp.square(x - refs[-1]))

    def total_cost(xs, U):
        rc = jax.vmap(run_cost)(xs[:-1], U, refs[:-1])
        return jnp.sum(rc) + term_cost(xs[-1])

    return run_cost, term_cost, total_cost, lam, kg, kr, kl, r


def _ilqr_single(residual_fn, x0, goal_state, params: ILQRParams,
                 u_init=None, x_ref=None, q_limits=None):
    """iLQR for one problem: x0 (m,), goal_state (m,).  vmap over batches.
    x_ref (H, m) optional reference trajectory for the goal costs
    (tracking mode); defaults to the goal state at every step.
    q_limits optional (q_min (d,), q_max (d,)) for the limit hinge."""
    m = x0.shape[-1]
    d = m // 2
    H = params.n_support_points
    dtype = x0.dtype
    refs = (jnp.broadcast_to(goal_state, (H, m)) if x_ref is None
            else x_ref)
    Phi, Bm = _dynamics_mats(d, params.dt, dtype)
    run_cost, term_cost, total_cost, lam, kg, kr, kl, r = _make_costs(
        residual_fn, refs, params, d, q_limits)
    sqrt_kr = kr ** 0.5
    sqrt_kl = kl ** 0.5

    raj = getattr(residual_fn, "residuals_and_jacobian", None)

    def quadratize_state(x, ref):
        """Gauss-Newton gradient + FACTORED Hessian of the obstacle term.

        Returns (l_x (m,), F (P, m)) with l_xx = F^T F: the GN structure
        lam * J^T J factors exactly as (sqrt(lam) J)^T (sqrt(lam) J), so the
        square-root backward pass never forms the ill-conditioned product.
        """
        q = x[:d]
        if raj is not None:
            res, J = raj(q)
        else:
            res = residual_fn(q)
            J = jax.jacfwd(residual_fn)(q)
        g_q = lam * (J.T @ res)                       # (d,)
        l_x = jnp.concatenate([g_q, jnp.zeros((m - d,), dtype)])
        F = jnp.concatenate(
            [jnp.sqrt(lam) * J, jnp.zeros(J.shape[:-1] + (m - d,), dtype)],
            axis=-1)                                  # (P, m)
        if kr:
            l_x = l_x + kr * jnp.concatenate(
                [x[:d] - ref[..., :d], jnp.zeros((m - d,), dtype)])
            F = jnp.concatenate(
                [F, sqrt_kr * jnp.eye(d, m, dtype=dtype)], axis=0)  # rows +d
        if kl:
            r_hi = jax.nn.relu(q - q_limits[1])
            r_lo = jax.nn.relu(q_limits[0] - q)
            l_x = l_x + kl * jnp.concatenate(
                [r_hi - r_lo, jnp.zeros((m - d,), dtype)])
            act = ((r_hi > 0) | (r_lo > 0)).astype(dtype)
            F = jnp.concatenate(
                [F, sqrt_kl * act[:, None] * jnp.eye(d, m, dtype=dtype)],
                axis=0)
        return l_x, F

    eye_u = jnp.eye(d, dtype=dtype)
    eye_m = jnp.eye(m, dtype=dtype)
    sqrt_ru = jnp.sqrt(r + params.mu)

    def backward(xs, U):
        """Square-root Riccati sweep; returns feedforward k (H-1, d),
        feedback K (H-1, d, m).  Linear dynamics make the dynamics
        expansion exact.

        The value Hessian is propagated as a factor S with Vxx = S^T S
        (initialized to sqrt(kg) I).  Each step QR-factors the stacked
        array A = [[sqrt(r+mu) I, 0], [S B, S Phi], [0, F_t]] whose Gram is
        the full [[Quu, Qux], [Qux^T, Qxx]] block: R11^T R11 = Quu,
        R11^{-1} R12 = Quu^{-1} Qux, and R22^T R22 is EXACTLY the Schur
        complement Qxx - Qux^T Quu^{-1} Qux = Vxx_next — computed without
        the catastrophic float32 cancellation of the dense recursion, and
        PSD by construction.  The plain Cholesky sweep NaNs on TPU/float32
        at kg/r ratios ~1e10 (terminal-goal weight vs near-free control):
        cancellation noise eps*kg ~ 5e-3 swamps the smallest Schur
        eigenvalues, Vxx goes indefinite, and cholesky(Quu) returns NaN
        from step 2 on.  Dynamic range here is sqrt(kg)/sqrt(r) instead.
        """
        l_x_T = kg * (xs[-1] - refs[-1])
        S_T = jnp.sqrt(kg) * eye_m

        l_xs, Fs = jax.vmap(quadratize_state)(xs[:-1], refs[:-1])
        P = Fs.shape[-2]
        zeros_du = jnp.zeros((d, m), dtype)
        zeros_Pd = jnp.zeros((P, d), dtype)

        def step(carry, inp):
            Vx, S = carry
            u, l_x, F = inp
            SB = S @ Bm                               # (m, d)
            SPhi = S @ Phi                            # (m, m)
            A = jnp.concatenate([
                jnp.concatenate([sqrt_ru * eye_u, zeros_du], axis=-1),
                jnp.concatenate([SB, SPhi], axis=-1),
                jnp.concatenate([zeros_Pd, F], axis=-1)], axis=0)
            R = jnp.linalg.qr(A, mode="r")            # (d+m, d+m) upper tri
            R11 = R[:d, :d]
            R12 = R[:d, d:]
            S_new = R[d:, d:]                         # Vxx_next = S^T S
            Qx = l_x + Phi.T @ Vx
            Qu = r * u + Bm.T @ Vx
            # k = -Quu^{-1} Qu via two triangular solves with R11
            w = jax.scipy.linalg.solve_triangular(R11.T, Qu, lower=True)
            k = -jax.scipy.linalg.solve_triangular(R11, w, lower=False)
            K = -jax.scipy.linalg.solve_triangular(R11, R12, lower=False)
            # Vx_next = Qx + Qux^T k, with Qux = R11^T R12
            Vx_new = Qx + R12.T @ (R11 @ k)
            return (Vx_new, S_new), (k, K)

        _, (ks, Ks) = jax.lax.scan(
            step, (l_x_T, S_T), (U, l_xs, Fs), reverse=True)
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
               params: ILQRParams, u_init=None, x_ref=None,
               q_limits=None) -> ILQRResult:
    """Batched iLQR solve.

    residual_fn: (d,) -> (P,) per-waypoint hinge obstacle residuals (e.g.
    ``PlanningTask.collision_residuals``; its ``residuals_and_jacobian``
    analytic fast path is used when present).
    start_state/goal_state: (..., 2d).  u_init (optional): warm-start
    controls (..., H-1, d) — e.g. from a previous MPC step or a
    coarse plan; defaults to a zero-control rollout.
    x_ref (optional): (..., H, 2d) reference trajectory for the
    running/terminal goal costs — tracking-MPC mode: a receding window of
    a converged plan, so the controller follows the plan's detours instead
    of pulling straight at a point target through obstacles.
    q_limits (optional): (q_min (d,), q_max (d,)) joint limits, shared
    across the batch; activates the ``sigma_limits`` hinge cost.
    Returns dynamically-feasible trajectories (states obey the double
    integrator exactly).  Runs at float32 matmul precision like the GN
    solver (the Riccati recursions inherit the GN systems' conditioning).
    """
    with jax.default_matmul_precision("float32"):
        solve = partial(_ilqr_single, residual_fn, params=params,
                        q_limits=q_limits)
        batch = start_state.shape[:-1]
        if batch:
            flat_s = start_state.reshape((-1, start_state.shape[-1]))
            flat_g = goal_state.reshape((-1, goal_state.shape[-1]))
            opt = {}
            if u_init is not None:
                opt["u_init"] = u_init.reshape((-1,) + u_init.shape[-2:])
            if x_ref is not None:
                opt["x_ref"] = x_ref.reshape((-1,) + x_ref.shape[-2:])
            if opt:
                in_axes = {k: 0 for k in opt}
                res = jax.vmap(
                    lambda s, g, kw: solve(s, g, **kw),
                    in_axes=(0, 0, in_axes))(flat_s, flat_g, opt)
            else:
                res = jax.vmap(lambda s, g: solve(s, g))(flat_s, flat_g)
            return ILQRResult(
                trajs=res.trajs.reshape(batch + res.trajs.shape[1:]),
                controls=res.controls.reshape(batch + res.controls.shape[1:]),
                costs=res.costs.reshape(batch),
                cost_trace=jnp.moveaxis(
                    res.cost_trace, -1, 0).reshape(
                        (params.opt_iters,) + batch)
                if res.cost_trace.ndim > 1 else res.cost_trace)
        return solve(start_state, goal_state, u_init=u_init, x_ref=x_ref)
