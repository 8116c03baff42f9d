"""Batched GPMP2: Gauss-Newton trajectory optimization on a GP factor graph.

The trajectory-optimization engine the reference only ships hyperparameters
for (``get_gpmp2_params``, e.g.
/root/reference/torch_robotics/environments/env_dense_2d.py:93-121): states
x_t = [q_t, qd_t] with (1) start/goal priors (sigma_start /
sigma_goal_prior), (2) the constant-velocity GP smoothness prior (sigma_gp),
and (3) hinge obstacle residuals (sigma_coll).  Each Gauss-Newton step
assembles the block-tridiagonal normal equations and solves them with the
blocked Cholesky scan in ``btridiag`` — batched over thousands of
trajectories with vmap, jitted end-to-end.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .btridiag import block_tridiag_solve
from .btridiag_lanes import block_tridiag_solve_lanes
from .gp_prior import gp_prior_terms, sample_gp_prior_trajs, straight_line_trajs

__all__ = ["GPMP2Params", "GPMP2Result", "gpmp2_init_trajs", "gpmp2_solve",
           "gpmp2_solve_adaptive", "gpmp2_solve_restarts", "gpmp2_step"]


@dataclasses.dataclass(frozen=True)
class GPMP2Params:
    """Solver hyperparameters; field names follow the reference presets."""
    n_support_points: int = 64
    dt: float = 0.04
    opt_iters: int = 100
    num_samples: int = 64
    sigma_start: float = 1e-5
    sigma_gp: float = 1e-2
    sigma_goal_prior: float = 1e-5
    sigma_coll: float = 1e-5
    step_size: float = 1e-1
    sigma_gp_init: float = 0.2
    solver_delta: float = 1e-2   # Levenberg damping on the GN system
    stop_criteria: float = 0.0   # (informational; fixed-iteration under jit)
    # GN factorization reuse: refactor the block-tridiagonal system every
    # k-th iteration and re-solve the others with a substitution-only
    # kernel against the stale factors (fresh gradient; ~56x cheaper per
    # re-solve, benchmarks/subst_reuse_bench.py).  USE WITH CARE — the
    # safe regime is NARROW: quality-neutral only at weak collision
    # weights (sigma_coll ~5e-3, benchmarks/gn_reuse_ab.py); at
    # production weights (sigma_coll 5e-4, lam ~4e6) stale factors lack
    # curvature for hinge rows that newly enter the active set and the
    # solve steps explode along them (config-3 fraction-free 0.77 -> 0.0,
    # trajectories to ~1e3 rad — even 8 tail-end substitution steps or
    # 0.3x-damped steps collapse; round-5 sweep, /tmp-archived, summary
    # in BASELINE.md).  Also DIVERGES on 2-iter warm-started MPC steps.
    # Takes effect only on the TPU Pallas lanes path (m <= 16); ignored
    # elsewhere.
    refactor_every: int = 1

    @classmethod
    def from_preset(cls, preset: dict) -> "GPMP2Params":
        """Build from a reference-style planner-params dict
        (env get_gpmp2_params)."""
        solver = preset.get("solver_params", {}) or {}
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in preset.items() if k in known}
        if "delta" in solver:
            kwargs["solver_delta"] = solver["delta"]
        if preset.get("stop_criteria") is not None:
            kwargs["stop_criteria"] = preset["stop_criteria"]
        kwargs = {k: (int(v) if k in ("n_support_points", "opt_iters",
                                      "num_samples", "refactor_every")
                      else v)
                  for k, v in kwargs.items()}
        return cls(**kwargs)


# largest state dim routed to the XLA lanes solver.  Above it, the XLA
# reduce-form graph grows as m^2 equations and measured no faster in
# context than the tiled path (50.6 ms/iter either way at m=40, round 2);
# the m > cap branch instead routes to the Pallas COLUMN kernel on TPU
# (ops/pallas_btridiag.solve_lanes_pallas_cols: O(m) array ops per block
# step, whole sweep VMEM-resident — 1.59 vs 41.2 ms/solve at the config-4
# shapes, benchmarks/solver_m40_ab.py), with the tiled solver as the
# CPU/incompatible-shape fallback.
_LANES_SOLVE_MAX_M = 32


class GPMP2Result(NamedTuple):
    trajs: jnp.ndarray          # (..., H, 2d) optimized trajectories
    costs: jnp.ndarray          # (...) final scalar costs
    cost_trace: jnp.ndarray     # (opt_iters, ...) cost per iteration


def gpmp2_init_trajs(key, params: GPMP2Params, start_state, goal_state,
                     num_samples: Optional[int] = None):
    """Sample initial trajectories from the (approximate) GP prior."""
    n = params.num_samples if num_samples is None else num_samples
    return sample_gp_prior_trajs(
        key, start_state, goal_state, params.n_support_points, n,
        params.dt, params.sigma_gp_init)


def _obstacle_terms(residual_fn, q, d_state, lam):
    """Hinge-residual GN terms: gradient (..., m) and Hessian blocks
    (..., m, m) embedded in the position part of the state.
    residual_fn: (d,) -> (P,) per-waypoint residuals.  If the function
    carries a ``residuals_and_jacobian`` attribute (PlanningTask's analytic
    fast path), it is used instead of jacfwd through the FK chain."""
    d = q.shape[-1]
    q_flat = q.reshape((-1, d))
    raj = getattr(residual_fn, "residuals_and_jacobian", None)
    if raj is not None:
        # batch-polymorphic raj rides the lanes FK chain on ONE flattened
        # call (~5x the vmapped per-sample AoS form; see solve/ilqr.py)
        r_flat, J_flat = (raj(q_flat)
                          if getattr(raj, "supports_batch", False)
                          else jax.vmap(raj)(q_flat))
    else:
        # batch-polymorphic residuals take the batched (lanes) FK path
        r_flat = (residual_fn(q_flat)
                  if getattr(residual_fn, "supports_batch", False)
                  else jax.vmap(residual_fn)(q_flat))
        J_flat = jax.vmap(jax.jacfwd(residual_fn))(q_flat)
    r = r_flat.reshape(q.shape[:-1] + r_flat.shape[-1:])
    J = J_flat.reshape(q.shape[:-1] + J_flat.shape[-2:])
    g_q = lam * jnp.einsum("...pi,...p->...i", J, r)
    H_qq = lam * jnp.einsum("...pi,...pj->...ij", J, J)
    m = d_state
    # embed into the position part of the state by concatenation (scatter ops
    # compile pathologically slowly on some TPU toolchains)
    g = jnp.concatenate(
        [g_q, jnp.zeros(q.shape[:-1] + (m - d,), q.dtype)], axis=-1)
    top = jnp.concatenate(
        [H_qq, jnp.zeros(q.shape[:-1] + (d, m - d), q.dtype)], axis=-1)
    bottom = jnp.zeros(q.shape[:-1] + (m - d, m), q.dtype)
    Hb = jnp.concatenate([top, bottom], axis=-2)
    cost = 0.5 * lam * jnp.sum(jnp.square(r), axis=-1)
    return g, Hb, cost


def gpmp2_step(residual_fn: Callable, theta, start_state, goal_state,
               params: GPMP2Params, ee_goal_terms: Callable = None):
    """One Gauss-Newton step over a batch of trajectories.

    theta: (..., H, 2d); residual_fn: q (..., d) -> (..., P) hinge residuals.
    ee_goal_terms (optional, from solve.ee_goal.make_ee_goal_terms): extra
    task-space goal factor applied to the final waypoint.
    Returns (theta_next, scalar collision cost per trajectory).
    Traces at float32 matmul precision (ill-conditioned GN systems NaN under
    the TPU's default bf16 matmul inputs).
    """
    with jax.default_matmul_precision("float32"):
        lanes_terms = getattr(residual_fn, "obstacle_terms_lanes", None)
        if lanes_terms is not None and theta.ndim == 3:
            return _gpmp2_step_lanes_impl(lanes_terms, theta, start_state,
                                          goal_state, params, ee_goal_terms)
        return _gpmp2_step_impl(residual_fn, theta, start_state, goal_state,
                                params, ee_goal_terms)


def _lanes_gn_system(lanes_terms, theta, start_state, goal_state,
                     params: GPMP2Params, ee_goal_terms=None):
    """Assemble the lane-layout GN system for theta (B, H, m).

    Returns (b_l (H, m, B), D_l (H, m, m, B), U_l (H, m, m, 1),
    cost_traj (B,)) — the block-tridiagonal normal equations in the solver
    layout.  N ordering is h-major (n = h * B + b) so the reshape into the
    solver layout permutes only small axes."""
    B, H, m = theta.shape
    d = m // 2
    lam = 1.0 / (params.sigma_coll ** 2)

    q_cols = jnp.transpose(theta[..., :d], (2, 1, 0)).reshape(d, H * B)
    # terms emitted directly in the solver layout (H, m[, m], B): skips
    # materializing + transposing the 51 MB (m, m, H, B) Hessian-block
    # array between assembly and the solver scan (+2% end-to-end)
    g_obs_l, H_obs_l, cost = lanes_terms(q_cols, lam, h=H)

    g_gp, D, U = gp_prior_terms(
        theta, start_state, goal_state, params.dt, params.sigma_start,
        params.sigma_gp, params.sigma_goal_prior)

    g_gp_l = jnp.transpose(g_gp, (1, 2, 0))                        # (H, m, B)
    b_l = -(g_gp_l + g_obs_l)
    eye = jnp.eye(m, dtype=theta.dtype)
    D_l = (D[..., None] + H_obs_l
           + params.solver_delta * eye[..., None])                  # (H,m,m,B)
    if ee_goal_terms is not None:
        g_ee, H_ee, _ = ee_goal_terms(theta[..., -1, :d])           # (B,m),(B,m,m)
        b_l = jnp.concatenate(
            [b_l[:-1], (b_l[-1] - g_ee.T)[None]], axis=0)
        D_l = jnp.concatenate(
            [D_l[:-1], (D_l[-1] + jnp.transpose(H_ee, (1, 2, 0)))[None]],
            axis=0)
    U_pad = jnp.concatenate([U, jnp.zeros_like(U[:1])], axis=0)
    U_l = U_pad[..., None]                                          # (H,m,m,1)
    cost_traj = jnp.sum(cost, axis=0)                  # cost is (H, B)
    return b_l, D_l, U_l, cost_traj


def _gpmp2_step_lanes_impl(lanes_terms, theta, start_state, goal_state,
                           params: GPMP2Params, ee_goal_terms=None):
    """Fully lane-vectorized GN step: theta (B, H, m).

    All obstacle terms, J^T J assembly and the block-tridiagonal solve run
    with the batch in the minor (lane) dimension — zero tile padding on the
    small 3/7/14-sized dims.
    """
    from .btridiag_bcr import solve_lanes_bcr
    from .btridiag_lanes import solve_lanes_core

    B, H, m = theta.shape

    b_l, D_l, U_l, cost_traj = _lanes_gn_system(
        lanes_terms, theta, start_state, goal_state, params, ee_goal_terms)

    # the fused-scan sweep beats log-depth cyclic reduction here (measured
    # 104 vs 150 ms/step at H=64, B=1024 — the BCR levels' unrolled block
    # kernels fuse worse than the scan body); solve_lanes_bcr remains
    # available for very long horizons
    del solve_lanes_bcr
    if m <= _LANES_SOLVE_MAX_M:
        # Pallas VMEM sweep when on TPU at compatible shapes (the XLA scan
        # round-trips per-step intermediates through HBM; the kernel keeps
        # the whole sweep resident: 1.33 vs 2.04 ms at the bench shapes),
        # else the XLA lanes solver
        from ..ops.pallas_btridiag import solve_lanes_auto
        x_l = solve_lanes_auto(D_l, U_l, b_l)                       # (H, m, B)
        delta = jnp.transpose(x_l, (2, 0, 1))
    else:
        # very large state blocks (multi-robot m=40): the Pallas COLUMN
        # kernel keeps the whole sweep VMEM-resident with an O(m)-equation
        # body — 1.59 vs 41.2 ms/solve at H=32, m=40, B=256 against the
        # tiled path (benchmarks/solver_m40_ab.py, in-graph-D chained
        # timing; parity 6e-7, stable on GN-like 1e8-precision systems);
        # trsv backward tail 1.507 vs 1.601 (benchmarks/btridiag_trsv_ab.py)
        from ..ops.pallas_btridiag import (pallas_tile_for,
                                           solve_lanes_pallas_cols)
        B_l = D_l.shape[-1]
        tb = pallas_tile_for(H, m, B_l)
        if tb is not None:
            x_l = solve_lanes_pallas_cols(D_l, U_l, b_l, tile_b=tb,
                                          bwd_trsv=True)
            delta = jnp.transpose(x_l, (2, 0, 1))
        else:
            # CPU / incompatible shapes: the reduce-form lanes Cholesky
            # graph grows as m^2 equations; the tiled generic solver
            # (pads (m, m) blocks to (m, 128) tiles) takes over
            from .btridiag import block_tridiag_solve
            D_b = jnp.transpose(D_l, (3, 0, 1, 2))                  # (B,H,m,m)
            b_b = jnp.transpose(b_l, (2, 0, 1))                    # (B, H, m)
            delta = block_tridiag_solve(D_b, U_l[:-1, :, :, 0], b_b)
    theta_next = theta + params.step_size * delta
    return theta_next, cost_traj


def _gpmp2_step_impl(residual_fn, theta, start_state, goal_state,
                     params: GPMP2Params, ee_goal_terms=None):
    m = theta.shape[-1]
    d = m // 2
    g_gp, D, U = gp_prior_terms(
        theta, start_state, goal_state, params.dt, params.sigma_start,
        params.sigma_gp, params.sigma_goal_prior)
    lam = 1.0 / (params.sigma_coll ** 2)
    g_obs, H_obs, cost_obs = _obstacle_terms(residual_fn, theta[..., :d], m, lam)
    g = g_gp + g_obs
    D = D + H_obs + params.solver_delta * jnp.eye(m, dtype=theta.dtype)
    if ee_goal_terms is not None:
        d = m // 2
        g_ee, H_ee, _ = ee_goal_terms(theta[..., -1, :d])
        g = jnp.concatenate(
            [g[..., :-1, :], (g[..., -1, :] + g_ee)[..., None, :]], axis=-2)
        D = jnp.concatenate(
            [D[..., :-1, :, :],
             (D[..., -1, :, :] + H_ee)[..., None, :, :]], axis=-3)
    # lane-vectorized solver for small state blocks (zero tile padding)
    solver = (block_tridiag_solve_lanes if m <= _LANES_SOLVE_MAX_M
              else block_tridiag_solve)
    delta = solver(D, U, -g)
    theta_next = theta + params.step_size * delta
    return theta_next, jnp.sum(cost_obs, axis=-1)


@partial(jax.jit, static_argnames=("residual_fn", "params", "ee_goal_terms"))
def gpmp2_solve(residual_fn: Callable, theta0, start_state, goal_state,
                params: GPMP2Params,
                ee_goal_terms: Callable = None) -> GPMP2Result:
    """Run ``opt_iters`` Gauss-Newton iterations (fixed count under jit).

    theta0: (..., H, 2d) initial trajectories (e.g. from gpmp2_init_trajs).
    ee_goal_terms: optional task-space goal factor (solve.ee_goal).
    ``params.refactor_every > 1`` enables GN factorization reuse on the
    TPU Pallas lanes path (see the field's docstring); elsewhere it is
    ignored and every iteration refactors.
    """
    if params.refactor_every > 1 and theta0.ndim == 3:
        lanes_terms = getattr(residual_fn, "obstacle_terms_lanes", None)
        B, H, m = theta0.shape
        if lanes_terms is not None and m <= _LANES_SOLVE_MAX_M:
            from ..ops.pallas_btridiag import (_SCALAR_KERNEL_MAX_M,
                                               pallas_tile_for_factor)
            tb = pallas_tile_for_factor(H, m, B)
            if m <= _SCALAR_KERNEL_MAX_M and tb is not None:
                return _gpmp2_solve_reuse(lanes_terms, theta0, start_state,
                                          goal_state, params, ee_goal_terms,
                                          tb)

    def step(theta, _):
        theta_next, cost = gpmp2_step(residual_fn, theta, start_state,
                                      goal_state, params, ee_goal_terms)
        return theta_next, cost

    theta, cost_trace = jax.lax.scan(step, theta0, None,
                                     length=params.opt_iters)
    return GPMP2Result(trajs=theta, costs=cost_trace[-1],
                       cost_trace=cost_trace)


def _gpmp2_solve_reuse(lanes_terms, theta0, start_state, goal_state,
                       params: GPMP2Params, ee_goal_terms, tile_b,
                       interpret: bool = False) -> GPMP2Result:
    """GN solve with factorization reuse (``params.refactor_every`` = k).

    Iterations 0, k, 2k, ... factor the fresh block-tridiagonal system
    with the factor-persisting Pallas sweep; the others re-solve the STALE
    factors against the fresh gradient with the substitution-only kernel
    (~3m^2 vs ~1.7m^3 equations per block step — the sweep is issue-bound,
    so the op-count ratio is wall-clock).  Quality measured neutral on
    long batch solves, divergent on warm-started 2-iter MPC steps
    (benchmarks/gn_reuse_ab.py) — this path is only reached through
    ``gpmp2_solve``/``gpmp2_solve_restarts`` when the caller opts in."""
    from ..ops.pallas_btridiag import (solve_lanes_pallas_factor,
                                       solve_lanes_pallas_subst)
    B, H, m = theta0.shape
    sched = (jnp.arange(params.opt_iters) % params.refactor_every) == 0
    # factor carries derived from an operand (shard_map vma, lesson 8)
    F0 = jnp.zeros((H, m, m, B), theta0.dtype) + 0.0 * theta0[0, 0, 0]

    with jax.default_matmul_precision("float32"):
        def step(carry, refac):
            theta, L, W = carry
            b_l, D_l, U_l, cost_traj = _lanes_gn_system(
                lanes_terms, theta, start_state, goal_state, params,
                ee_goal_terms)
            x_l, L, W = jax.lax.cond(
                refac,
                lambda L, W: solve_lanes_pallas_factor(
                    D_l, U_l, b_l, tile_b=tile_b, interpret=interpret),
                lambda L, W: (solve_lanes_pallas_subst(
                    L, W, b_l, tile_b=tile_b, interpret=interpret), L, W),
                L, W)
            theta_next = theta + params.step_size * jnp.transpose(
                x_l, (2, 0, 1))
            return (theta_next, L, W), cost_traj

        (theta, _, _), cost_trace = jax.lax.scan(step, (theta0, F0, F0),
                                                 sched)
    return GPMP2Result(trajs=theta, costs=cost_trace[-1],
                       cost_trace=cost_trace)


def gpmp2_solve_restarts(residual_fn: Callable, theta0, start_state,
                         goal_state, params: GPMP2Params, free_fn: Callable,
                         key, ee_goal_terms: Callable = None,
                         restart_rounds: int = 1,
                         restart_iters: Optional[int] = None) -> GPMP2Result:
    """GPMP2 with random restarts of collision-failing trajectories.

    The production quality lever for hard scenes: after the main solve,
    trajectories that ``free_fn`` (e.g. ``lambda t: ~task.
    trajs_collision_masks(t)[0]``) flags as in collision are re-initialized
    with fresh GP-prior samples and re-solved for ``restart_iters``
    iterations (already-free solutions are kept untouched — the re-solve
    runs the full batch for static shapes, but its results are only adopted
    for the failures).  Failures are roughly independent across restarts,
    so k rounds turn a fraction-free p into ~1 - (1-p)^(k+1).

    Each round costs one ``restart_iters``-iteration batch solve; with the
    iteration budget split (e.g. 50 main + 30 restart instead of 150
    fixed), this is both faster and higher-quality than one long solve
    (measured on config 3: see BASELINE.md round 3).
    """
    res = gpmp2_solve(residual_fn, theta0, start_state, goal_state, params,
                      ee_goal_terms)
    trajs, costs = res.trajs, res.costs
    B = theta0.shape[0]
    it_r = (max(params.opt_iters // 2, 1) if restart_iters is None
            else int(restart_iters))
    p_r = dataclasses.replace(params, opt_iters=it_r)
    for _ in range(max(int(restart_rounds), 0)):
        free = free_fn(trajs)
        key, k = jax.random.split(key)
        theta_new = sample_gp_prior_trajs(
            k, start_state, goal_state, params.n_support_points, B,
            params.dt, params.sigma_gp_init)
        theta_init = jnp.where(free[:, None, None], trajs, theta_new)
        res_r = gpmp2_solve(residual_fn, theta_init, start_state, goal_state,
                            p_r, ee_goal_terms)
        trajs = jnp.where(free[:, None, None], trajs, res_r.trajs)
        costs = jnp.where(free, costs, res_r.costs)
    return GPMP2Result(trajs=trajs, costs=costs, cost_trace=res.cost_trace)


@partial(jax.jit, static_argnames=("residual_fn", "params", "ee_goal_terms"))
def gpmp2_solve_adaptive(residual_fn: Callable, theta0, start_state,
                         goal_state, params: GPMP2Params,
                         ee_goal_terms: Callable = None):
    """Gauss-Newton with early exit on ``stop_criteria``.

    Runs at most ``opt_iters`` iterations, stopping as soon as every
    trajectory's relative cost improvement drops below
    ``params.stop_criteria`` (the check the reference presets carry as
    ``stop_criteria``; a fixed-count scan cannot honor it — this variant
    uses ``lax.while_loop`` and actually skips the remaining iterations,
    which is where MPC warm starts win).  Falls back to the fixed-count
    solve when ``stop_criteria <= 0``.

    Returns (trajs, costs, n_iters_run).
    """
    if params.stop_criteria <= 0.0:
        res = gpmp2_solve(residual_fn, theta0, start_state, goal_state,
                          params, ee_goal_terms)
        return res.trajs, res.costs, jnp.asarray(params.opt_iters)

    def cond(state):
        i, _, cost_prev, cost = state
        rel = jnp.abs(cost_prev - cost) / jnp.maximum(jnp.abs(cost_prev),
                                                      1e-10)
        return (i < params.opt_iters) & jnp.any(rel > params.stop_criteria)

    def body(state):
        i, theta, _, cost = state
        theta_next, cost_next = gpmp2_step(residual_fn, theta, start_state,
                                           goal_state, params, ee_goal_terms)
        return i + 1, theta_next, cost, cost_next

    # finite sentinels force the first two iterations (inf - inf would NaN
    # the relative-improvement check and exit immediately)
    batch = theta0.shape[:-2]
    state0 = (jnp.asarray(0), theta0,
              jnp.full(batch, 1e10, theta0.dtype),
              jnp.zeros(batch, theta0.dtype))
    n_iters, theta, _, cost = jax.lax.while_loop(cond, body, state0)
    return theta, cost, n_iters
