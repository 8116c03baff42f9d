"""Batched CHOMP: covariant gradient descent on trajectories.

The CHOMP optimizer the reference environments ship hyperparameters for
(``get_chomp_params``, e.g.
/root/reference/torch_robotics/environments/env_dense_2d.py:123-141):
functional gradient of (prior-weighted GP smoothness energy + obstacle cost),
preconditioned by the smoothness metric (the same block-tridiagonal GP prior
Hessian used in GPMP2), with gradient clipping; fixed-iteration lax.scan.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .btridiag import block_tridiag_solve
from .btridiag_lanes import block_tridiag_solve_lanes
from .gp_prior import gp_prior_terms
from .gpmp2 import _LANES_SOLVE_MAX_M

__all__ = ["CHOMPParams", "CHOMPResult", "chomp_solve"]


@dataclasses.dataclass(frozen=True)
class CHOMPParams:
    n_support_points: int = 64
    dt: float = 0.04
    opt_iters: int = 100
    weight_prior_cost: float = 1e-4
    step_size: float = 0.05
    grad_clip: float = 0.05
    sigma_start: float = 1e-3
    sigma_gp: float = 1e-1
    sigma_goal: float = 1e-3
    sigma_coll: float = 1e-2

    @classmethod
    def from_preset(cls, preset: dict) -> "CHOMPParams":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in preset.items() if k in known}
        kwargs = {k: (int(v) if k in ("n_support_points", "opt_iters") else v)
                  for k, v in kwargs.items()}
        return cls(**kwargs)


class CHOMPResult(NamedTuple):
    trajs: jnp.ndarray
    cost_trace: jnp.ndarray


@partial(jax.jit, static_argnames=("residual_fn", "params",
                                   "per_problem_trace"))
def chomp_solve(residual_fn: Callable, theta0, start_state, goal_state,
                params: CHOMPParams,
                per_problem_trace: bool = False) -> CHOMPResult:
    """theta0: (..., H, 2d) initial trajectories.

    ``cost_trace`` is the batch-SUMMED obstacle cost per iteration
    (iters,); with ``per_problem_trace`` it keeps the batch axis
    (iters, ...) instead — the sharded wrapper uses this to exclude
    padded rows from the global statistics."""
    m = theta0.shape[-1]
    d = m // 2
    lam = 1.0 / (params.sigma_coll ** 2)

    # batch-polymorphic residuals (PlanningTask) take the batched lanes FK
    # path (~20x the vmapped per-sample form); plain per-sample fns vmap.
    # The lanes/fused GN terms hook gives the functional obstacle gradient
    # lam J^T r (and the cost) directly — on TPU that is the fused Pallas
    # terms kernel, an order of magnitude over autodiff through the chain
    batched = getattr(residual_fn, "supports_batch", False)
    lanes_terms = getattr(residual_fn, "obstacle_terms_lanes", None)

    cost_lanes = getattr(residual_fn, "collision_cost_lanes", None)

    def obstacle_cost_residuals_per_traj(theta):
        """Residual-based per-trajectory cost (..., ) — always
        differentiable.  The autodiff fallback must NOT route through the
        ``collision_cost_lanes`` hook: that is a pallas_call with no
        autodiff rule (forward-eval only)."""
        q_flat = theta[..., :d].reshape((-1, d))
        r = (residual_fn(q_flat) if batched
             else jax.vmap(residual_fn)(q_flat))
        c_pt = 0.5 * lam * jnp.square(r).reshape(r.shape[0], -1).sum(-1)
        return c_pt.reshape(theta.shape[:-2] + (-1,)).sum(-1)

    def obstacle_cost_per_traj(theta):
        """Per-trajectory obstacle cost (..., ); fused cost kernel when the
        task exposes it (per-waypoint values align with the b-major point
        flattening, so the reshape-sum recovers per-trajectory totals)."""
        if cost_lanes is not None:
            q_flat = theta[..., :d].reshape((-1, d))
            c_pt = lam * cost_lanes(q_flat.T)
            return c_pt.reshape(theta.shape[:-2] + (-1,)).sum(-1)
        return obstacle_cost_residuals_per_traj(theta)

    def obstacle_cost_residuals(theta):
        return jnp.sum(obstacle_cost_residuals_per_traj(theta))

    def obstacle_grad_and_cost(theta):
        """(d obstacle_cost / d theta, obstacle_cost)."""
        if lanes_terms is not None:
            q_cols = theta[..., :d].reshape((-1, d)).T       # (d, N)
            g_q, _, cost = lanes_terms(q_cols, lam)          # (m, N), (N,)
            g = g_q.T.reshape(theta.shape)     # velocity rows are zero
            return g, jnp.sum(cost)
        cost, g = jax.value_and_grad(obstacle_cost_residuals)(theta)
        return g, cost

    def step(theta, _):
        # functional gradient: prior-weighted smoothness + obstacle
        g_gp, D, U = gp_prior_terms(
            theta, start_state, goal_state, params.dt, params.sigma_start,
            params.sigma_gp, params.sigma_goal)
        g_obs, _ = obstacle_grad_and_cost(theta)
        g = params.weight_prior_cost * g_gp + g_obs
        g = jnp.clip(g, -params.grad_clip, params.grad_clip)
        # precondition by the smoothness metric (block-tridiagonal solve;
        # lanes layout for small blocks like the GPMP2 step)
        solver = (block_tridiag_solve_lanes if m <= _LANES_SOLVE_MAX_M
                  else block_tridiag_solve)
        delta = solver(D + 1e-6 * jnp.eye(m, dtype=theta.dtype), U, g)
        theta = theta - params.step_size * delta
        cost = obstacle_cost_per_traj(theta)
        return theta, (cost if per_problem_trace else jnp.sum(cost))

    theta, cost_trace = jax.lax.scan(step, theta0, None,
                                     length=params.opt_iters)
    return CHOMPResult(trajs=theta, cost_trace=cost_trace)
