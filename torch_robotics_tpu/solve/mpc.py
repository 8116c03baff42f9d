"""Receding-horizon MPC driver over the GPMP2 Gauss-Newton solver.

The real-time loop demanded by the north star (BASELINE.md): each control
step re-optimizes the H-step trajectory from the current state with a few
warm-started Gauss-Newton iterations, then advances along the plan.  Pure
functions: batched over thousands of independent MPC problems (scenario
batch), jit/shard_map-friendly.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .gp_prior import straight_line_trajs
from .gpmp2 import GPMP2Params, gpmp2_step

__all__ = ["MPCParams", "MPCState", "mpc_init", "mpc_step", "mpc_rollout"]


@dataclasses.dataclass(frozen=True)
class MPCParams:
    gpmp2: GPMP2Params = GPMP2Params()
    iters_per_step: int = 2      # warm-started GN iterations per control step


class MPCState(NamedTuple):
    theta: jnp.ndarray           # (..., H, 2d) current plan
    x: jnp.ndarray               # (..., 2d) current state


def mpc_init(start_state, goal_state, params: MPCParams) -> MPCState:
    """Initialize plans with the straight-line trajectory."""
    theta = straight_line_trajs(start_state, goal_state,
                                params.gpmp2.n_support_points)
    return MPCState(theta=theta, x=start_state)


def _reoptimize(residual_fn, theta, x, goal_state, params: MPCParams,
                ee_goal_terms=None):
    p = params.gpmp2

    def body(th, _):
        th_next, cost = gpmp2_step(residual_fn, th, x, goal_state, p,
                                   ee_goal_terms)
        return th_next, cost

    theta, costs = jax.lax.scan(body, theta, None, length=params.iters_per_step)
    return theta, costs[-1]


def mpc_step(residual_fn: Callable, state: MPCState, goal_state,
             params: MPCParams, ee_goal_terms: Callable = None):
    """One receding-horizon control step.

    1. re-optimize the plan with the start prior pinned at the current state;
    2. advance the state to the plan's next waypoint (kinematic execution);
    3. shift the plan one step (warm start), extending at the goal end.
    ``ee_goal_terms`` adds a task-space EE-pose goal factor on the horizon's
    final waypoint (solve.ee_goal) — Cartesian-goal MPC without IK.
    Returns (next MPCState, info dict).
    """
    theta, cost = _reoptimize(residual_fn, state.theta, state.x, goal_state,
                              params, ee_goal_terms)
    x_next = theta[..., 1, :]
    theta_shifted = jnp.concatenate(
        [theta[..., 1:, :], theta[..., -1:, :]], axis=-2)
    return (MPCState(theta=theta_shifted, x=x_next),
            {"collision_cost": cost,
             "dist_to_goal": jnp.linalg.norm(
                 x_next[..., : x_next.shape[-1] // 2]
                 - goal_state[..., : x_next.shape[-1] // 2], axis=-1)})


@partial(jax.jit, static_argnames=("residual_fn", "params", "n_steps",
                                   "ee_goal_terms"))
def mpc_rollout(residual_fn: Callable, start_state, goal_state,
                params: MPCParams, n_steps: int,
                ee_goal_terms: Callable = None):
    """Run ``n_steps`` receding-horizon steps; returns the executed states
    (..., n_steps, 2d) and per-step info."""
    state0 = mpc_init(start_state, goal_state, params)

    def body(state, _):
        state_next, info = mpc_step(residual_fn, state, goal_state, params,
                                    ee_goal_terms)
        return state_next, (state_next.x, info["dist_to_goal"])

    state_final, (xs, dists) = jax.lax.scan(body, state0, None, length=n_steps)
    xs = jnp.moveaxis(xs, 0, -2)
    return xs, {"dist_to_goal": dists, "final_state": state_final}
