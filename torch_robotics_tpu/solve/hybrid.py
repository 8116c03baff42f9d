"""Hybrid planning: sampling-based initialization + gradient refinement.

The reference's intended workflow (its envs ship BOTH RRT-Connect and GPMP2
presets): find a coarse collision-free path with RRT-Connect, smooth it onto
the support points with the clamped cubic spline, then refine with batched
GPMP2.  This module composes those stages.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..trajectory.utils import smoothen_trajectory
from .gpmp2 import GPMP2Params, GPMP2Result, gpmp2_solve
from .rrt import RRTConnectParams, rrt_connect

__all__ = ["plan_hybrid", "plan_mpot_gpmp2"]


def plan_hybrid(task, start_q, goal_q,
                gpmp2_params: Optional[GPMP2Params] = None,
                rrt_params: Optional[RRTConnectParams] = None,
                num_samples: int = 8, noise_scale: float = 0.02,
                key=None):
    """RRT-Connect -> spline smoothing -> batched GPMP2 refinement.

    Returns (GPMP2Result, rrt_path or None).  If RRT fails, refinement starts
    from the straight line.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if gpmp2_params is None:
        gpmp2_params = GPMP2Params.from_preset(
            task.env.get_gpmp2_params(task.robot))
    if rrt_params is None:
        try:
            rrt_params = RRTConnectParams.from_preset(
                task.env.get_rrt_connect_params(task.robot))
        except NotImplementedError:
            rrt_params = RRTConnectParams()

    start_q = jnp.asarray(start_q)
    goal_q = jnp.asarray(goal_q)
    d = start_q.shape[-1]
    H = gpmp2_params.n_support_points

    path = rrt_connect(task, np.asarray(start_q), np.asarray(goal_q),
                       rrt_params, key=key)
    if path is not None:
        pos, vel = smoothen_trajectory(
            jnp.asarray(path), n_support_points=H, dt=gpmp2_params.dt,
            set_average_velocity=True)
        theta_init = jnp.concatenate([pos, vel], axis=-1)
    else:
        from .gp_prior import straight_line_trajs
        theta_init = straight_line_trajs(
            jnp.concatenate([start_q, jnp.zeros(d)]),
            jnp.concatenate([goal_q, jnp.zeros(d)]), H)

    # jitter copies of the seed for a diverse refinement batch
    noise = (jax.random.normal(key, (num_samples, H, 2 * d),
                               theta_init.dtype) * noise_scale)
    ramp = jnp.minimum(jnp.linspace(0, 1, H), jnp.linspace(1, 0, H))
    theta0 = theta_init[None] + noise * ramp[:, None]

    start_state = jnp.concatenate([start_q, jnp.zeros(d)])
    goal_state = jnp.concatenate([goal_q, jnp.zeros(d)])
    result = gpmp2_solve(task.collision_residuals, theta0, start_state,
                         goal_state, gpmp2_params)
    return result, path


def plan_mpot_gpmp2(task, theta0, start_state, goal_state,
                    mpot_params=None, gpmp2_params=None,
                    polish_iters: int = 50, key=None,
                    fallback_polish: bool = True):
    """Sinkhorn-step exploration + Gauss-Newton polish.

    The production MPOT pipeline: the OT stage routes the trajectory
    ensemble around obstacles globally (cheap — no linear solves), then a
    short GPMP2 polish drives clearance/smoothness to solver quality.
    Measured on EnvGridCircles2D at the reference presets (B=64): the
    pipeline at 50 polish iterations reaches the same free fraction as pure
    GPMP2 at 50 iterations from a GP-prior init, with BETTER smoothness
    (6.35 vs 6.61) and path length (2.24 vs 2.28); the OT stage costs ~1%
    of the GN stage's wall-clock.

    fallback_polish: in dense scenes the OT stage can damage the ensemble —
    bounded Sinkhorn steps cannot make topological detours, so waypoints
    park against obstacle boundaries where the hinge is inactive and the
    polish inherits a worse init than the GP prior (EnvDense2D: pipeline
    0.20 free vs 0.55 for plain GPMP2@50 from the same init).  With the
    fallback, trajectories whose polished result is still in collision are
    ALSO polished from the original theta0 and the better of the two is
    kept per trajectory (standard multi-start selection; the second polish
    reuses the same compiled solve).
    """
    from .mpot import MPOTParams, mpot_solve

    if mpot_params is None:
        mpot_params = MPOTParams.from_preset(
            task.env.get_mpot_params(task.robot))
    if gpmp2_params is None:
        gpmp2_params = GPMP2Params.from_preset(
            task.env.get_gpmp2_params(task.robot))

    d = task.robot.q_dim

    def state_cost(theta):
        return task._compute_cost(theta[..., :d])

    # non-negative clearance-violation cost for the guard/clearance passes
    from ..tasks import PlanningTask
    task_h = PlanningTask(env=task.env, robot=task.robot,
                          obstacle_cutoff_margin=task.obstacle_cutoff_margin,
                          clamp_sdf_cost=True)

    def hinge_cost(theta):
        return task_h._compute_cost(theta[..., :d])

    res_mpot = mpot_solve(state_cost, theta0, start_state, goal_state,
                          mpot_params, key=key, hinge_cost_fn=hinge_cost)
    polish = GPMP2Params(**{**gpmp2_params.__dict__,
                            "opt_iters": polish_iters})
    result = gpmp2_solve(task.collision_residuals, res_mpot.trajs,
                         start_state, goal_state, polish)
    if fallback_polish:
        free = ~task.trajs_collision_masks(result.trajs[..., :d])[0]
        if not bool(free.all()):
            res_fb = gpmp2_solve(task.collision_residuals, theta0,
                                 start_state, goal_state, polish)
            free_fb = ~task.trajs_collision_masks(res_fb.trajs[..., :d])[0]
            # keep the pipeline result where it is free (or where neither
            # is); take the fallback where only it is free
            take_fb = free_fb & ~free
            result = GPMP2Result(
                trajs=jnp.where(take_fb[..., None, None], res_fb.trajs,
                                result.trajs),
                costs=jnp.where(take_fb, res_fb.costs, result.costs),
                cost_trace=result.cost_trace)
    return result, res_mpot
