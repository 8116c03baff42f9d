"""Planner-quality benchmark: MPOT vs GPMP2 on EnvGridCircles2D.

Runs both planners at their reference preset budgets
(env.get_mpot_params / env.get_gpmp2_params,
/root/reference/torch_robotics/environments/env_grid_circles_2d.py:64-119)
from the same GP-prior initializations, and reports fraction of
collision-free trajectories, smoothness, and path length.

Run: python benchmarks/mpot_vs_gpmp2.py [--small]
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/trt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def trajectory_metrics(task, trajs):
    from torch_robotics_tpu.trajectory.metrics import (compute_path_length,
                                                       compute_smoothness)
    frac_free = task.compute_fraction_free_trajs(trajs)
    pl = float(compute_path_length(trajs, task.robot).mean())
    sm = float(compute_smoothness(trajs, task.robot).mean())
    return {"fraction_free": round(frac_free, 3),
            "path_length": round(pl, 3), "smoothness": round(sm, 3)}


def main(small=False):
    from torch_robotics_tpu.envs import EnvGridCircles2D
    from torch_robotics_tpu.robots import RobotPointMass
    from torch_robotics_tpu.solve import (GPMP2Params, gpmp2_init_trajs,
                                          gpmp2_solve)
    from torch_robotics_tpu.solve.mpot import MPOTParams, mpot_solve
    from torch_robotics_tpu.tasks import PlanningTask

    env = EnvGridCircles2D(precompute_sdf_obj_fixed=False)
    robot = RobotPointMass.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.01)
    d = robot.q_dim
    B = 16 if small else 64
    H = 64

    # the 0.3-pitch circle grid has obstacles exactly at (+-0.9, +-0.9);
    # diagonal midpoints between circles are free (env sdf ~ +0.11)
    start = jnp.array([-0.75, -0.75, 0.0, 0.0])
    goal = jnp.array([0.75, 0.75, 0.0, 0.0])

    # same initialization family for both planners (GP prior samples at the
    # preset's sigma_gp_init)
    mpot_preset = env.get_mpot_params(robot)
    gp_preset = env.get_gpmp2_params(robot)
    gpmp2_params = GPMP2Params.from_preset(gp_preset)
    gpmp2_params = GPMP2Params(**{**gpmp2_params.__dict__,
                                  "num_samples": B})
    theta0 = gpmp2_init_trajs(jax.random.PRNGKey(0), gpmp2_params,
                              start, goal)

    results = {}

    # --- GPMP2 at its preset budget and at the polish budget ---
    for n in (gpmp2_params.opt_iters, 50):
        p = GPMP2Params(**{**gpmp2_params.__dict__, "opt_iters": n})
        t0 = time.perf_counter()
        res = gpmp2_solve(task.collision_residuals, theta0, start, goal, p)
        jax.block_until_ready(res.trajs)
        results[f"gpmp2_{n}"] = {
            **trajectory_metrics(task, res.trajs),
            "opt_iters": n,
            "wall_s": round(time.perf_counter() - t0, 2),
        }

    # --- MPOT (raw Sinkhorn stage) and the production pipeline ---
    from torch_robotics_tpu.solve.hybrid import plan_mpot_gpmp2

    def state_cost(theta):
        return task._compute_cost(theta[..., :d])

    m_params = MPOTParams.from_preset(
        {**mpot_preset, "sigma_start": 1e-3, "sigma_goal": 1e-3})
    task_h = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.01,
                          clamp_sdf_cost=True)
    t0 = time.perf_counter()
    res_m = mpot_solve(state_cost, theta0, start, goal, m_params,
                       hinge_cost_fn=lambda th: task_h._compute_cost(
                           th[..., :d]))
    jax.block_until_ready(res_m.trajs)
    results["mpot_raw"] = {
        **trajectory_metrics(task, res_m.trajs),
        "opt_iters": m_params.opt_iters,
        "wall_s": round(time.perf_counter() - t0, 2),
    }

    t0 = time.perf_counter()
    res_p, _ = plan_mpot_gpmp2(task, theta0, start, goal,
                               mpot_params=m_params,
                               gpmp2_params=gpmp2_params, polish_iters=50)
    jax.block_until_ready(res_p.trajs)
    results["mpot_gpmp2_pipeline"] = {
        **trajectory_metrics(task, res_p.trajs),
        "opt_iters": f"{m_params.opt_iters} OT + 50 GN",
        "wall_s": round(time.perf_counter() - t0, 2),
    }

    print(json.dumps(results, indent=1))
    return results


if __name__ == "__main__":
    main(small="--small" in sys.argv)
