"""Planner-quality benchmark: MPOT vs GPMP2 across the preset envs.

The reference ships MPOT hyperparameters only for EnvGridCircles2D
(/root/reference/torch_robotics/environments/env_grid_circles_2d.py:64-119);
this sweep validates our MPOT (Sinkhorn-step ensemble + guarded smoothing +
GN polish pipeline) against GPMP2 on FOUR envs — GridCircles2D (reference
preset), EnvDense2D, EnvNarrowPassageDense2D (2D point mass), and
EnvSpheres3D (3D point mass) — from the same GP-prior initializations,
reporting fraction collision-free, smoothness, path length, and wall-clock.

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


def run_env(name, task, start, goal, B, mpot_overrides=None):
    from torch_robotics_tpu.envs import EnvGridCircles2D
    from torch_robotics_tpu.robots import RobotPointMass
    from torch_robotics_tpu.solve import (GPMP2Params, gpmp2_init_trajs,
                                          gpmp2_solve)
    from torch_robotics_tpu.solve.hybrid import plan_mpot_gpmp2
    from torch_robotics_tpu.solve.mpot import MPOTParams, mpot_solve
    from torch_robotics_tpu.tasks import PlanningTask

    d = task.robot.q_dim
    try:
        gpmp2_params = GPMP2Params.from_preset(
            task.env.get_gpmp2_params(task.robot))
    except NotImplementedError:
        # e.g. EnvSpheres3D ships a Panda-only gpmp2 preset (reference
        # env_spheres_3d.py); GPMP2Params defaults mirror the reference's
        # point-mass preset values
        gpmp2_params = GPMP2Params(opt_iters=300)
    gpmp2_params = GPMP2Params(**{**gpmp2_params.__dict__, "num_samples": B})
    theta0 = gpmp2_init_trajs(jax.random.PRNGKey(0), gpmp2_params,
                              start, goal)

    # MPOT params: the env preset when it ships one (GridCircles2D, the
    # only one in the reference), else the GridCircles2D-derived defaults
    # of MPOTParams with per-env overrides
    try:
        m_params = MPOTParams.from_preset(
            {**task.env.get_mpot_params(task.robot),
             "sigma_start": 1e-3, "sigma_goal": 1e-3})
    except (NotImplementedError, KeyError):
        m_params = MPOTParams(sigma_start=1e-3, sigma_goal=1e-3)
    if mpot_overrides:
        import dataclasses
        m_params = dataclasses.replace(m_params, **mpot_overrides)

    results = {}
    for n in (gpmp2_params.opt_iters, 50):
        p = GPMP2Params(**{**gpmp2_params.__dict__, "opt_iters": n})
        t0 = time.perf_counter()
        res = gpmp2_solve(task.collision_residuals, theta0, start, goal, p)
        jax.block_until_ready(res.trajs)
        results[f"gpmp2_{n}"] = {
            **trajectory_metrics(task, res.trajs), "opt_iters": n,
            "wall_s": round(time.perf_counter() - t0, 2)}

    def state_cost(theta):
        return task._compute_cost(theta[..., :d])

    task_h = PlanningTask(env=task.env, robot=task.robot,
                          obstacle_cutoff_margin=0.01, clamp_sdf_cost=True)
    t0 = time.perf_counter()
    res_m = mpot_solve(state_cost, theta0, start, goal, m_params,
                       hinge_cost_fn=lambda th: task_h._compute_cost(
                           th[..., :d]))
    jax.block_until_ready(res_m.trajs)
    results["mpot_raw"] = {
        **trajectory_metrics(task, res_m.trajs),
        "opt_iters": m_params.opt_iters,
        "wall_s": round(time.perf_counter() - t0, 2)}

    t0 = time.perf_counter()
    res_p, _ = plan_mpot_gpmp2(task, theta0, start, goal,
                               mpot_params=m_params,
                               gpmp2_params=gpmp2_params, polish_iters=50)
    jax.block_until_ready(res_p.trajs)
    results["mpot_gpmp2_pipeline"] = {
        **trajectory_metrics(task, res_p.trajs),
        "opt_iters": f"{m_params.opt_iters} OT + 50 GN",
        "wall_s": round(time.perf_counter() - t0, 2)}
    print(name, json.dumps(results, indent=1), flush=True)
    return results


def main(small=False):
    from torch_robotics_tpu.envs import (EnvDense2D, EnvGridCircles2D,
                                         EnvNarrowPassageDense2D,
                                         EnvSpheres3D)
    from torch_robotics_tpu.robots import RobotPointMass
    from torch_robotics_tpu.tasks import PlanningTask

    B = 16 if small else 64
    z = lambda d: jnp.zeros(d)
    cases = [
        # (env, robot, start_q, goal_q, mpot overrides)
        ("EnvGridCircles2D", EnvGridCircles2D(), RobotPointMass.create(),
         jnp.array([-0.75, -0.75]), jnp.array([0.75, 0.75]), None),
        # EnvDense2D now ships a tuned mpot preset (envs/zoo.py
        # _TUNED_PLANNER_PARAMS, from benchmarks/mpot_dense2d_sweep.py:
        # fraction-free 0.594 -> 0.906) — picked up via get_mpot_params
        ("EnvDense2D", EnvDense2D(), RobotPointMass.create(),
         jnp.array([-0.9, -0.9]), jnp.array([0.9, 0.9]), None),
        ("EnvNarrowPassageDense2D", EnvNarrowPassageDense2D(),
         RobotPointMass.create(),
         jnp.array([-0.9, -0.9]), jnp.array([0.9, 0.9]), None),
        ("EnvSpheres3D", EnvSpheres3D(),
         RobotPointMass.create(q_limits=((-1.,) * 3, (1.,) * 3)),
         jnp.array([-0.9, -0.9, -0.9]), jnp.array([0.9, 0.9, 0.9]),
         # 3D: orthoplex polytope probes axis directions; the sphere field
         # is sparser than the dense-2D boxes, so keep the preset radii
         {"polytope": "orthoplex"}),
    ]
    all_results = {}
    for name, env, robot, sq, gq, over in cases:
        task = PlanningTask(env=env, robot=robot,
                            obstacle_cutoff_margin=0.01)
        d = robot.q_dim
        start = jnp.concatenate([sq, z(d)])
        goal = jnp.concatenate([gq, z(d)])
        all_results[name] = run_env(name, task, start, goal, B,
                                    mpot_overrides=over)
    print(json.dumps(all_results))
    return all_results


if __name__ == "__main__":
    main(small="--small" in sys.argv)
