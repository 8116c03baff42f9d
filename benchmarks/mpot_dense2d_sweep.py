"""MPOT hyperparameter sweep on EnvDense2D (the config-suite quality hole).

Round-4 verdict: MPOT pipeline fraction-free on EnvDense2D is 0.594 vs
0.984/1.0/1.0 on the other preset envs and barely above plain GPMP2@50
(0.562).  The defaults derive from the reference's GridCircles2D preset
(regular cell structure); dense random clutter plausibly wants a different
step/probe scale, annealing, or entropic regularization.  This sweep runs
the full mpot->GN-polish pipeline per override set and reports fraction
collision-free + wall-clock.

Run: python benchmarks/mpot_dense2d_sweep.py [--small]
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


def main(small=False):
    import dataclasses

    from torch_robotics_tpu.envs import EnvDense2D
    from torch_robotics_tpu.robots import RobotPointMass
    from torch_robotics_tpu.solve import GPMP2Params, gpmp2_init_trajs
    from torch_robotics_tpu.solve.hybrid import plan_mpot_gpmp2
    from torch_robotics_tpu.solve.mpot import MPOTParams
    from torch_robotics_tpu.tasks import PlanningTask

    env = EnvDense2D()
    robot = RobotPointMass.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.01)
    d = robot.q_dim
    B = 16 if small else 64
    start = jnp.concatenate([jnp.array([-0.9, -0.9]), jnp.zeros(d)])
    goal = jnp.concatenate([jnp.array([0.9, 0.9]), jnp.zeros(d)])

    gpmp2_params = GPMP2Params.from_preset(task.env.get_gpmp2_params(robot))
    gpmp2_params = dataclasses.replace(gpmp2_params, num_samples=B)
    theta0 = gpmp2_init_trajs(jax.random.PRNGKey(0), gpmp2_params,
                              start, goal)

    base = MPOTParams(sigma_start=1e-3, sigma_goal=1e-3)
    if small:
        base = dataclasses.replace(base, opt_iters=20, smooth_iters=10)

    it200 = 200 if not small else 30
    it300 = 300 if not small else 40
    sweeps = [
        # round 1 (2026-08-20): preset 0.594; single-knob winners were
        # bigger steps (0.703), deeper probes (0.688); best combo
        # step 0.07 / probe 0.09 / num_probe 9 / iters 200 -> 0.734
        ("preset", {}),
        ("step_big_deep_200", {"step_radius": 0.07, "probe_radius": 0.09,
                               "num_probe": 9, "opt_iters": it200}),
        # round 2: refine around the round-1 winner
        ("r2_step09", {"step_radius": 0.09, "probe_radius": 0.12,
                       "num_probe": 9, "opt_iters": it200}),
        ("r2_step12", {"step_radius": 0.12, "probe_radius": 0.16,
                       "num_probe": 9, "opt_iters": it200}),
        ("r2_probe13", {"step_radius": 0.07, "probe_radius": 0.09,
                        "num_probe": 13, "opt_iters": it200}),
        ("r2_it300", {"step_radius": 0.07, "probe_radius": 0.09,
                      "num_probe": 9, "opt_iters": it300}),
        ("r2_wcoll", {"step_radius": 0.07, "probe_radius": 0.09,
                      "num_probe": 9, "opt_iters": it200,
                      "w_coll": 8e-3}),
        ("r2_step09_probe13_300", {"step_radius": 0.09,
                                   "probe_radius": 0.12, "num_probe": 13,
                                   "opt_iters": it300}),
    ]
    results = {}
    for tag, over in sweeps:
        p = dataclasses.replace(base, **over)
        t0 = time.perf_counter()
        res, _ = plan_mpot_gpmp2(task, theta0, start, goal, mpot_params=p,
                                 gpmp2_params=gpmp2_params, polish_iters=50)
        jax.block_until_ready(res.trajs)
        frac = float(task.compute_fraction_free_trajs(res.trajs))
        results[tag] = {"fraction_free": round(frac, 4),
                        "wall_s": round(time.perf_counter() - t0, 2)}
        print(tag, json.dumps(results[tag]), flush=True)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main(small="--small" in sys.argv)
