"""Benchmark suite over the BASELINE.json configurations.

Configs (BASELINE.json "configs"):
1. batched Panda FK + Adam IK (reference examples' workload, scaled up)
2. PointMass 2D in EnvDense2D: obstacle + smoothness trajopt, H=64, B=1k
3. Panda 7-DoF in EnvSpheres3D: GP-prior trajopt with self-collision +
   EE tracking, B=4k
4. UR10 + dual-arm Panda: multi-robot mutual-collision MPC loop
5. Pod-scale: large scenario-batched Panda MPC sharded over the local mesh

Usage: python benchmarks/run_all.py [--small] [--configs 1,2,3,4,5]
Prints one JSON object with per-config metrics.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/trt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _timed(fn, *args, repeats=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return out, best


def config_fk_ik(small: bool):
    import numpy as np
    from torch_robotics_tpu.kin import (fk_all_links, inverse_kinematics,
                                        robot_zoo)
    model = robot_zoo.franka_panda()
    B = 1024 if small else 65536
    q = jax.random.uniform(jax.random.PRNGKey(0), (B, 7), minval=-1, maxval=1)

    # chained-difference timing (benchmarks/chained_timing.py method): the
    # one-shot timing bills ~3.7 ms of dispatch + tunnel RTT to a sub-ms
    # kernel; chaining K iterations on-device and differencing two K values
    # cancels it.  The coupling sums EVERY output element (no link's
    # computation can be dead-code-eliminated).
    def chained_fk(K):
        @jax.jit
        def loop(qq):
            def body(x, _):
                H_links = fk_all_links(model, x)
                return x + 1e-30 * jnp.sum(H_links, axis=(1, 2, 3))[:, None], None
            return jax.lax.scan(body, qq, None, length=K)[0][0, 0]
        return loop

    def timed_fetch(fn):
        np.asarray(fn(q))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(q))
            best = min(best, time.perf_counter() - t0)
        return best

    K_LO, K_HI = (1, 3) if small else (4, 32)
    dt_fk = (timed_fetch(chained_fk(K_HI)) - timed_fetch(chained_fk(K_LO))) \
        / (K_HI - K_LO)

    from torch_robotics_tpu.core import pack_homogeneous, y_rot, z_rot
    from torch_robotics_tpu.kin.ik import inverse_kinematics_gn
    H_target = pack_homogeneous(
        z_rot(jnp.array(-jnp.pi / 2)) @ y_rot(jnp.array(-jnp.pi)),
        jnp.array([0.2, 0.4, 0.1]))
    B_ik = 64 if small else 1024
    # damped-least-squares IK with resample-on-stall (the production
    # solver; the reference-parity Adam IK remains inverse_kinematics)
    iters = 60 if small else 150

    def run_ik(k):
        return inverse_kinematics_gn(model, H_target, link_name="ee_link",
                                     batch_size=B_ik, max_iters=iters,
                                     se3_eps=5e-2, restart_every=25,
                                     key=jax.random.PRNGKey(k))

    import numpy as _np
    _np.asarray(run_ik(1).q)             # warm up (compile) + queue drain
    t0 = time.perf_counter()
    res = run_ik(1)
    _np.asarray(res.q)
    dt_ik = time.perf_counter() - t0
    return {
        "fk_rollouts_per_s": round(B / dt_fk, 1),
        "ik_batch": B_ik, "ik_iters": iters,
        "ik_valid_frac": round(float(res.valid.mean()), 3),
        "ik_median_iters": int(jnp.median(res.iters_to_valid)),
        "ik_wall_s": round(dt_ik, 3),
    }


def _trajopt_metrics(task, result, elapsed, B):
    frac_free = task.compute_fraction_free_trajs(result.trajs)
    return {
        "batch": B,
        "solve_wall_s": round(elapsed, 3),
        "trajs_per_s": round(B / elapsed, 1),
        "fraction_free": round(frac_free, 3),
        "final_cost_mean": round(float(result.costs.mean()), 3),
    }


def config_pointmass(small: bool):
    from torch_robotics_tpu.envs import EnvDense2D
    from torch_robotics_tpu.robots import RobotPointMass
    from torch_robotics_tpu.solve import (GPMP2Params, gpmp2_init_trajs,
                                          gpmp2_solve)
    from torch_robotics_tpu.tasks import PlanningTask
    from torch_robotics_tpu.solve.hybrid import plan_hybrid
    env = EnvDense2D()
    robot = RobotPointMass.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.02)
    B = 64 if small else 1024
    params = GPMP2Params.from_preset(env.get_gpmp2_params(robot))
    params = GPMP2Params(**{**params.__dict__, "num_samples": B,
                            "opt_iters": 50 if small else 150})
    start = jnp.array([-0.9, -0.9, 0.0, 0.0])
    goal = jnp.array([0.9, 0.9, 0.0, 0.0])

    # pure GPMP2 from the GP prior (the baseline number)
    theta0 = gpmp2_init_trajs(jax.random.PRNGKey(0), params, start, goal)
    res, dt = _timed(lambda th: gpmp2_solve(
        task.collision_residuals, th, start, goal, params), theta0,
        repeats=1)
    out = _trajopt_metrics(task, res, dt, B)

    # restart policy (config-3's winner, applied to the direct solve):
    # resample + re-solve only the collision-failing trajectories; failures
    # are ~independent across rounds so quality compounds at a fraction of
    # the hybrid pipeline's RRT cost
    from torch_robotics_tpu.solve import gpmp2_solve_restarts
    p_r = GPMP2Params(**{**params.__dict__,
                         "opt_iters": 20 if small else 75,
                         "sigma_gp_init": 0.5})

    @jax.jit
    def free_fn(trajs):
        return ~task.trajs_collision_masks(trajs)[0]

    res_r, dt_r = _timed(lambda th: gpmp2_solve_restarts(
        task.collision_residuals, th, start, goal, p_r, free_fn,
        jax.random.PRNGKey(42), restart_rounds=2 if small else 6,
        restart_iters=20 if small else 50), theta0, repeats=1)
    out["restart_fraction_free"] = round(
        task.compute_fraction_free_trajs(res_r.trajs), 3)
    out["restart_wall_s"] = round(dt_r, 3)
    out["restart_trajs_per_s"] = round(B / dt_r, 1)

    # default pipeline: RRT-Connect seed -> spline -> GPMP2 refinement
    # (the hybrid init is the production default for narrow-passage envs)
    t0 = time.perf_counter()
    res_h, _ = plan_hybrid(task, start[:2], goal[:2], gpmp2_params=params,
                           num_samples=B)
    jax.block_until_ready(res_h.trajs)
    dt_h = time.perf_counter() - t0
    out["hybrid_fraction_free"] = round(
        task.compute_fraction_free_trajs(res_h.trajs), 3)
    out["hybrid_wall_s"] = round(dt_h, 2)
    return out


def config_panda(small: bool):
    from torch_robotics_tpu.envs import EnvSpheres3D
    from torch_robotics_tpu.kin import fk_all_links
    from torch_robotics_tpu.robots import RobotPanda
    from torch_robotics_tpu.solve import (GPMP2Params, gpmp2_solve,
                                          make_ee_goal_terms)
    from torch_robotics_tpu.solve.gp_prior import sample_gp_prior_trajs
    from torch_robotics_tpu.tasks import PlanningTask
    env = EnvSpheres3D()
    robot = RobotPanda.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.03)
    B = 64 if small else 4096
    # collision-free start/goal configurations (margin-respecting)
    starts_q, _ = task.random_coll_free_q(jax.random.PRNGKey(10),
                                          n_samples=1, max_samples=4096)
    goal_q, _ = task.random_coll_free_q(jax.random.PRNGKey(11),
                                        n_samples=1, max_samples=4096)
    H_target = fk_all_links(robot.model, goal_q, link_list=["ee_link"])[0]
    ee_terms = make_ee_goal_terms(robot, H_target, sigma_ee=1e-3, w_rot=0.2)
    start = jnp.concatenate([starts_q, jnp.zeros(7)])
    goal = jnp.concatenate([goal_q, jnp.zeros(7)])
    # production policy (benchmarks/config3_tune.py sweep, re-run for the
    # exact-sampler inits): 30 main GN iters + TWO 30-iter random restarts
    # of collision-failing trajectories — 99.5% collision-free at 1,841
    # trajs/s (fixed-150 reaches only 86.6%; one restart round 97.3%)
    # sigma_gp_init/init-sigma scaled ~2.7x when sample_gp_prior_trajs moved
    # to the exact conditioned-GP sampler (equal mid-horizon position spread
    # to the Brownian heuristic these values were originally tuned with)
    params = GPMP2Params(n_support_points=64, dt=0.04,
                         opt_iters=20 if small else 30,
                         sigma_start=1e-3, sigma_gp=1e-1,
                         sigma_goal_prior=1e-2, sigma_coll=5e-4,
                         step_size=0.8, sigma_gp_init=0.5)
    theta0 = sample_gp_prior_trajs(jax.random.PRNGKey(0), start, goal, 64, B,
                                   params.dt, 0.13)
    from torch_robotics_tpu.solve import gpmp2_solve_restarts

    @jax.jit
    def free_fn(trajs):
        return ~task.trajs_collision_masks(trajs)[0]

    res, dt = _timed(lambda th: gpmp2_solve_restarts(
        task.collision_residuals, th, start, goal, params, free_fn,
        jax.random.PRNGKey(42), ee_goal_terms=ee_terms, restart_rounds=2,
        restart_iters=10 if small else 30), theta0, repeats=1)
    out = _trajopt_metrics(task, res, dt, B)
    q_final = res.trajs[:, -1, :7]
    H_final = fk_all_links(robot.model, q_final, link_list=["ee_link"])
    pos_err = jnp.linalg.norm(H_final[:, 0, :3, 3] - H_target[:3, 3], axis=-1)
    out["ee_pos_err_median"] = round(float(jnp.median(pos_err)), 4)
    return out


def config_multi_robot(small: bool):
    from torch_robotics_tpu.core import z_rot
    from torch_robotics_tpu.envs import EnvSpheres3D
    from torch_robotics_tpu.robots import MultiRobot, RobotPanda, RobotUR10
    from torch_robotics_tpu.solve import GPMP2Params
    from torch_robotics_tpu.solve.mpc import MPCParams, mpc_rollout
    from torch_robotics_tpu.tasks import PlanningTask
    robots = [RobotPanda.create(), RobotPanda.create(), RobotUR10()]
    # base poses clear of the EnvSpheres3D obstacles (the spheres at
    # (0, +-0.3..0.45, *) permanently intersect base-adjacent links of
    # arms mounted at +-0.45 — that scenario has NO collision-free
    # configuration)
    poses = [(jnp.eye(3), jnp.array([0.2, 0.72, 0.0])),
             (z_rot(jnp.array(jnp.pi)), jnp.array([0.2, -0.72, 0.0])),
             (jnp.eye(3), jnp.array([-0.75, 0.0, 0.0]))]
    robot = MultiRobot.create(robots, poses)
    env = EnvSpheres3D()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.02)
    d = robot.q_dim
    B = 8 if small else 256
    steps = 5 if small else 30
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    # collision-free starts (the joint 20-dof free space is ~0.2% of the
    # limit box; the lanes-FK collision check makes the big budget cheap);
    # goals are moderate free-start perturbations reachable within the
    # measured step budget
    q0, n_free = task.random_coll_free_q(k1, n_samples=B,
                                         max_samples=B * 1024)
    n_free = int(n_free)
    qg = jnp.clip(q0 + 0.4 * jax.random.normal(k2, (B, d)),
                  robot.q_min, robot.q_max)
    start = jnp.concatenate([q0, jnp.zeros_like(q0)], -1)
    goal = jnp.concatenate([qg, jnp.zeros_like(qg)], -1)
    gp = GPMP2Params(n_support_points=16 if small else 32, dt=0.05,
                     sigma_start=1e-3, sigma_gp=1e-1, sigma_goal_prior=1e-3,
                     sigma_coll=1e-3, step_size=0.7)
    params = MPCParams(gpmp2=gp, iters_per_step=2)
    # warm up (compile) before timing — a code change invalidates the
    # persistent compile cache and would otherwise bill ~20 s of remote
    # compile to the measurement
    xs, info = mpc_rollout(task.collision_residuals, start, goal, params,
                           n_steps=steps)
    jax.block_until_ready(xs)
    t0 = time.perf_counter()
    xs, info = mpc_rollout(task.collision_residuals, start, goal, params,
                           n_steps=steps)
    jax.block_until_ready(xs)
    dt = time.perf_counter() - t0
    return {
        "arms": 3, "q_dim": d, "batch": B, "mpc_steps": steps,
        "mutual_pairs": len(robot.self_pair_idxs),
        # rows past n_free_starts were filled with the first raw candidate
        # by the fixed-budget sampler (random_coll_free_q docstring) — a
        # shortfall here means some starts may be in collision
        "n_free_starts": min(n_free, B),
        "wall_s": round(dt, 2),
        "solves_per_s": round(B * steps / dt, 1),
        "mean_final_goal_dist": round(float(info["dist_to_goal"][-1].mean()), 3),
    }


def config_pod_scale(small: bool):
    from torch_robotics_tpu.envs import EnvSpheres3D
    from torch_robotics_tpu.parallel import (make_mesh, mpc_rollout_sharded,
                                             shard_batch)
    from torch_robotics_tpu.robots import RobotPanda
    from torch_robotics_tpu.solve import GPMP2Params
    from torch_robotics_tpu.solve.mpc import MPCParams
    from torch_robotics_tpu.tasks import PlanningTask
    env = EnvSpheres3D()
    robot = RobotPanda.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.03)
    mesh = make_mesh()
    n_dev = mesh.devices.size
    # 32k scenarios across a pod; cap the per-device share by HBM (the full
    # 32k needs >= 4 chips)
    B = (16 * n_dev) if small else min(32768, 8192 * n_dev)
    B = (B // n_dev) * n_dev
    steps = 2 if small else 8
    d = robot.q_dim
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    u1 = jax.random.uniform(k1, (B, d))
    u2 = jax.random.uniform(k2, (B, d))
    qs = robot.q_min + 0.2 * (robot.q_max - robot.q_min) * (1 + u1) / 2
    qg = robot.q_max - 0.2 * (robot.q_max - robot.q_min) * (1 + u2) / 2
    start = shard_batch(jnp.concatenate([qs, jnp.zeros_like(qs)], -1), mesh)
    goal = shard_batch(jnp.concatenate([qg, jnp.zeros_like(qg)], -1), mesh)
    gp = GPMP2Params(n_support_points=16 if small else 64, dt=0.04,
                     sigma_start=1e-3, sigma_gp=1e-1, sigma_goal_prior=1e-3,
                     sigma_coll=1e-4, step_size=1.0)
    params = MPCParams(gpmp2=gp, iters_per_step=2)
    xs, frac = mpc_rollout_sharded(task.collision_residuals, start, goal,
                                   params, steps, mesh)
    jax.block_until_ready(xs)
    t0 = time.perf_counter()
    xs, frac = mpc_rollout_sharded(task.collision_residuals, start, goal,
                                   params, steps, mesh)
    jax.block_until_ready(xs)
    dt = time.perf_counter() - t0
    return {
        "devices": n_dev, "scenario_batch": B, "mpc_steps": steps,
        "wall_s": round(dt, 2),
        "solves_per_s": round(B * steps / dt, 1),
    }


CONFIGS = {
    "1_fk_ik": config_fk_ik,
    "2_pointmass_2d": config_pointmass,
    "3_panda_spheres3d": config_panda,
    "4_multi_robot": config_multi_robot,
    "5_pod_scale": config_pod_scale,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="smoke-test sizes (CPU-friendly)")
    ap.add_argument("--configs", default="1,2,3,4,5")
    args = ap.parse_args()
    wanted = set(args.configs.split(","))
    results = {}
    for name, fn in CONFIGS.items():
        if name.split("_")[0] not in wanted:
            continue
        t0 = time.perf_counter()
        try:
            results[name] = fn(args.small)
            results[name]["total_s"] = round(time.perf_counter() - t0, 1)
        except Exception as e:  # keep going; report the failure
            results[name] = {"error": f"{type(e).__name__}: {e}"}
        print(f"{name}: {json.dumps(results[name])}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
