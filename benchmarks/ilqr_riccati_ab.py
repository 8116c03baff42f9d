"""A/B: iLQR square-root Riccati backward pass — batched jnp.linalg.qr vs
the lanes two-phase Householder sweep (solve/ilqr.py, ILQRParams.riccati).

The QR-mode backward spends ~0.105 s of the 0.15 s solve in the in-scan
batched (B, d+m+P, d+m) QR chain (B=512, H=32, 30 iters).  The lanes mode
unrolls the factorization into (rows, cols, B) elementwise multiply-reduce
ops with the batch in the minor axis (CLAUDE.md lessons 1/2), exploiting the
stack's block sparsity (phase 1 touches only the top d+m rows; S@B and
S@Phi are elementwise in the double-integrator structure).  The pallas
mode (round 5 default) runs the SAME lanes sweep VMEM-resident in one
kernel per lane tile (ops/pallas_riccati.py): chained per-iteration A/B
0.975 vs 1.175 ms/iter, iLQR batch 10.7k -> 13.2k solves/s, tracking MPC
150k -> 185k, quality equal (this file's timed_fetch numbers bill fixed
dispatch+RTT to the solve — use the chained method for per-iter truth).

Run: python benchmarks/ilqr_riccati_ab.py [--small]
"""
import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/trt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


def timed_fetch(fn, *args, n=3):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].reshape(-1)[0])
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    from torch_robotics_tpu.envs import EnvSpheres3D
    from torch_robotics_tpu.robots import RobotPanda
    from torch_robotics_tpu.solve.ilqr import ILQRParams, ilqr_solve
    from torch_robotics_tpu.tasks import PlanningTask

    env = EnvSpheres3D()
    robot = RobotPanda.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.06)
    d = robot.q_dim
    # small mode keeps B=128: below the smallest lane tile the "pallas"
    # leg would silently fall back to the lanes sweep and A/B lanes
    # against itself (riccati_pallas_tile_for requires a 128-tile)
    B = 128 if args.small else 512
    H = 16 if args.small else 32
    iters = 10 if args.small else 30

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    qs, _ = task.random_coll_free_q(k1, n_samples=B, max_samples=B * 64)
    pert = jnp.clip(qs + 0.6 * jax.random.normal(k2, (16, B, d)),
                    robot.q_min + 0.01, robot.q_max - 0.01)
    free = (task.compute_collision(pert.reshape(-1, d)) == 0).reshape(16, B)
    idx = jnp.argmax(free, axis=0)
    qg = jnp.where(free.max(axis=0)[:, None], pert[idx, jnp.arange(B)], qs)
    start = jnp.concatenate([qs, jnp.zeros_like(qs)], -1)
    goal = jnp.concatenate([qg, jnp.zeros_like(qg)], -1)
    limits = (robot.q_min, robot.q_max)

    results = {}
    for mode in ("qr", "lanes", "pallas"):
        p = ILQRParams(n_support_points=H, dt=0.04, opt_iters=iters,
                       sigma_coll=2e-3, sigma_goal_prior=5e-3,
                       sigma_limits=5e-3, r_control=1e-6, riccati=mode)
        solve = jax.jit(lambda s, g, p=p: ilqr_solve(
            task.collision_residuals, s, g, p, q_limits=limits))
        t0 = time.perf_counter()
        dt_s, res = timed_fetch(solve, start, goal)
        wall = time.perf_counter() - t0
        frac_free = task.compute_fraction_free_trajs(res.trajs)
        goal_dist = float(jnp.linalg.norm(
            res.trajs[:, -1, :d] - goal[:, :d], axis=-1).mean())
        results[mode] = {
            "solve_s": round(dt_s, 4),
            "solves_per_s": round(B / dt_s, 1),
            "fraction_free": round(frac_free, 3),
            "mean_final_goal_dist": round(goal_dist, 4),
            "final_cost_mean": float(res.costs.mean()),
            "first_call_wall_s": round(wall, 1),
        }
        print(mode, json.dumps(results[mode]), flush=True)

    print(json.dumps({
        "speedup_lanes": round(results["qr"]["solve_s"]
                               / results["lanes"]["solve_s"], 2),
        "speedup_pallas": round(results["qr"]["solve_s"]
                                / results["pallas"]["solve_s"], 2),
        "quality_delta_free": round(results["pallas"]["fraction_free"]
                                    - results["qr"]["fraction_free"], 3),
    }))


if __name__ == "__main__":
    main()
