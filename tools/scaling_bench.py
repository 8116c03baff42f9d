"""Multi-device scaling measurement for the sharded MPC solver.

Runs the shard_map MPC step at 1, 2, 4, 8 devices with the per-device batch
held constant (weak scaling) and reports efficiency.  On a CPU host this
exercises the sharding machinery with virtual devices (set
XLA_FLAGS=--xla_force_host_platform_device_count=8); on a real multi-chip
slice the same code measures true ICI scaling per BASELINE.md's protocol.

Usage: python tools/scaling_bench.py [--per-device-batch 256] [--steps 4]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device-batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--horizon", type=int, default=32)
    args = ap.parse_args()

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
    d = robot.q_dim
    gp = GPMP2Params(n_support_points=args.horizon, dt=0.04,
                     sigma_start=1e-3, sigma_gp=1e-1, sigma_goal_prior=1e-3,
                     sigma_coll=1e-4, step_size=1.0)
    params = MPCParams(gpmp2=gp, iters_per_step=2)

    n_avail = len(jax.devices())
    results = {}
    base_rate = None
    for n_dev in [n for n in (1, 2, 4, 8) if n <= n_avail]:
        mesh = make_mesh(n_dev)
        B = args.per_device_batch * n_dev
        key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        u1 = jax.random.uniform(k1, (B, d))
        u2 = jax.random.uniform(k2, (B, d))
        qs = robot.q_min + 0.2 * (robot.q_max - robot.q_min) * (1 + u1) / 2
        qg = robot.q_max - 0.2 * (robot.q_max - robot.q_min) * (1 + u2) / 2
        start = shard_batch(jnp.concatenate([qs, jnp.zeros_like(qs)], -1), mesh)
        goal = shard_batch(jnp.concatenate([qg, jnp.zeros_like(qg)], -1), mesh)

        def run():
            return mpc_rollout_sharded(task.collision_residuals, start, goal,
                                       params, args.steps, mesh)

        xs, _ = run()
        jax.block_until_ready(xs)
        t0 = time.perf_counter()
        xs, _ = run()
        jax.block_until_ready(xs)
        dt = time.perf_counter() - t0
        rate = B * args.steps / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n_dev)
        results[n_dev] = {"batch": B, "solves_per_s": round(rate, 1),
                          "weak_scaling_efficiency": round(eff, 3)}
        print(f"devices={n_dev} B={B}: {rate:.0f} solves/s "
              f"(efficiency {eff * 100:.0f}%)", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
