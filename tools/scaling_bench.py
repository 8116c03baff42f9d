"""Multi-device scaling measurements for the sharded MPC solver.

Three modes, per BASELINE.md's protocol and VERDICT round-2 item 4:

- ``weak``: shard_map MPC at 1/2/4/8 devices, per-device batch held
  constant.  On CPU with virtual devices this validates the machinery; on
  a real slice it measures true ICI scaling.
- ``knee``: single-device throughput vs per-device batch — the saturation
  knee determines how small the per-device share can get before a pod
  loses efficiency to under-filled chips.  Timing differences two step
  counts inside one jit to cancel dispatch + tunnel RTT (chained method).
- ``collectives``: cost of the cross-device reductions — the MPC rollout's
  only communication is ONE scalar pmean per rollout (parallel/mesh.py),
  measured by timing the sharded step with the reduction against an
  identical shard_map without it.

Usage: python tools/scaling_bench.py [--mode weak|knee|collectives]
       [--per-device-batch 256] [--steps 4]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time
from functools import partial

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def _problem(robot, B, key=0):
    d = robot.q_dim
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    u1 = jax.random.uniform(k1, (B, d))
    u2 = jax.random.uniform(k2, (B, d))
    qs = robot.q_min + 0.2 * (robot.q_max - robot.q_min) * (1 + u1) / 2
    qg = robot.q_max - 0.2 * (robot.q_max - robot.q_min) * (1 + u2) / 2
    return (jnp.concatenate([qs, jnp.zeros_like(qs)], -1),
            jnp.concatenate([qg, jnp.zeros_like(qg)], -1))


def _setup(horizon):
    from torch_robotics_tpu.envs import EnvSpheres3D
    from torch_robotics_tpu.robots import RobotPanda
    from torch_robotics_tpu.solve import GPMP2Params
    from torch_robotics_tpu.solve.mpc import MPCParams
    from torch_robotics_tpu.tasks import PlanningTask
    env = EnvSpheres3D()
    robot = RobotPanda.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.03)
    gp = GPMP2Params(n_support_points=horizon, dt=0.04, sigma_start=1e-3,
                     sigma_gp=1e-1, sigma_goal_prior=1e-3, sigma_coll=1e-4,
                     step_size=1.0)
    return task, robot, MPCParams(gpmp2=gp, iters_per_step=2)


def mode_weak(args):
    from torch_robotics_tpu.parallel import (make_mesh, mpc_rollout_sharded,
                                             shard_batch)
    task, robot, params = _setup(args.horizon)
    n_avail = len(jax.devices())
    results = {}
    base_rate = None
    for n_dev in [n for n in (1, 2, 4, 8) if n <= n_avail]:
        mesh = make_mesh(n_dev)
        B = args.per_device_batch * n_dev
        s, g = _problem(robot, B)
        start, goal = shard_batch(s, mesh), shard_batch(g, mesh)

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
        base_rate = rate if base_rate is None else base_rate
        eff = rate / (base_rate * n_dev)
        results[n_dev] = {"batch": B, "solves_per_s": round(rate, 1),
                          "weak_scaling_efficiency": round(eff, 3)}
        print(f"devices={n_dev} B={B}: {rate:.0f} solves/s "
              f"(efficiency {eff * 100:.0f}%)", flush=True)
    print(json.dumps(results))


def _rollout_rate(task, params, start, goal, steps_lo, steps_hi):
    """Chained-step differencing: solves/s free of dispatch + RTT."""
    from torch_robotics_tpu.solve.mpc import mpc_rollout

    def timed(steps):
        xs, _ = mpc_rollout(task.collision_residuals, start, goal, params,
                            steps)
        np.asarray(xs.reshape(-1)[0])       # real round-trip queue drain
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            xs, _ = mpc_rollout(task.collision_residuals, start, goal,
                                params, steps)
            np.asarray(xs.reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    B = start.shape[0]
    t_lo = timed(steps_lo)
    # guard against degenerate differences (axon timing noise can make the
    # longer run measure no slower, yielding absurd rates like 1e12); retry
    # with a longer chain until the delta is clearly above noise
    for factor in (1, 4, 16):
        hi = steps_hi * factor
        t_hi = timed(hi)
        delta = t_hi - t_lo
        if delta > max(0.25 * t_lo, 2e-3):
            return B * (hi - steps_lo) / delta
    # fall back to the one-shot rate of the longest run (includes dispatch)
    return B * hi / t_hi


def mode_knee(args):
    task, robot, params = _setup(args.horizon)
    results = {}
    peak = 0.0
    for B in (64, 128, 256, 512, 1024, 2048, 4096, 8192):
        s, g = _problem(robot, B)
        rate = _rollout_rate(task, params, s, g, args.steps,
                             args.steps * 3)
        peak = max(peak, rate)
        results[B] = round(rate, 1)
        print(f"B={B:5d}: {rate:9.0f} solves/s ({rate / peak * 100:.0f}% of "
              f"peak so far)", flush=True)
    knee = min(b for b, r in results.items() if r >= 0.9 * peak)
    print(json.dumps({"per_device_rates": results, "peak": peak,
                      "knee_batch_90pct": knee}))


def mode_collectives(args):
    from jax.sharding import PartitionSpec as P
    from torch_robotics_tpu.parallel import make_mesh, shard_batch
    from torch_robotics_tpu.solve.mpc import mpc_rollout
    task, robot, params = _setup(args.horizon)
    n_dev = min(8, len(jax.devices()))
    mesh = make_mesh(n_dev)
    axis = "batch"
    B = args.per_device_batch * n_dev
    s, g = _problem(robot, B)
    start, goal = shard_batch(s, mesh), shard_batch(g, mesh)

    def body(with_psum):
        @jax.jit
        @partial(jax.shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
                 out_specs=(P(axis), P() if with_psum else P(axis)))
        def run(s_l, g_l):
            xs, info = mpc_rollout(task.collision_residuals, s_l, g_l,
                                   params, args.steps)
            frac = jnp.mean((info["dist_to_goal"][-1] < 0.1)
                            .astype(jnp.float32))
            if with_psum:
                frac = jax.lax.pmean(frac, axis)
            return xs, frac[None]
        return run

    out = {}
    for with_psum in (True, False):
        run = body(with_psum)
        xs, _ = run(start, goal)
        jax.block_until_ready(xs)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            xs, _ = run(start, goal)
            jax.block_until_ready(xs)
            best = min(best, time.perf_counter() - t0)
        out["with_pmean" if with_psum else "no_pmean"] = best
        print(f"{'with' if with_psum else 'no  '} pmean: {best * 1e3:.1f} ms "
              f"for {args.steps} MPC steps @ {n_dev} devices", flush=True)
    ovh = out["with_pmean"] - out["no_pmean"]
    print(json.dumps({
        "devices": n_dev, "steps": args.steps,
        "with_pmean_s": round(out["with_pmean"], 4),
        "no_pmean_s": round(out["no_pmean"], 4),
        "collective_overhead_s": round(ovh, 4),
        "overhead_fraction": round(ovh / out["with_pmean"], 4)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="weak",
                    choices=("weak", "knee", "collectives"))
    ap.add_argument("--per-device-batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--horizon", type=int, default=32)
    args = ap.parse_args()
    {"weak": mode_weak, "knee": mode_knee,
     "collectives": mode_collectives}[args.mode](args)


if __name__ == "__main__":
    main()
