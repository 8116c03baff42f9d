"""Factorization-reuse perf A/B: substitution-only kernel vs full sweep.

Round-5 follow-up to benchmarks/gn_reuse_ab.py (which answered the QUALITY
question with the same full kernel both ways): the factor-persisting sweep
(``solve_lanes_pallas_factor``) and the substitution-only re-solve
(``solve_lanes_pallas_subst``, ~3m^2 vs ~1.7m^3 equations per block step)
now exist, and ``GPMP2Params.refactor_every`` wires them into
``gpmp2_solve``.  This bench measures, on the real chip:

1. kernel micro (H=64, m=14, B=1024, chained in-graph-operand timing —
   the D/b coupling defeats loop-invariant hoisting, CLAUDE.md trap):
   plain sweep vs factor sweep vs substitution-only ms/solve;
2. config-3-style batch solve (Panda/EnvSpheres3D, B=4096 via the
   production restart policy): trajs/s + fraction-free at
   refactor_every 1 / 2 / 4.

Run: python benchmarks/subst_reuse_bench.py [--small]
"""
import dataclasses
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

EPS = 1e-30


def chained_ms(fn, ops, n_lo=2, n_hi=8, repeats=3):
    """fn(ops, x) -> array; chained with in-graph operand coupling."""
    def timed(K):
        @jax.jit
        def loop(ops):
            def body(x, _):
                out = fn(ops, x)
                return x + EPS * jnp.sum(out), None
            x, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return x
        np.asarray(loop(ops))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(loop(ops))
            best = min(best, time.perf_counter() - t0)
        return best
    return (timed(n_hi) - timed(n_lo)) / (n_hi - n_lo) * 1e3


def kernel_micro(small):
    from torch_robotics_tpu.ops.pallas_btridiag import (
        pallas_tile_for, pallas_tile_for_factor, solve_lanes_pallas,
        solve_lanes_pallas_factor, solve_lanes_pallas_subst)

    H, m, B = (16, 14, 256) if small else (64, 14, 1024)
    key = jax.random.PRNGKey(0)
    G = jax.random.normal(key, (H, m, m, B)) * 0.1
    D = (jnp.eye(m)[None, :, :, None] * 4.0
         + jnp.einsum("hijb,hkjb->hikb", G, G))
    U = (jax.random.normal(jax.random.fold_in(key, 1), (H, m, m)) * 0.2
         )[..., None]
    b = jax.random.normal(jax.random.fold_in(key, 2), (H, m, B))

    tb_plain = pallas_tile_for(H, m, B) or 128
    tb_f = pallas_tile_for_factor(H, m, B) or 128
    out = {"tile_plain": tb_plain, "tile_factor": tb_f}

    # D varied in-graph per iteration -> factorization cannot hoist
    out["plain_ms"] = round(chained_ms(
        lambda ops, x: solve_lanes_pallas(
            ops[0] * (1 + EPS * x), ops[1], ops[2], tile_b=tb_plain),
        (D, U, b)), 3)
    print("plain_ms", out["plain_ms"], flush=True)
    out["factor_ms"] = round(chained_ms(
        lambda ops, x: solve_lanes_pallas_factor(
            ops[0] * (1 + EPS * x), ops[1], ops[2], tile_b=tb_f)[0],
        (D, U, b)), 3)
    print("factor_ms", out["factor_ms"], flush=True)
    # constant factors, b varied in-graph -> only substitution repeats
    _, L, W = jax.jit(solve_lanes_pallas_factor,
                      static_argnames=("tile_b",))(D, U, b, tile_b=tb_f)
    out["subst_ms"] = round(chained_ms(
        lambda ops, x: solve_lanes_pallas_subst(
            ops[0], ops[1], ops[2] * (1 + EPS * x), tile_b=tb_f),
        (L, W, b)), 3)
    print("subst_ms", out["subst_ms"], flush=True)

    # numeric agreement on-device (subst with the ORIGINAL b must equal the
    # factor solve's x)
    x_f = jax.jit(solve_lanes_pallas_factor,
                  static_argnames=("tile_b",))(D, U, b, tile_b=tb_f)[0]
    x_s = jax.jit(solve_lanes_pallas_subst,
                  static_argnames=("tile_b",))(L, W, b, tile_b=tb_f)
    out["subst_rel_err"] = float(f"{float(jnp.abs(x_s - x_f).max() / (jnp.abs(x_f).max() + 1e-30)):.2e}")
    print("kernel_micro", json.dumps(out), flush=True)
    return out


def config3_reuse(small):
    from torch_robotics_tpu.envs import EnvSpheres3D
    from torch_robotics_tpu.robots import RobotPanda
    from torch_robotics_tpu.solve import GPMP2Params, gpmp2_solve_restarts
    from torch_robotics_tpu.solve.gp_prior import sample_gp_prior_trajs
    from torch_robotics_tpu.tasks import PlanningTask

    env = EnvSpheres3D()
    robot = RobotPanda.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.03)
    B = 256 if small else 4096
    starts_q, _ = task.random_coll_free_q(jax.random.PRNGKey(10),
                                          n_samples=1, max_samples=4096)
    goal_q, _ = task.random_coll_free_q(jax.random.PRNGKey(11),
                                        n_samples=1, max_samples=4096)
    start = jnp.concatenate([starts_q, jnp.zeros(7)])
    goal = jnp.concatenate([goal_q, jnp.zeros(7)])
    base = GPMP2Params(n_support_points=64, dt=0.04,
                       opt_iters=10 if small else 30,
                       sigma_start=1e-3, sigma_gp=1e-1, sigma_goal_prior=1e-2,
                       sigma_coll=5e-4, step_size=0.8, sigma_gp_init=0.5)
    theta0 = sample_gp_prior_trajs(jax.random.PRNGKey(0), start, goal, 64, B,
                                   base.dt, 0.13)

    @jax.jit
    def free_fn(trajs):
        return ~task.trajs_collision_masks(trajs)[0]

    out = {}
    for k in (1, 2, 4):
        p = dataclasses.replace(base, refactor_every=k)
        def solve(th):
            return gpmp2_solve_restarts(
                task.collision_residuals, th, start, goal, p, free_fn,
                jax.random.PRNGKey(42), restart_rounds=2,
                restart_iters=5 if small else 30)
        res = solve(theta0)           # compile + warm
        jax.block_until_ready(res.trajs)
        t0 = time.perf_counter()
        res = solve(theta0)
        jax.block_until_ready(res.trajs)
        dt = time.perf_counter() - t0
        frac = float(task.compute_fraction_free_trajs(res.trajs))
        out[f"refactor_every_{k}"] = {
            "trajs_per_s": round(B / dt, 1),
            "fraction_free": round(frac, 4),
            "wall_s": round(dt, 3)}
        print(f"config3 k={k}", json.dumps(out[f"refactor_every_{k}"]),
              flush=True)
    return out


def main(small=False):
    out = {"kernel_micro": kernel_micro(small),
           "config3_reuse": config3_reuse(small)}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(small="--small" in sys.argv)
