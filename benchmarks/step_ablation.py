"""Ablation timing of the flagship GN step at bench shapes (B=1024, H=64).

Times each stage as its own jitted function with real inputs and blocked
outputs — unlike bypass-style measurements, no stage's work can be
dead-code-eliminated into another's account.

Run: python benchmarks/step_ablation.py
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/trt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp


def bench(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from torch_robotics_tpu.envs import EnvSpheres3D
    from torch_robotics_tpu.ops.lanes_fk import fk_lanes
    from torch_robotics_tpu.robots import RobotPanda
    from torch_robotics_tpu.solve import GPMP2Params
    from torch_robotics_tpu.solve.btridiag_lanes import solve_lanes_core
    from torch_robotics_tpu.solve.gp_prior import (gp_prior_terms,
                                                   straight_line_trajs)
    from torch_robotics_tpu.tasks import PlanningTask

    env = EnvSpheres3D(precompute_sdf_obj_fixed=False)
    robot = RobotPanda.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.03)
    d, B, H = robot.q_dim, 1024, 64
    m = 2 * d
    N = B * H
    lam = 1.0 / (1e-4 ** 2)

    key = jax.random.PRNGKey(0)
    q = jax.random.uniform(key, (d, N), minval=robot.q_min[:, None],
                           maxval=robot.q_max[:, None])
    lanes = task.collision_residuals.obstacle_terms_lanes

    with jax.default_matmul_precision("float32"):
        # stage 1: FK only (lanes)
        fk_fn = jax.jit(lambda qc: jnp.stack(
            [jnp.stack(t) for t in fk_lanes(robot.model, qc)[1]]))
        print("fk_lanes (B*H=%d):        %7.2f ms" % (N, bench(fk_fn, q)))

        # stage 2: full obstacle terms (FK + jac + sdf + assembly)
        terms_fn = jax.jit(lambda qc: lanes(qc, lam))
        print("obstacle terms:           %7.2f ms" % bench(terms_fn, q))

        # stage 3: GP prior terms
        theta = straight_line_trajs(
            jnp.zeros((B, m)), jnp.ones((B, m)), H)
        gp_fn = jax.jit(lambda th: gp_prior_terms(
            th, th[:, 0], th[:, -1], 0.04, 1e-3, 1e-1, 1e-3))
        print("gp prior terms:           %7.2f ms" % bench(gp_fn, theta))

        # stage 4: block-tridiag solve alone at bench shapes
        k1, k2 = jax.random.split(key)
        A = jax.random.normal(k1, (H, m, m, B))
        D = (jnp.einsum("hikb,hjkb->hijb", A, A) / m
             + 10.0 * jnp.eye(m)[None, :, :, None])
        U = jnp.broadcast_to((-0.5 * jnp.eye(m))[None, :, :, None],
                             (H, m, m, 1))
        b = jax.random.normal(k2, (H, m, B))
        solve_fn = jax.jit(solve_lanes_core)
        print("btridiag solve:           %7.2f ms" % bench(solve_fn, D, U, b))

        # stage 5: the full GN step (terms + assembly + solve)
        from torch_robotics_tpu.solve.gpmp2 import gpmp2_step
        params = GPMP2Params(n_support_points=H, dt=0.04, sigma_start=1e-3,
                             sigma_gp=1e-1, sigma_goal_prior=1e-3,
                             sigma_coll=1e-4, step_size=1.0)
        step_fn = jax.jit(lambda th: gpmp2_step(
            task.collision_residuals, th, th[:, 0], th[:, -1], params))
        print("full GN step:             %7.2f ms" % bench(step_fn, theta))


if __name__ == "__main__":
    main()
