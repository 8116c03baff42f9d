"""Trustworthy per-stage timing of the flagship GN step on the axon backend.

``jax.block_until_ready`` does not reliably drain the remote execution queue
on this backend (measured: the btridiag solve "timed" at 0.08 ms this way,
while the full step it dominates takes ~50 ms).  This harness instead:

  1. chains K iterations of each stage *on device* inside one jit
     (output feeds back into input, so iterations serialize and can't be
     dead-code-eliminated),
  2. fetches one small output with ``np.asarray`` (a real round-trip drain),
  3. runs at two K values and reports the *difference* per extra iteration,
     cancelling the fixed dispatch + tunnel-RTT cost.

Run: python benchmarks/chained_timing.py
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
import numpy as np

K_LO, K_HI = 4, 20
EPS = 1e-30  # chain coupling too small to change values, big enough to defeat DCE


def timed_fetch(fn, *args, n=3):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def chained_ms(make_loop, label):
    """make_loop(K) -> jitted zero-arg-ish callable returning a small array."""
    lo = timed_fetch(*make_loop(K_LO))
    hi = timed_fetch(*make_loop(K_HI))
    per_iter = (hi - lo) / (K_HI - K_LO)
    print("%-26s %8.2f ms/iter   (K=%d: %.1f ms, K=%d: %.1f ms)"
          % (label, per_iter, K_LO, lo, K_HI, hi))
    return per_iter


def main():
    from torch_robotics_tpu.envs import EnvSpheres3D
    from torch_robotics_tpu.robots import RobotPanda
    from torch_robotics_tpu.solve import GPMP2Params
    from torch_robotics_tpu.solve.btridiag_lanes import solve_lanes_core
    from torch_robotics_tpu.solve.gpmp2 import gpmp2_step
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
    lanes = task.collision_residuals.obstacle_terms_lanes

    key = jax.random.PRNGKey(0)
    q = jax.random.uniform(key, (d, N), minval=robot.q_min[:, None],
                           maxval=robot.q_max[:, None])
    theta = straight_line_trajs(jnp.zeros((B, m)), jnp.ones((B, m)), H)
    params = GPMP2Params(n_support_points=H, dt=0.04, sigma_start=1e-3,
                         sigma_gp=1e-1, sigma_goal_prior=1e-3,
                         sigma_coll=1e-4, step_size=1.0)

    k1, k2 = jax.random.split(key)
    A = jax.random.normal(k1, (H, m, m, B))
    D = (jnp.einsum("hikb,hjkb->hijb", A, A) / m
         + 10.0 * jnp.eye(m)[None, :, :, None])
    U = jnp.broadcast_to((-0.5 * jnp.eye(m))[None, :, :, None], (H, m, m, 1))
    b = jax.random.normal(k2, (H, m, B))

    with jax.default_matmul_precision("float32"):

        def loop_solve(K):
            def body(bb, _):
                # D produced in-graph per iteration — a constant D lets XLA
                # hoist the loop-invariant factorization out of the chained
                # loop, timing only the back-substitution
                D_in = D * (1.0 + EPS * bb[0, 0, 0])
                x = solve_lanes_core(D_in, U, bb)
                return bb + EPS * x, x[-1, 0, 0]
            f = jax.jit(lambda bb: jax.lax.scan(body, bb, None, length=K)[1])
            return f, b

        def loop_terms(K):
            def body(qq, _):
                g, Hb, c = lanes(qq, lam, h=H)
                dq = jnp.transpose(g[:, :d, :], (1, 0, 2)).reshape(d, N)
                return qq + EPS * dq, c[0, 0]
            f = jax.jit(lambda qq: jax.lax.scan(body, qq, None, length=K)[1])
            return f, q

        def loop_step(K):
            def body(th, _):
                th2, cost = gpmp2_step(task.collision_residuals, th,
                                       th[:, 0], th[:, -1], params)
                return th2, cost[0]
            f = jax.jit(lambda th: jax.lax.scan(body, th, None, length=K)[1])
            return f, theta

        chained_ms(loop_solve, "btridiag solve")
        chained_ms(loop_terms, "obstacle terms (h-layout)")
        chained_ms(loop_step, "full GN step")


if __name__ == "__main__":
    main()
