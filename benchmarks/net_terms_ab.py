"""A/B: learned-self-collision-net tasks in the fused terms kernel.

Round-4 gated net-bearing tasks OUT of the fused kernel with an unmeasured
comment ("MLP vjp in-kernel: not worth the layout change").  Round 5
implements the net row in-kernel — the MLP (7-256-64-1) is three small MXU
matmuls + vjp on the (features, TN) lanes activations, weights as
full-block VMEM const inputs — and this bench records the number that
comment owed: terms ms/iter and MPC solves/s, XLA lanes path vs fused
kernel, on the grasped-free Panda with ``use_learned_self_collision=True``
at the bench shapes (B=1024, H=64).

Timing: chained-difference with in-graph operand coupling
(benchmarks/chained_timing.py method).

Run: python benchmarks/net_terms_ab.py [--small]
"""
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


def chained_ms(fn, q, n_lo=2, n_hi=6, repeats=3):
    def timed(K):
        @jax.jit
        def loop(qq):
            def body(x, _):
                out = fn(x)
                s = sum(jnp.sum(o) for o in jax.tree.leaves(out))
                return x + EPS * s, None
            x, _ = jax.lax.scan(body, qq, None, length=K)
            return x[0, 0]
        np.asarray(loop(q))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(loop(q))
            best = min(best, time.perf_counter() - t0)
        return best
    return (timed(n_hi) - timed(n_lo)) / (n_hi - n_lo) * 1e3


def main(small=False):
    from torch_robotics_tpu.envs import EnvSpheres3D
    from torch_robotics_tpu.ops.lanes_fk import obstacle_terms_lanes_factory
    from torch_robotics_tpu.ops.pallas_terms import (
        obstacle_terms_pallas_factory)
    from torch_robotics_tpu.robots import RobotPanda
    from torch_robotics_tpu.solve import GPMP2Params
    from torch_robotics_tpu.solve.gp_prior import straight_line_trajs
    from torch_robotics_tpu.solve.mpc import MPCParams, MPCState, mpc_step
    from torch_robotics_tpu.tasks import PlanningTask

    env = EnvSpheres3D(precompute_sdf_obj_fixed=False)
    robot = RobotPanda.create(use_learned_self_collision=True)
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.03)
    d = robot.q_dim
    B = 64 if small else 1024
    H = 16 if small else 64
    N = B * H
    q = jax.random.uniform(jax.random.PRNGKey(0), (d, N),
                           minval=robot.q_min[:, None],
                           maxval=robot.q_max[:, None])

    t_xla = obstacle_terms_lanes_factory(task)
    t_pal = obstacle_terms_pallas_factory(task)
    assert t_pal is not None
    out = {}
    out["terms_xla_ms"] = round(chained_ms(lambda x: t_xla(x, 77.0), q), 3)
    out["terms_kernel_ms"] = round(chained_ms(lambda x: t_pal(x, 77.0), q),
                                   3)
    out["terms_speedup"] = round(out["terms_xla_ms"]
                                 / out["terms_kernel_ms"], 2)
    # numeric agreement on-device
    a = t_xla(q[:, :4096], 77.0)
    b = t_pal(q[:, :4096], 77.0)
    err = max(float(jnp.abs(x - y).max()
                    / (jnp.abs(x).max() + 1e-30)) for x, y in zip(a, b))
    out["terms_rel_err"] = float(f"{err:.2e}")

    # MPC throughput with the net robot (task wiring picks the kernel)
    gp = GPMP2Params(n_support_points=H, dt=0.04, opt_iters=2,
                     sigma_start=1e-3, sigma_gp=1e-1, sigma_goal_prior=1e-3,
                     sigma_coll=1e-4, step_size=1.0)
    params = MPCParams(gpmp2=gp, iters_per_step=2)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    u1 = jax.random.uniform(k1, (B, d))
    u2 = jax.random.uniform(k2, (B, d))
    qs = robot.q_min + 0.25 * (robot.q_max - robot.q_min) * (1 + u1) / 2
    qg = robot.q_max - 0.25 * (robot.q_max - robot.q_min) * (1 + u2) / 2
    start = jnp.concatenate([qs, jnp.zeros_like(qs)], -1)
    goal = jnp.concatenate([qg, jnp.zeros_like(qg)], -1)
    state = MPCState(theta=straight_line_trajs(start, goal, H), x=start)

    def steps(K):
        @jax.jit
        def run(st):
            def body(s, _):
                s2, info = mpc_step(task.collision_residuals, s, goal,
                                    params)
                return s2, info["collision_cost"].mean()
            s2, costs = jax.lax.scan(body, st, None, length=K)
            return costs
        def timed():
            np.asarray(run(state))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(run(state))
                best = min(best, time.perf_counter() - t0)
            return best
        return timed()

    lo, hi = (2, 6) if small else (4, 12)
    per_step = (steps(hi) - steps(lo)) / (hi - lo)
    out["mpc_solves_per_s"] = round(B / per_step, 1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(small="--small" in sys.argv)
