"""Grid-SDF (voxel lookup) vs analytic-SDF scenes on the TPU hot path.

The north star calls for "environment SDF grids replicated in HBM"
(BASELINE.json); SURVEY §7 named the differentiable grid lookup the
speed-of-light risk item (gathers are this toolchain's documented
weakness).  This bench records the full GN-step cost with the scene's
fixed objects served by the precomputed ``GridSDF`` (nearest-cell +
surrogate gradient, reference grid_map_sdf.py:84-114 semantics) vs the
analytic primitive SDFs, at the config-2 (PointMass/EnvDense2D, B=1024,
H=64) and config-3 (Panda/EnvSpheres3D, B=4096, H=64) shapes.

Timing: chained-difference with in-graph coupling (benchmarks/
chained_timing.py method — block_until_ready does not drain the axon
remote queue, and constant operands get loop-hoisted).

Run: python benchmarks/grid_sdf_bench.py [--small]
"""
import argparse
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

K_LO, K_HI = 4, 16
EPS = 1e-30


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


def chained_step_ms(task, theta, start, goal, params):
    from torch_robotics_tpu.solve.gpmp2 import gpmp2_step

    def make_loop(K):
        def body(th, _):
            th2, cost = gpmp2_step(task.collision_residuals, th, start, goal,
                                   params)
            return th2, cost[0]
        f = jax.jit(lambda th: jax.lax.scan(body, th, None, length=K)[1])
        return f, theta

    lo = timed_fetch(*make_loop(K_LO))
    hi = timed_fetch(*make_loop(K_HI))
    return (hi - lo) / (K_HI - K_LO)


def bench_env(tag, env_ctor, robot, start, goal, B, H, params, small):
    from torch_robotics_tpu.solve.gp_prior import straight_line_trajs
    from torch_robotics_tpu.tasks import PlanningTask

    theta = straight_line_trajs(jnp.tile(start, (B, 1)),
                                jnp.tile(goal, (B, 1)), H)
    out = {}
    for mode in ("analytic", "grid"):
        t0 = time.perf_counter()
        env = env_ctor(mode == "grid")
        if mode == "grid":
            g = env.grid_map_sdf_obj_fixed
            jax.block_until_ready(g.sdf_grid)
            out["grid_cells"] = int(np.prod(g.cmap_dim))
            out["grid_precompute_s"] = round(time.perf_counter() - t0, 2)
        task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.02)
        ms = chained_step_ms(task, theta, start, goal, params)
        out[f"{mode}_gn_step_ms"] = round(ms, 3)
        out[f"{mode}_solves_per_s"] = round(B / (ms / 1e3) / 2, 1)  # 2 GN it
    out["grid_vs_analytic"] = round(
        out["grid_gn_step_ms"] / out["analytic_gn_step_ms"], 2)
    print(tag, out, flush=True)
    return out


def make_many_spheres_env(n, precompute, cell=0.005, seed=3):
    """Synthetic many-primitive scene: n small circles in [-1, 1]^2.

    The grid's raison d'etre: the analytic min-over-primitives SDF costs
    O(n) per query while the voxel lookup is O(1) — this case locates the
    crossover on TPU.
    """
    from torch_robotics_tpu.envs.base import EnvBase
    from torch_robotics_tpu.geom import ObjectField, Spheres
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-0.85, 0.85, (n, 2)).astype(np.float32)
    radii = np.full(n, 0.015, np.float32)
    field = ObjectField.create([Spheres(centers=jnp.asarray(centers),
                                        radii=jnp.asarray(radii))],
                               name="many_spheres")
    return EnvBase(name="EnvManySpheres2D",
                   limits=jnp.array([[-1.0, -1.0], [1.0, 1.0]]),
                   obj_fixed_list=[field],
                   precompute_sdf_obj_fixed=precompute,
                   sdf_cell_size=cell)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    from torch_robotics_tpu.envs import EnvDense2D, EnvSpheres3D
    from torch_robotics_tpu.robots import RobotPanda, RobotPointMass
    from torch_robotics_tpu.solve import GPMP2Params

    B2 = 64 if args.small else 1024
    H = 16 if args.small else 64
    params2 = GPMP2Params(n_support_points=H, dt=0.04, sigma_start=1e-3,
                          sigma_gp=1e-1, sigma_goal_prior=1e-3,
                          sigma_coll=1e-4, step_size=0.5)
    bench_env(
        "pointmass2d_dense",
        lambda grid: EnvDense2D(precompute_sdf_obj_fixed=grid,
                                sdf_cell_size=0.005),
        RobotPointMass.create(),
        jnp.array([-0.9, -0.9, 0.0, 0.0]), jnp.array([0.9, 0.9, 0.0, 0.0]),
        B2, H, params2, args.small)

    B3 = 64 if args.small else 4096
    robot = RobotPanda.create()
    q0 = 0.5 * (robot.q_min + robot.q_max)
    qg = jnp.clip(q0 + 0.5, robot.q_min, robot.q_max)
    params3 = GPMP2Params(n_support_points=H, dt=0.04, sigma_start=1e-3,
                          sigma_gp=1e-1, sigma_goal_prior=1e-2,
                          sigma_coll=5e-4, step_size=0.8)
    for n_prims in (256, 4096):
        bench_env(
            f"pointmass2d_many_spheres_{n_prims}",
            lambda grid, n=n_prims: make_many_spheres_env(n, grid),
            RobotPointMass.create(),
            jnp.array([-0.9, -0.9, 0.0, 0.0]),
            jnp.array([0.9, 0.9, 0.0, 0.0]),
            B2, H, params2, args.small)

    bench_env(
        "panda_spheres3d",
        # 0.01 m cells in 3D: 200^3 = 8M cells (32 MB sdf + 96 MB grad in
        # HBM); the reference's 2D default 0.005 would be 64M cells in 3D
        lambda grid: EnvSpheres3D(precompute_sdf_obj_fixed=grid,
                                  sdf_cell_size=0.01),
        robot,
        jnp.concatenate([q0, jnp.zeros(7)]),
        jnp.concatenate([qg, jnp.zeros(7)]),
        B3, H, params3, args.small)


if __name__ == "__main__":
    main()
