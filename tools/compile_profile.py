"""Profile WHERE cold-compile time goes in the lanes obstacle-terms graph.

Times `jit(...).lower(args).compile()` for nested sub-graphs of the bench
MPC step's hot function (Panda + EnvSpheres3D, N = H*B lanes) with the
persistent compile cache pointed at a throwaway dir, so every measurement
is a true cold compile on the axon TPU toolchain.

Usage: python tools/compile_profile.py [stage ...]
  stages: fk jac stack terms solver (default: all)
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

# repo root on sys.path (PYTHONPATH breaks the axon backend registration)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", tempfile.mkdtemp())

B, H = 1024, 64
N = B * H


def timed_compile(name, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    try:
        n_ops = sum(1 for _ in lowered.as_text().splitlines())
    except Exception:
        n_ops = -1
    print(f"{name:28s} trace+lower {t1 - t0:7.1f}s   compile {t2 - t1:7.1f}s"
          f"   (stablehlo lines ~{n_ops})")
    return compiled


def main():
    stages = set(sys.argv[1:]) or {"fk", "jac", "terms", "solver"}

    from torch_robotics_tpu.envs import EnvSpheres3D
    from torch_robotics_tpu.ops import lanes_fk as LF
    from torch_robotics_tpu.robots import RobotPanda
    from torch_robotics_tpu.tasks import PlanningTask

    env = EnvSpheres3D(precompute_sdf_obj_fixed=False)
    robot = RobotPanda.create()
    # PERTURB=x jitters the cutoff constant: changes the HLO hash so the
    # axon server's own compile cache (independent of the local persistent
    # cache) cannot serve the graph — forces a true cold compile.
    import os as _os
    cutoff = 0.03 + float(_os.environ.get("PERTURB", "0")) * 1e-6
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=cutoff)
    model = robot.model
    d = robot.q_dim

    q_cols = jax.random.uniform(jax.random.PRNGKey(0), (d, N),
                                minval=robot.q_min[:, None],
                                maxval=robot.q_max[:, None])

    if "fk" in stages:
        def fk_only(qc):
            R_w, t_w = LF.fk_lanes(model, qc)
            # force all outputs live
            return sum(sum(r for r in row) for R in R_w for row in R) \
                + sum(sum(c for c in t) for t in t_w)
        timed_compile("fk_lanes", fk_only, q_cols)

    used_links = sorted(set(list(robot.object_coll_idxs)
                            + list(robot.self_coll_idxs or [])))

    if "jac" in stages:
        def fk_jac(qc):
            R_w, t_w = LF.fk_lanes(model, qc)
            pts = [t_w[li] for li in used_links]
            link_ids = list(used_links)
            if robot.grasped_n_points > 0:
                gi = model.link_index(robot.link_name_grasped_object)
                for g in range(robot.grasped_n_points):
                    gp = tuple(robot.grasped_points[g, k] for k in range(3))
                    world = LF._matvec3(R_w[gi], gp)
                    pts.append(tuple(world[k] + t_w[gi][k] for k in range(3)))
                    link_ids.append(gi)
            J = LF.point_jacobians_lanes(model, R_w, t_w, pts, link_ids,
                                         q_cols=qc)
            acc = jnp.zeros((N,), qc.dtype)
            for cols in J:
                for col in cols:
                    if col is not None:
                        acc = acc + col[0] + col[1] + col[2]
            for p in pts:
                acc = acc + p[0] + p[1] + p[2]
            return acc
        timed_compile("fk + point_jacobians", fk_jac, q_cols)

    if "terms" in stages:
        terms = LF.obstacle_terms_lanes_factory(task)
        timed_compile("obstacle_terms (h=None)", lambda qc: terms(qc, 1e8),
                      q_cols)
        timed_compile("obstacle_terms (h=64)",
                      lambda qc: terms(qc, 1e8, h=H), q_cols)

    if "solver" in stages:
        from torch_robotics_tpu.solve.btridiag_lanes import solve_lanes_core
        m = 2 * d
        key = jax.random.PRNGKey(1)
        diag = jnp.eye(m)[None, :, :, None] * 10.0 \
            + jax.random.uniform(key, (H, m, m, B)) * 0.01
        off = jax.random.uniform(key, (H, m, m, 1)) * 0.01  # last block unused
        rhs = jnp.asarray(jax.random.uniform(key, (H, m, B)))
        timed_compile("btridiag solver (lanes)",
                      lambda a, b, c: solve_lanes_core(a, b, c),
                      diag, off, rhs)


if __name__ == "__main__":
    main()
