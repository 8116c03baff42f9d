"""Stage-level chained timing of the lanes obstacle-terms graph (bench
shapes: Panda + EnvSpheres3D, N = H*B = 65536 lanes, P = 9 points).

Differences between cumulative stages give per-stage cost:
  fk            lanes FK chain only
  fk+jac        + vectorized point Jacobians
  sdf+grad      min-over-objects SDF + gradient at P*N points (standalone)
  terms         full GN obstacle terms (h=64 solver layout)

Run: python benchmarks/terms_ablation.py
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


def chained_ms(make_loop, label):
    lo = timed_fetch(*make_loop(K_LO))
    hi = timed_fetch(*make_loop(K_HI))
    per_iter = (hi - lo) / (K_HI - K_LO)
    print("%-22s %8.2f ms/iter" % (label, per_iter))
    return per_iter


def main():
    from torch_robotics_tpu.envs import EnvSpheres3D
    from torch_robotics_tpu.ops import lanes_fk as LF
    from torch_robotics_tpu.robots import RobotPanda
    from torch_robotics_tpu.tasks import PlanningTask

    env = EnvSpheres3D(precompute_sdf_obj_fixed=False)
    robot = RobotPanda.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.03)
    model = robot.model
    d, B, H = robot.q_dim, 1024, 64
    N = B * H
    lam = 1.0 / (1e-4 ** 2)
    lanes = task.collision_residuals.obstacle_terms_lanes

    key = jax.random.PRNGKey(0)
    q = jax.random.uniform(key, (d, N), minval=robot.q_min[:, None],
                           maxval=robot.q_max[:, None])
    used_links = sorted(set(list(robot.object_coll_idxs)
                            + list(robot.self_coll_idxs or [])))
    P = len(used_links)
    pts_flat = jax.random.uniform(key, (3, P * N), minval=-1.0, maxval=1.0)

    with jax.default_matmul_precision("float32"):

        def loop_fk(K):
            def body(qq, _):
                R_w, t_w = LF.fk_lanes(model, qq)
                coupl = sum(t_w[li][0] for li in used_links)
                return qq + EPS * coupl[None, :], t_w[-1][0][0]
            f = jax.jit(lambda qq: jax.lax.scan(body, qq, None, length=K)[1])
            return f, q

        def loop_fk_jac(K):
            def body(qq, _):
                R_w, t_w = LF.fk_lanes(model, qq)
                pts = [t_w[li] for li in used_links]
                J = LF.point_jacobians_lanes(model, R_w, t_w, pts,
                                             used_links, q_cols=qq)
                coupl = None
                for cols in J:
                    for col in cols:
                        if col is not None:
                            coupl = (col[0] if coupl is None
                                     else coupl + col[0])
                return qq + EPS * coupl[None, :], coupl[0]
            f = jax.jit(lambda qq: jax.lax.scan(body, qq, None, length=K)[1])
            return f, q

        def loop_sdf(K):
            df_list = task.df_obj_list

            def body(pp, _):
                flat = tuple(pp[k] for k in range(3))
                val, grad = LF.sdf_and_grad_lanes(df_list, flat, 3)
                return pp + EPS * jnp.stack(grad), val[0]
            f = jax.jit(lambda pp: jax.lax.scan(body, pp, None, length=K)[1])
            return f, pts_flat

        def loop_terms(K):
            def body(qq, _):
                g, Hb, c = lanes(qq, lam, h=H)
                dq = jnp.transpose(g[:, :d, :], (1, 0, 2)).reshape(d, N)
                return qq + EPS * dq, c[0, 0]
            f = jax.jit(lambda qq: jax.lax.scan(body, qq, None, length=K)[1])
            return f, q

        fk = chained_ms(loop_fk, "fk")
        fkj = chained_ms(loop_fk_jac, "fk+jac")
        sdf = chained_ms(loop_sdf, "sdf+grad (P*N pts)")
        terms = chained_ms(loop_terms, "full terms (h=64)")
        print(f"-> jac ~{fkj - fk:.2f} ms, assembly+rest ~"
              f"{terms - fkj - sdf:.2f} ms")


if __name__ == "__main__":
    main()
