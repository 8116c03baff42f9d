"""A/B + on-hardware parity: fused Pallas GN terms kernel vs the XLA graph.

The fused kernel (ops/pallas_terms.py) runs FK -> point Jacobians -> scene
SDF+grad -> hinge -> dense assembly per lane tile on VMEM, eliminating the
HBM materialization (and small-dim tile padding) between the XLA graph's
stages.  Measured here with in-graph-operand chained timing at the bench
shapes; also checks value parity on the chip for the plain and
grasped-object Panda (the grasped variant's interpret-mode run is too slow
for the CPU test suite).

Run: python benchmarks/pallas_terms_ab.py
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

K_LO, K_HI = 2, 10


def timed_fetch(fn, n=3):
    out = fn()
    np.asarray(jax.tree.leaves(out)[0].reshape(-1)[0])
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree.leaves(out)[0].reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def chained_ms(terms, q, lam, h):
    def make(K):
        @jax.jit
        def loop():
            def body(carry, _):
                qq = q * (1.0 + 1e-6 * carry)
                g, Hb, c = terms(qq, lam, h=h)
                return (g.sum() + Hb.sum() + c.sum()) * 1e-20, None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return out
        return loop
    lo = timed_fetch(make(K_LO))
    hi = timed_fetch(make(K_HI))
    return (hi - lo) / (K_HI - K_LO) * 1e3


def main():
    from torch_robotics_tpu.envs import EnvSpheres3D
    from torch_robotics_tpu.geom.objects import GraspedObjectPandaBox
    from torch_robotics_tpu.ops.lanes_fk import obstacle_terms_lanes_factory
    from torch_robotics_tpu.ops.pallas_terms import (
        obstacle_terms_pallas_factory)
    from torch_robotics_tpu.robots import RobotPanda
    from torch_robotics_tpu.tasks import PlanningTask

    B, H = 1024, 64
    N = B * H
    lam = 1e8
    for tag, robot in (
            ("panda", RobotPanda.create()),
            ("panda+grasped",
             RobotPanda.create(grasped_object=GraspedObjectPandaBox()))):
        task = PlanningTask(env=EnvSpheres3D(), robot=robot,
                            obstacle_cutoff_margin=0.03)
        d = robot.q_dim
        q = jax.random.uniform(jax.random.PRNGKey(0), (d, N),
                               minval=robot.q_min[:, None],
                               maxval=robot.q_max[:, None])
        t_xla = obstacle_terms_lanes_factory(task)
        t_pal = obstacle_terms_pallas_factory(task)
        assert t_pal is not None, tag
        # on-chip value parity (kernel vs XLA graph)
        a = t_xla(q[:, :4096], lam)
        b = t_pal(q[:, :4096], lam)
        rels = [float(jnp.abs(x - y).max())
                / (float(jnp.abs(x).max()) + 1e-30) for x, y in zip(a, b)]
        assert max(rels) < 1e-5, (tag, rels)
        ms_x = chained_ms(t_xla, q, lam, H)
        ms_p = chained_ms(t_pal, q, lam, H)
        print(f"{tag:15s} parity_rel={max(rels):.2e}  "
              f"xla {ms_x:.3f} ms/iter  pallas {ms_p:.3f} ms/iter  "
              f"speedup {ms_x / ms_p:.1f}x", flush=True)


if __name__ == "__main__":
    main()
