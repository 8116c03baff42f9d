"""A/B of the m=40 block-tridiagonal solve (config 4's dominant cost).

Compares at the config-4 shapes (H=32, m=40, B=256):
  - tiled ``block_tridiag_solve`` (the pre-round-3 default above m=32)
  - XLA lanes ``solve_lanes_core`` (reduce form)
  - Pallas column kernel ``solve_lanes_pallas_cols`` (VMEM-resident sweep)

Timing is the honest chained method (benchmarks/chained_timing.py): D is
produced IN-GRAPH per iteration so the loop-invariant factorization cannot
be hoisted; two K values are differenced to cancel dispatch + tunnel RTT.

Parity is checked on a well-conditioned system and on an ill-conditioned
one with GN-like block scales (prior precisions up to 1e8 on the diagonal),
with the relative residual ||Ax - b|| / ||b|| reported for each solver.

Run: python benchmarks/solver_m40_ab.py
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

K_LO, K_HI = 4, 16
EPS = 1e-30

H, M, B = 32, 40, 256


def make_system(key, ill=False):
    k1, k2 = jax.random.split(key)
    A = jax.random.normal(k1, (H, M, M, B))
    D = (jnp.einsum("hikb,hjkb->hijb", A, A) / M
         + 10.0 * jnp.eye(M)[None, :, :, None])
    if ill:
        # GN-like scales: start/goal prior precisions ~1e6-1e8 on some
        # diagonal entries of the first/last blocks, GP terms ~1e2
        s = jnp.where(jnp.arange(M) < M // 2, 1e8, 1e2)
        boost = jnp.zeros((H, M)).at[0].set(s).at[-1].set(s)
        # (.at on a tiny host-built constant; not in the hot path)
        D = D + (boost[:, :, None] * jnp.eye(M)[None])[:, :, :, None]
    U = jnp.broadcast_to((-0.5 * jnp.eye(M))[None, :, :, None], (H, M, M, 1))
    b = jax.random.normal(k2, (H, M, B))
    return D, U, b


def residual(D, U, b, x):
    """|| A x - b || / || b || with A the block-tridiagonal operator."""
    U3 = U[..., 0]
    Ax = jnp.einsum("hijb,hjb->hib", D, x)
    Ax = Ax.at[:-1].add(jnp.einsum("hij,hjb->hib", U3[:-1], x[1:]))
    Ax = Ax.at[1:].add(jnp.einsum("hji,hjb->hib", U3[:-1], x[:-1]))
    return float(jnp.linalg.norm(Ax - b) / jnp.linalg.norm(b))


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


def chained_ms(solver, D, U, b, label):
    def make_loop(K):
        def body(bb, _):
            D_in = D * (1.0 + EPS * bb[0, 0, 0])
            x = solver(D_in, U, bb)
            return bb + EPS * x, x[-1, 0, 0]
        f = jax.jit(lambda bb: jax.lax.scan(body, bb, None, length=K)[1])
        return f, bb_arg

    bb_arg = b
    t0 = time.perf_counter()
    lo = timed_fetch(*make_loop(K_LO))
    compile_s = time.perf_counter() - t0
    hi = timed_fetch(*make_loop(K_HI))
    per_iter = (hi - lo) / (K_HI - K_LO)
    print("%-28s %8.2f ms/solve  (first-call %.1f s; K=%d: %.1f ms, K=%d:"
          " %.1f ms)" % (label, per_iter, compile_s, K_LO, lo, K_HI, hi))
    return per_iter


def main():
    from torch_robotics_tpu.ops.pallas_btridiag import solve_lanes_pallas_cols
    from torch_robotics_tpu.solve.btridiag import block_tridiag_solve
    from torch_robotics_tpu.solve.btridiag_lanes import solve_lanes_core

    def tiled(D, U, b):
        D_b = jnp.transpose(D, (3, 0, 1, 2))
        b_b = jnp.transpose(b, (2, 0, 1))
        x = block_tridiag_solve(D_b, U[..., 0][None, :-1], b_b)
        return jnp.transpose(x, (1, 2, 0))

    def pallas_cols(D, U, b):
        return solve_lanes_pallas_cols(D, U, b, tile_b=128)

    solvers = [("tiled (jnp.linalg)", tiled),
               ("XLA lanes reduce-form", solve_lanes_core),
               ("Pallas cols VMEM sweep", pallas_cols)]

    with jax.default_matmul_precision("float32"):
        for ill in (False, True):
            D, U, b = make_system(jax.random.PRNGKey(0), ill=ill)
            print("\n== %s system (H=%d, m=%d, B=%d) =="
                  % ("ill-conditioned" if ill else "well-conditioned",
                     H, M, B))
            xs = {}
            for name, fn in solvers:
                t0 = time.perf_counter()
                x = jax.jit(fn)(D, U, b)
                x = np.asarray(x)
                dt = time.perf_counter() - t0
                xs[name] = x
                print("  %-26s residual %.2e  nan=%s  (first call %.1f s)"
                      % (name, residual(D, U, b, jnp.asarray(x)),
                         bool(np.isnan(x).any()), dt))
            ref = xs["XLA lanes reduce-form"]
            for name, _ in solvers:
                scale = np.abs(ref).max()
                print("  %-26s max |x - x_lanes| / max|x| = %.2e"
                      % (name, np.abs(xs[name] - ref).max() / scale))

        D, U, b = make_system(jax.random.PRNGKey(1), ill=True)
        print("\n== chained timing (in-graph D) ==")
        for name, fn in solvers:
            chained_ms(fn, D, U, b, name)


if __name__ == "__main__":
    main()
