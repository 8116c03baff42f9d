"""A/B: trsv backward tail vs trsm recompute / W-persist in the Pallas
block-tridiagonal sweeps.

The backward step needs only the vector ``W_k x_{k+1} = L_k^{-1} (U_k
x_{k+1})`` — a matvec + triangular VECTOR solve — yet the plain kernels
recompute the full ``W = L^{-1} U`` (a trsm: ~m^3/2 scalar ops at m<=16,
m (m, m, TB)-sized updates in the column kernel) and the round-5 W-persist
variant instead spends an extra (H, m, m, TB) VMEM stack (forcing lane
tile 256 instead of 512 at bench shapes).  The trsv tail is ~1.5 m^2 ops
with ZERO extra VMEM, so it can run at the plain kernel's larger tile.

Timing: chained K-iteration in-graph loops with D produced in-graph per
iteration (the hoisting trap, CLAUDE.md), two-K difference to cancel
dispatch + tunnel RTT, interleaved min-of-N per variant.

RESULT (2026-08-20, three runs, ROUNDS=6/6/14): at m=14 the W-persist
sweep keeps the default (B=1024: 1.12-1.23 W vs 1.22-1.41 trsv; the
B=256 headline chunk: 0.10-0.19 W vs 0.14-0.20 trsv — reading the
persisted W rows beats recomputing even the cheap trsv, and the m=14
run-to-run spread ~0.1 ms dwarfs the tail difference).  At m=40 the trsv
tail WINS consistently (1.507/1.525/1.528 vs 1.601/1.611/1.666, ~6%):
the column kernel's trsm tail is m (m, m, TB)-sized updates, a
factor-m more data than the trsv's (m, TB) slices — now the default in
``solve_lanes_pallas_cols`` dispatch (solve_lanes_auto + gpmp2 m>16).

Run: python benchmarks/btridiag_trsv_ab.py
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
ROUNDS = 6


def make_system(H, m, B, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    A = jax.random.normal(k1, (H, m, m, B))
    D = (jnp.einsum("hikb,hjkb->hijb", A, A) / m
         + 10.0 * jnp.eye(m)[None, :, :, None])
    U = jnp.broadcast_to((-0.5 * jnp.eye(m))[None, :, :, None],
                         (H, m, m, 1))
    b = jax.random.normal(k2, (H, m, B))
    return D, U, b


def chained(solver, D, U, b, K):
    def body(bb, _):
        D_in = D * (1.0 + EPS * bb[0, 0, 0])
        x = solver(D_in, U, bb)
        return bb + EPS * x, x[-1, 0, 0]
    return jax.jit(lambda bb: jax.lax.scan(body, bb, None, length=K)[1])


def fetch_ms(f, b):
    t0 = time.perf_counter()
    np.asarray(f(b))
    return (time.perf_counter() - t0) * 1e3


def main():
    from torch_robotics_tpu.ops.pallas_btridiag import (
        solve_lanes_pallas, solve_lanes_pallas_cols, solve_lanes_pallas_w)

    suites = [
        ("bench shapes", (64, 14, 1024), [
            ("plain trsm t512", lambda D, U, b: solve_lanes_pallas(
                D, U, b, tile_b=512)),
            ("W-persist t256", lambda D, U, b: solve_lanes_pallas_w(
                D, U, b, tile_b=256)),
            ("trsv t512", lambda D, U, b: solve_lanes_pallas(
                D, U, b, tile_b=512, bwd_trsv=True)),
        ]),
        ("headline chunk", (64, 14, 256), [
            ("plain trsm t256", lambda D, U, b: solve_lanes_pallas(
                D, U, b, tile_b=256)),
            ("W-persist t256", lambda D, U, b: solve_lanes_pallas_w(
                D, U, b, tile_b=256)),
            ("trsv t256", lambda D, U, b: solve_lanes_pallas(
                D, U, b, tile_b=256, bwd_trsv=True)),
        ]),
        ("config-4 shapes", (32, 40, 256), [
            ("cols trsm t128", lambda D, U, b: solve_lanes_pallas_cols(
                D, U, b, tile_b=128)),
            ("cols trsv t128", lambda D, U, b: solve_lanes_pallas_cols(
                D, U, b, tile_b=128, bwd_trsv=True)),
        ]),
    ]

    for suite, (H, m, B), variants in suites:
        print("== %s  H=%d m=%d B=%d" % (suite, H, m, B))
        D, U, b = make_system(H, m, B)
        loops = [(lbl, chained(fn, D, U, b, K_LO), chained(fn, D, U, b, K_HI))
                 for lbl, fn in variants]
        # warm up compiles
        for _, lo, hi in loops:
            np.asarray(lo(b)); np.asarray(hi(b))
        best = {lbl: [float("inf"), float("inf")] for lbl, _, _ in loops}
        for _ in range(ROUNDS):
            for lbl, lo, hi in loops:
                best[lbl][0] = min(best[lbl][0], fetch_ms(lo, b))
                best[lbl][1] = min(best[lbl][1], fetch_ms(hi, b))
        for lbl, _, _ in loops:
            lo, hi = best[lbl]
            per = (hi - lo) / (K_HI - K_LO)
            print("  %-18s %7.3f ms/solve  %9.1f solves/s"
                  % (lbl, per, B / per * 1e3))


if __name__ == "__main__":
    main()
