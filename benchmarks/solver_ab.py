"""A/B: unrolled vs reduce-form block ops in the lanes btridiag solver.

The current solver unrolls every small matrix op into scalar (B,)-lane
multiply-add chains — fastest measured runtime, but the scan body is ~10k
jaxpr equations (22.8k stablehlo lines), which dominates bench first-compile
(trace+lower is proportional to equation count).

The reduce form keeps the SAME lanes layout (B minor, never a dot_general,
so no lane-axis transposes) but expresses each contraction as one
broadcast-multiply + one jnp.sum over the contraction axis:

    S = sum_k W[k,i,:] * W[k,j,:]  ->  jnp.sum(W[:,:,None,:] * W[:,None,:,:], 0)

2 equations instead of m^2 k.  This file measures runtime (chained on-device
iteration differencing — block_until_ready does not drain the axon queue)
and compile/lower time for:

  v0  current fully-unrolled solver
  v1  reduce-form matmul_T/matvec only (Cholesky + triangular solves unrolled)
  v2  reduce-form everywhere (incl. triangular-solve inner sums)

Run: python benchmarks/solver_ab.py
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

from torch_robotics_tpu.solve.btridiag_lanes import (
    _chol_lanes, _trsm_lower_lanes, _trsv_lower_lanes, _trsv_upper_lanes,
    solve_lanes_core)

K_LO, K_HI = 4, 20
EPS = 1e-30


# ---------------- reduce-form block ops (lanes layout, no dot_general) ----

def _matmul_T_reduce(A, B_mat):
    """A^T @ B: (k, m, Bv) x (k, n, Bv) -> (m, n, Bv) via one reduce."""
    return jnp.sum(A[:, :, None, :] * B_mat[:, None, :, :], axis=0)


def _matvec_T_reduce(A, x):
    """A^T @ x: (k, m, Bv) x (k, Bv) -> (m, Bv)."""
    return jnp.sum(A * x[:, None, :], axis=0)


def _matvec_reduce(A, x):
    """A @ x: (m, k, Bv) x (k, Bv) -> (m, Bv)."""
    return jnp.sum(A * x[None, :, :], axis=1)


def _trsm_lower_reduce(L, B_mat):
    """Solve L X = B, rows sequential but inner k-sum as one reduce."""
    m = B_mat.shape[0]
    X = []
    for i in range(m):
        s = B_mat[i]
        if i:
            prefix = jnp.stack(X) if i > 1 else X[0][None]
            s = s - jnp.sum(L[i, :i, None, :] * prefix, axis=0)
        X.append(s / L[i, i][None, :])
    return jnp.stack(X)


def _trsv_lower_reduce(L, b):
    m = b.shape[0]
    x = []
    for i in range(m):
        s = b[i]
        if i:
            prefix = jnp.stack(x) if i > 1 else x[0][None]
            s = s - jnp.sum(L[i, :i] * prefix, axis=0)
        x.append(s / L[i, i])
    return jnp.stack(x)


def _trsv_upper_reduce(L, b):
    m = b.shape[0]
    x = [None] * m
    for i in reversed(range(m)):
        s = b[i]
        if i < m - 1:
            suffix = jnp.stack(x[i + 1:]) if m - i - 1 > 1 else x[i + 1][None]
            s = s - jnp.sum(L[i + 1:, i] * suffix, axis=0)
        x[i] = s / L[i, i]
    return jnp.stack(x)


def _chol_reduce(A):
    m = A.shape[0]
    L = [[None] * m for _ in range(m)]
    for i in range(m):
        for j in range(i + 1):
            s = A[i, j]
            if j:
                Li = jnp.stack([L[i][k] for k in range(j)])
                Lj = jnp.stack([L[j][k] for k in range(j)])
                s = s - jnp.sum(Li * Lj, axis=0)
            L[i][j] = jnp.sqrt(s) if i == j else s / L[j][j]
    rows = [jnp.stack([L[i][j] if j <= i else jnp.zeros_like(A[0, 0])
                       for j in range(m)]) for i in range(m)]
    return jnp.stack(rows)


def make_core(chol, trsv_lo, trsm_lo, mm_T, mv_T, mv, trsv_up):
    def core(Dt, Ut, bt):
        def fwd(carry, inp):
            S_prev, Wy_prev = carry
            D_k, U_k, b_k = inp
            L_k = chol(D_k - S_prev)
            y_k = trsv_lo(L_k, b_k - Wy_prev)
            W_k = trsm_lo(L_k, U_k)
            return (mm_T(W_k, W_k), mv_T(W_k, y_k)), (L_k, y_k)

        S0 = jnp.zeros_like(Dt[0])
        Wy0 = jnp.zeros_like(bt[0])
        _, (L, y) = jax.lax.scan(fwd, (S0, Wy0), (Dt, Ut, bt))

        def bwd(x_next, inp):
            L_k, U_k, y_k = inp
            W_k = trsm_lo(L_k, U_k)
            x_k = trsv_up(L_k, y_k - mv(W_k, x_next))
            return x_k, x_k

        x0 = jnp.zeros_like(bt[0])
        _, x_rev = jax.lax.scan(bwd, x0, (L[::-1], Ut[::-1], y[::-1]))
        return x_rev[::-1]
    return core


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


def main():
    B, H, m = 1024, 64, 14
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    A = jax.random.normal(k1, (H, m, m, B))
    D = (jnp.einsum("hikb,hjkb->hijb", A, A) / m
         + 10.0 * jnp.eye(m)[None, :, :, None])
    U = jnp.broadcast_to((-0.5 * jnp.eye(m))[None, :, :, None], (H, m, m, 1))
    b = jax.random.normal(k2, (H, m, B))

    core_v1 = make_core(_chol_lanes, _trsv_lower_lanes, _trsm_lower_lanes,
                        _matmul_T_reduce, _matvec_T_reduce, _matvec_reduce,
                        _trsv_upper_lanes)
    core_v2 = make_core(_chol_reduce, _trsv_lower_reduce, _trsm_lower_reduce,
                        _matmul_T_reduce, _matvec_T_reduce, _matvec_reduce,
                        _trsv_upper_reduce)
    variants = [("v0 unrolled", solve_lanes_core),
                ("v1 reduce mm/mv", core_v1),
                ("v2 reduce all", core_v2)]

    with jax.default_matmul_precision("float32"):
        # correctness first
        x_ref = None
        for name, core in variants:
            x = jax.jit(core)(D, U, b)
            if x_ref is None:
                x_ref = np.asarray(x)
            else:
                err = float(np.max(np.abs(np.asarray(x) - x_ref)))
                print(f"{name}: max |x - v0| = {err:.3e}")
                assert err < 1e-4, name

        for name, core in variants:
            t0 = time.perf_counter()
            lowered = jax.jit(core).lower(D, U, b)
            t1 = time.perf_counter()
            lowered.compile()
            t2 = time.perf_counter()
            n_lines = sum(1 for _ in lowered.as_text().splitlines())
            print(f"{name}: lower {t1 - t0:5.1f}s  compile {t2 - t1:5.1f}s"
                  f"  stablehlo ~{n_lines} lines")

        for name, core in variants:
            def make_loop(K, core=core):
                def body(bb, _):
                    x = core(D, U, bb)
                    return bb + EPS * x, x[-1, 0, 0]
                f = jax.jit(lambda bb: jax.lax.scan(body, bb, None,
                                                    length=K)[1])
                return f, b
            lo = timed_fetch(*make_loop(K_LO))
            hi = timed_fetch(*make_loop(K_HI))
            per_iter = (hi - lo) / (K_HI - K_LO)
            print(f"{name}: {per_iter:7.2f} ms/solve  (K={K_LO}: {lo:.0f} ms,"
                  f" K={K_HI}: {hi:.0f} ms)")


if __name__ == "__main__":
    main()
