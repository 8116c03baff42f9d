"""A/B: unrolled vs reduce-form block ops in the lanes btridiag solver.

Historical record + reproduction harness for the measurement that moved
`solve/btridiag_lanes.py` to reduce form.  The PREVIOUS production solver
unrolled every small matrix op into scalar (B,)-lane multiply-add chains —
that original implementation is embedded here as v0 (it no longer exists in
the package); the production solver is now the reduce form (v2).

The reduce form keeps the SAME lanes layout (B minor, never a dot_general,
so no lane-axis transposes) but expresses each contraction as one
broadcast-multiply + one jnp.sum over the contraction axis:

    S = sum_k W[k,i,:] * W[k,j,:]  ->  jnp.sum(W[:,:,None,:] * W[:,None,:,:], 0)

2 equations instead of m^2 k.  Measured (2026-08-17, 1 x v5e, H=64, m=14,
B=1024): v0 2.64 ms/solve at 22.8k stablehlo lines; v2 1.80 ms/solve at
3.6k lines — faster AND 6.4x smaller.  Runtime via chained on-device
iteration differencing (block_until_ready does not drain the axon queue).

  v0  fully-unrolled solver (the pre-2026-08-17 production implementation)
  v1  reduce-form matmul_T/matvec only (Cholesky + triangular solves unrolled)
  v2  reduce-form everywhere == the current production solve_lanes_core

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

from torch_robotics_tpu.solve.btridiag_lanes import solve_lanes_core

K_LO, K_HI = 4, 20
EPS = 1e-30


# -------- v0: the original fully-unrolled block ops (verbatim copy of the
# pre-reduce-form production implementation; O(m^3) jaxpr equations) -------

def _chol_unrolled(A):
    m = A.shape[0]
    L = [[None] * m for _ in range(m)]
    for i in range(m):
        for j in range(i + 1):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    rows = [jnp.stack([L[i][j] if j <= i else jnp.zeros_like(A[0, 0])
                       for j in range(m)]) for i in range(m)]
    return jnp.stack(rows)


def _trsm_lower_unrolled(L, B_mat):
    m = B_mat.shape[0]
    X = [None] * m
    for i in range(m):
        s = B_mat[i]
        for k in range(i):
            s = s - L[i, k][None, :] * X[k]
        X[i] = s / L[i, i][None, :]
    return jnp.stack(X)


def _trsv_lower_unrolled(L, b):
    m = b.shape[0]
    x = [None] * m
    for i in range(m):
        s = b[i]
        for k in range(i):
            s = s - L[i, k] * x[k]
        x[i] = s / L[i, i]
    return jnp.stack(x)


def _trsv_upper_unrolled(LT_rows, b):
    m = b.shape[0]
    x = [None] * m
    for i in reversed(range(m)):
        s = b[i]
        for k in range(i + 1, m):
            s = s - LT_rows[k, i] * x[k]
        x[i] = s / LT_rows[i, i]
    return jnp.stack(x)


def _matmul_T_unrolled(A, B_mat):
    k, m = A.shape[0], A.shape[1]
    n = B_mat.shape[1]
    rows = []
    for i in range(m):
        row = []
        for j in range(n):
            s = A[0, i] * B_mat[0, j]
            for kk in range(1, k):
                s = s + A[kk, i] * B_mat[kk, j]
            row.append(s)
        rows.append(jnp.stack(row))
    return jnp.stack(rows)


def _matvec_T_unrolled(A, x):
    k, m = A.shape[0], A.shape[1]
    out = []
    for i in range(m):
        s = A[0, i] * x[0]
        for kk in range(1, k):
            s = s + A[kk, i] * x[kk]
        out.append(s)
    return jnp.stack(out)


def _matvec_unrolled(A, x):
    m, k = A.shape[0], A.shape[1]
    out = []
    for i in range(m):
        s = A[i, 0] * x[0]
        for kk in range(1, k):
            s = s + A[i, kk] * x[kk]
        out.append(s)
    return jnp.stack(out)


# -------- reduce-form primitives (same math as production) ---------------

def _matmul_T_reduce(A, B_mat):
    return jnp.sum(A[:, :, None, :] * B_mat[:, None, :, :], axis=0)


def _matvec_T_reduce(A, x):
    return jnp.sum(A * x[:, None, :], axis=0)


def _matvec_reduce(A, x):
    return jnp.sum(A * x[None, :, :], axis=1)


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

    core_v0 = make_core(_chol_unrolled, _trsv_lower_unrolled,
                        _trsm_lower_unrolled, _matmul_T_unrolled,
                        _matvec_T_unrolled, _matvec_unrolled,
                        _trsv_upper_unrolled)
    core_v1 = make_core(_chol_unrolled, _trsv_lower_unrolled,
                        _trsm_lower_unrolled, _matmul_T_reduce,
                        _matvec_T_reduce, _matvec_reduce,
                        _trsv_upper_unrolled)
    variants = [("v0 unrolled", core_v0),
                ("v1 reduce mm/mv", core_v1),
                ("v2 reduce all (prod)", solve_lanes_core)]

    with jax.default_matmul_precision("float32"):
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
                    # D produced IN-GRAPH per iteration: with a constant D,
                    # XLA hoists the loop-invariant factorization out of
                    # the chained loop and only the back-substitution gets
                    # timed (the original 2.64-vs-1.80 ms numbers had this
                    # flaw; the end-to-end bench gain was real regardless)
                    D_in = D * (1.0 + EPS * bb[0, 0, 0])
                    x = core(D_in, U, bb)
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
