"""Batch-minor block-tridiagonal solver: small linear algebra on the VPU.

The generic ``btridiag`` solver keeps blocks as (..., m, m) matrices; the TPU
pads each (14, 14) block to an (16, 128) tile — an ~8x waste of bandwidth and
memory that makes the solve bandwidth-bound.  This module stores every block
entry as a (B,) vector instead ("batch in the lane dimension"): the blocked
Cholesky, triangular solves and small matmuls are "reduce form" —
broadcast-multiply + jnp.sum over the contraction axis, never a dot_general
(whose B-major output layout would force a transpose per scan step) — over
(B,) lanes: zero padding, pure VPU.  For m = 14, H = 64 this is ~10x faster
than the tile-padded version, and the reduce form is both 1.56x faster
(3.18 vs 2.04 ms/solve, in-graph-D chained timing) and 6.4x fewer stablehlo
lines than full scalar unrolling (benchmarks/solver_ab.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["block_tridiag_solve_lanes"]

# loop-unroll factor for the sequential sweeps (amortizes per-step dispatch)
_SCAN_UNROLL = 1  # >1 multiplies the already-unrolled body; compile cost outweighs dispatch savings


# The small-matrix contractions are expressed as broadcast-multiply +
# jnp.sum over the contraction axis ("reduce form") rather than einsum OR
# full scalar unrolling:
#  - einsum lowers to dot_general with batching_dims=[B-axis], whose TPU
#    output layout is B-MAJOR (tensor<Bx14x14>) — XLA then transposes back
#    to lanes layout inside every scan step (measured 4x slower);
#  - full scalar unrolling (the previous design) keeps everything fusable
#    but costs O(m^3) jaxpr equations: 22.8k stablehlo lines at m=14, which
#    dominated bench first-compile/trace time AND ran slower;
#  - the reduce form keeps the B-minor layout (never a dot_general), is
#    O(m^2) equations (3.6k lines at m=14), and measured FASTER:
#    1.80 vs 2.64 ms/solve at H=64, m=14, B=1024 (benchmarks/solver_ab.py).


def _chol_lanes(A):
    """Cholesky of (m, m, B): returns lower L with L @ L^T = A.

    Row-sequential; the inner dot over k<j is one reduce per (i, j) entry.
    """
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


def _trsm_lower_lanes(L, B_mat):
    """Solve L X = B for X, L lower (m, m, Bv), B (m, n, Bv)."""
    m = B_mat.shape[0]
    X = []
    for i in range(m):
        s = B_mat[i]
        if i:
            prefix = jnp.stack(X) if i > 1 else X[0][None]
            s = s - jnp.sum(L[i, :i, None, :] * prefix, axis=0)
        X.append(s / L[i, i][None, :])
    return jnp.stack(X)


def _trsv_lower_lanes(L, b):
    """Solve L x = b, L lower (m, m, Bv), b (m, Bv)."""
    m = b.shape[0]
    x = []
    for i in range(m):
        s = b[i]
        if i:
            prefix = jnp.stack(x) if i > 1 else x[0][None]
            s = s - jnp.sum(L[i, :i] * prefix, axis=0)
        x.append(s / L[i, i])
    return jnp.stack(x)


def _trsv_upper_lanes(LT_rows, b):
    """Solve L^T x = b given lower L (m, m, Bv), b (m, Bv)."""
    m = b.shape[0]
    x = [None] * m
    for i in reversed(range(m)):
        s = b[i]
        if i < m - 1:
            # (L^T)[i, k] = L[k, i] for k > i
            suffix = jnp.stack(x[i + 1:]) if m - i - 1 > 1 else x[i + 1][None]
            s = s - jnp.sum(LT_rows[i + 1:, i] * suffix, axis=0)
        x[i] = s / LT_rows[i, i]
    return jnp.stack(x)


def _matmul_T_lanes(A, B_mat):
    """A^T @ B for (k, m, Bv) x (k, n, Bv) -> (m, n, Bv), one reduce."""
    return jnp.sum(A[:, :, None, :] * B_mat[:, None, :, :], axis=0)


def _matvec_T_lanes(A, x):
    """A^T @ x for (k, m, Bv) x (k, Bv) -> (m, Bv), one reduce."""
    return jnp.sum(A * x[:, None, :], axis=0)


def _matvec_lanes(A, x):
    """A @ x for (m, k, Bv) x (k, Bv) -> (m, Bv), one reduce."""
    return jnp.sum(A * x[None, :, :], axis=1)


def block_tridiag_solve_lanes(D, U, b):
    """Solve the block-tridiagonal SPD system A x = b, batch-minor layout.

    Same semantics as ``btridiag.block_tridiag_solve``: D (..., H, m, m),
    U (..., H-1, m, m), b (..., H, m), broadcastable batch dims.  Internally
    transposes to (H, m, m, B) so all block ops are lane-vectorized.
    """
    H, m = b.shape[-2], b.shape[-1]
    batch = jnp.broadcast_shapes(D.shape[:-3], U.shape[:-3], b.shape[:-2])
    Bv = 1
    for s in batch:
        Bv *= s
    D = jnp.broadcast_to(D, batch + (H, m, m)).reshape((Bv, H, m, m))
    U_pad = jnp.concatenate([U, jnp.zeros_like(U[..., :1, :, :])], axis=-3)
    U_pad = jnp.broadcast_to(U_pad, batch + (H, m, m)).reshape((Bv, H, m, m))
    b_flat = jnp.broadcast_to(b, batch + (H, m)).reshape((Bv, H, m))

    # (B, H, m, m) -> (H, m, m, B): batch into the minor (lane) dimension
    Dt = jnp.transpose(D, (1, 2, 3, 0))
    Ut = jnp.transpose(U_pad, (1, 2, 3, 0))
    bt = jnp.transpose(b_flat, (1, 2, 0))
    x = solve_lanes_core(Dt, Ut, bt)                  # (H, m, B)
    return jnp.transpose(x, (2, 0, 1)).reshape(batch + (H, m))


def solve_lanes_core(Dt, Ut, bt):
    """Lane-layout core solve: Dt (H, m, m, B), Ut (H, m, m, B or 1) with the
    last block unused, bt (H, m, B) -> x (H, m, B)."""

    def fwd(carry, inp):
        S_prev, Wy_prev = carry
        D_k, U_k, b_k = inp
        L_k = _chol_lanes(D_k - S_prev)
        y_k = _trsv_lower_lanes(L_k, b_k - Wy_prev)
        W_k = _trsm_lower_lanes(L_k, U_k)
        S_next = _matmul_T_lanes(W_k, W_k)
        Wy_next = _matvec_T_lanes(W_k, y_k)
        # W is NOT stacked — the backward pass recomputes it from (L, U),
        # saving the largest (H, m, m, B) HBM buffer
        return (S_next, Wy_next), (L_k, y_k)

    # initial carries derived from operands (shard_map vma tracking)
    S0 = jnp.zeros_like(Dt[0])
    Wy0 = jnp.zeros_like(bt[0])
    _, (L, y) = jax.lax.scan(fwd, (S0, Wy0), (Dt, Ut, bt), unroll=_SCAN_UNROLL)

    def bwd(x_next, inp):
        L_k, U_k, y_k = inp
        W_k = _trsm_lower_lanes(L_k, U_k)
        rhs = y_k - _matvec_lanes(W_k, x_next)
        x_k = _trsv_upper_lanes(L_k, rhs)
        return x_k, x_k

    x0 = jnp.zeros_like(bt[0])
    _, x_rev = jax.lax.scan(bwd, x0, (L[::-1], Ut[::-1], y[::-1]), unroll=_SCAN_UNROLL)
    return x_rev[::-1]                                # (H, m, B)
