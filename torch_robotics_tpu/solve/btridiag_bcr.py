"""Block cyclic reduction: log-depth block-tridiagonal solve on the VPU.

The lane-vectorized sweep solver (btridiag_lanes) runs 2H sequential scan
stages; at trajectory-optimization sizes (H = 64, m = 14, B = 1k-8k) each
stage is tiny and the solve is dispatch-latency-bound (~85% of the GN step).
Cyclic reduction restructures the solve into log2(H) *levels*: each level
eliminates the odd-indexed blocks of the remaining system IN PARALLEL
(batched over blocks x lanes), halving the system, then back-substitutes in
parallel per level — ~2 log2(H) large stages instead of 2H small ones.

Elimination identities for the symmetric system
(L_i x_{i-1} + D_i x_i + U_i x_{i+1} = b_i, L_i = U_{i-1}^T), odd i = 2k+1:

    A_k = D_i^-1 U_{i-1}^T,  C_k = D_i^-1 U_i,  beta_k = D_i^-1 b_i
    D'_k = D_j - U_{j-1}^T C_{k-1} - U_j A_k          (j = 2k)
    U'_k = -U_j C_k
    b'_k = b_j - U_{j-1}^T beta_{k-1} - U_j beta_k
    back-substitution: x_i = beta_k - A_k x_{j} - C_k x_{j+2}

All block linear algebra reuses the unrolled lane kernels (blocks folded into
the lane axis).  H is padded to a power of two with decoupled identity
blocks.  float32 matmul precision throughout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .btridiag_lanes import _chol_lanes, _trsm_lower_lanes

__all__ = ["block_tridiag_solve_bcr", "solve_lanes_bcr"]


def _mmT_left(A, B):
    """A^T @ B per block: (n, m, m, B) x (n, m, k, B) -> (n, m, k, B)."""
    return jnp.einsum("npib,npjb->nijb", A, B)


def _mm(A, B):
    """A @ B per block: (n, m, m, B) x (n, m, k, B) -> (n, m, k, B)."""
    return jnp.einsum("nipb,npjb->nijb", A, B)


def _mv(A, x):
    """A @ x per block: (n, m, m, B) x (n, m, B) -> (n, m, B)."""
    return jnp.einsum("nipb,npb->nib", A, x)


def _mvT(A, x):
    """A^T @ x per block: (n, m, m, B) x (n, m, B) -> (n, m, B)."""
    return jnp.einsum("npib,npb->nib", A, x)


def _block_solve(D, rhs):
    """Cholesky-solve D X = rhs per block.

    D: (n, m, m, B) SPD; rhs: (n, m, k, B) -> X same shape.
    Blocks fold into the lane axis for the unrolled kernels.
    """
    n, m, _, B = D.shape
    k = rhs.shape[2]
    Dm = jnp.transpose(D, (1, 2, 0, 3)).reshape(m, m, n * B)
    Rm = jnp.transpose(rhs, (1, 2, 0, 3)).reshape(m, k, n * B)
    L = _chol_lanes(Dm)
    Z = _trsm_lower_lanes(L, Rm)
    # L^T X = Z  <=>  solve with the transposed lower factor
    LT = jnp.swapaxes(L, 0, 1)
    X = _trsm_upper(LT, Z)
    return jnp.transpose(X.reshape(m, k, n, B), (2, 0, 1, 3))


def _trsm_upper(Uup, B_mat):
    """Solve Uup X = B with Uup upper-triangular (m, m, K), B (m, k, K)."""
    m = B_mat.shape[0]
    X = [None] * m
    for i in reversed(range(m)):
        s = B_mat[i]
        for j in range(i + 1, m):
            s = s - Uup[i, j][None, :] * X[j]
        X[i] = s / Uup[i, i][None, :]
    return jnp.stack(X)


def solve_lanes_bcr(Dt, Ut, bt):
    """Lane-layout cyclic-reduction solve.

    Dt: (H, m, m, B); Ut: (H, m, m, B or 1), Ut[i] couples block i -> i+1
    (last block unused/zero); bt: (H, m, B) -> x (H, m, B).
    """
    H, m = Dt.shape[0], Dt.shape[1]
    B = Dt.shape[3]
    dtype = Dt.dtype

    # pad to a power of two with decoupled identity blocks
    H2 = 1
    while H2 < H:
        H2 *= 2
    pad = H2 - H
    if pad:
        eye = jnp.broadcast_to(jnp.eye(m, dtype=dtype)[None, ..., None],
                               (pad, m, m, B))
        Dt = jnp.concatenate([Dt, eye], axis=0)
        bt = jnp.concatenate([bt, jnp.zeros((pad, m, B), dtype)], axis=0)
    U = jnp.broadcast_to(Ut, (H, m, m, B))
    if pad:
        # zero the coupling out of the original last block and the pads
        U = jnp.concatenate([U[: H - 1],
                             jnp.zeros((pad + 1, m, m, B), dtype)], axis=0)

    D, b = Dt, bt
    saved = []
    n = H2
    while n > 1:
        D_e, D_o = D[0::2], D[1::2]
        U_e, U_o = U[0::2], U[1::2]
        b_e, b_o = b[0::2], b[1::2]
        n2 = n // 2

        # [A | C | beta] = D_o^{-1} [U_e^T | U_o | b_o]
        rhs = jnp.concatenate(
            [jnp.swapaxes(U_e, 1, 2), U_o, b_o[:, :, None, :]], axis=2)
        sol = _block_solve(D_o, rhs)
        A = sol[:, :, :m, :]
        C = sol[:, :, m:2 * m, :]
        beta = sol[:, :, 2 * m, :]

        # shifted (k-1) odd contributions into even row k (zero for k = 0)
        UoT_C = _mmT_left(U_o, C)                       # U_o[k]^T C[k]
        UoT_beta = _mvT(U_o, beta)
        zero_blk = jnp.zeros_like(UoT_C[:1])
        zero_vec = jnp.zeros_like(UoT_beta[:1])
        D_new = (D_e - jnp.concatenate([zero_blk, UoT_C[:-1]], axis=0)
                 - _mm(U_e, A))
        b_new = (b_e - jnp.concatenate([zero_vec, UoT_beta[:-1]], axis=0)
                 - _mv(U_e, beta))
        U_new = -_mm(U_e, C)
        # last even block must not couple outward
        U_new = jnp.concatenate([U_new[:-1], jnp.zeros_like(U_new[:1])],
                                axis=0)

        saved.append((A, C, beta))
        D, U, b = D_new, U_new, b_new
        n = n2

    # root solve
    x = _block_solve(D, b[:, :, None, :])[:, :, 0, :]   # (1, m, B)

    # back-substitution, coarsest -> finest
    for A, C, beta in reversed(saved):
        n2 = A.shape[0]
        x_e = x                                          # (n2, m, B)
        x_next = jnp.concatenate(
            [x_e[1:], jnp.zeros_like(x_e[:1])], axis=0)  # x_{j+2} per odd k
        x_o = beta - _mv(A, x_e) - _mv(C, x_next)
        x = jnp.stack([x_e, x_o], axis=1).reshape(2 * n2, m, x.shape[-1])

    return x[:H]


def block_tridiag_solve_bcr(D, U, b):
    """Batch-major API matching ``block_tridiag_solve``: D (..., H, m, m),
    U (..., H-1, m, m), b (..., H, m)."""
    H, m = b.shape[-2], b.shape[-1]
    batch = jnp.broadcast_shapes(D.shape[:-3], U.shape[:-3], b.shape[:-2])
    Bv = 1
    for s in batch:
        Bv *= s
    with jax.default_matmul_precision("float32"):
        D = jnp.broadcast_to(D, batch + (H, m, m)).reshape((Bv, H, m, m))
        U_pad = jnp.concatenate([U, jnp.zeros_like(U[..., :1, :, :])],
                                axis=-3)
        U_pad = jnp.broadcast_to(U_pad, batch + (H, m, m)).reshape(
            (Bv, H, m, m))
        b_flat = jnp.broadcast_to(b, batch + (H, m)).reshape((Bv, H, m))
        x = solve_lanes_bcr(jnp.transpose(D, (1, 2, 3, 0)),
                            jnp.transpose(U_pad, (1, 2, 3, 0)),
                            jnp.transpose(b_flat, (1, 2, 0)))
    return jnp.transpose(x, (2, 0, 1)).reshape(batch + (H, m))
