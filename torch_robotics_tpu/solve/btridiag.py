"""Batched block-tridiagonal SPD solver (blocked Cholesky / Thomas).

The Gauss-Newton normal equations of a GPMP2 factor graph over a trajectory
are block-tridiagonal: H diagonal blocks D_t (m x m) coupled by off-diagonal
blocks U_t (m x m, block (t, t+1)).  This module factorizes and solves the
system with a ``lax.scan`` over the horizon — O(H m^3) sequential steps, fully
batched over problems via vmap/broadcasting (thousands of trajectories solve
in parallel on one chip).

This is the TPU-native replacement for the dense 'cholesky' solver mode the
reference's external planners configure (env_spheres_3d.py:66-74): a dense
(H m)^2 factorization would be ~90x more FLOPs at H=64.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve, solve_triangular

__all__ = ["block_tridiag_solve", "block_tridiag_cholesky",
           "block_tridiag_solve_factored", "block_tridiag_logdet"]


def block_tridiag_cholesky(D, U):
    """Blocked LL^T factorization of a block-tridiagonal SPD matrix.

    D: (..., H, m, m) diagonal blocks; U: (..., H-1, m, m) upper off-diagonal
    blocks (block (t, t+1)).  Returns (L_diag (..., H, m, m) lower-triangular
    Cholesky factors of the running Schur complements, L_off (..., H-1, m, m))
    with A = L L^T where L is block-bidiagonal (L_diag on the diagonal,
    L_off below).

    All matmuls trace at float32 precision — the TPU MXU's default bf16
    inputs destroy the factorization of the ill-conditioned GN systems
    (prior precisions up to 1e10).
    """
    with jax.default_matmul_precision("float32"):
        return _block_tridiag_cholesky_impl(D, U)


def _block_tridiag_cholesky_impl(D, U):
    H = D.shape[-3]
    m = D.shape[-1]

    def scan_step(S_prev, inp):
        D_t, U_t = inp
        L_t = jnp.linalg.cholesky(D_t - S_prev)
        # W_t = L_t^{-1} U_t  -> Schur S_next = W_t^T W_t ; L_off_t = W_t^T
        W_t = solve_triangular(L_t, U_t, lower=True)
        S_next = jnp.swapaxes(W_t, -1, -2) @ W_t
        return S_next, (L_t, jnp.swapaxes(W_t, -1, -2))

    # pad U with a zero block so the scan has H inputs (last Schur is unused)
    U_pad = jnp.concatenate([U, jnp.zeros_like(U[..., :1, :, :])], axis=-3)
    batch = D.shape[:-3]

    def per_batch(D_b, U_b):
        # derive the initial carry from the operand so shard_map's
        # varying-axis tracking is satisfied
        S0_b = jnp.zeros_like(D_b[0])
        _, (L_diag, L_off_full) = jax.lax.scan(scan_step, S0_b, (D_b, U_b))
        return L_diag, L_off_full

    flat_D = D.reshape((-1, H, m, m))
    flat_U = U_pad.reshape((-1, H, m, m))
    L_diag, L_off_full = jax.vmap(per_batch)(flat_D, flat_U)
    L_diag = L_diag.reshape(batch + (H, m, m))
    L_off = L_off_full.reshape(batch + (H, m, m))[..., : H - 1, :, :]
    return L_diag, L_off


def block_tridiag_solve_factored(L_diag, L_off, b):
    """Solve A x = b given the blocked factorization from
    ``block_tridiag_cholesky``.  b: (..., H, m) -> x: (..., H, m)."""
    with jax.default_matmul_precision("float32"):
        return _block_tridiag_solve_factored_impl(L_diag, L_off, b)


def _block_tridiag_solve_factored_impl(L_diag, L_off, b):
    H, m = b.shape[-2], b.shape[-1]
    batch = b.shape[:-2]
    L_off_pad = jnp.concatenate(
        [jnp.zeros_like(L_off[..., :1, :, :]), L_off], axis=-3)

    def per_batch(Ld, Lo_pad, b_b):
        # forward: L y = b  (block forward substitution)
        def fwd(y_prev, inp):
            Ld_t, Lo_t, b_t = inp
            rhs = b_t - Lo_t @ y_prev
            y_t = solve_triangular(Ld_t, rhs, lower=True)
            return y_t, y_t

        y0 = jnp.zeros_like(b_b[0])
        _, y = jax.lax.scan(fwd, y0, (Ld, Lo_pad, b_b))

        # backward: L^T x = y
        Lo_next = jnp.concatenate(
            [Lo_pad[1:], jnp.zeros_like(Lo_pad[:1])], axis=0)

        def bwd(x_next, inp):
            Ld_t, Lo_t1, y_t = inp
            rhs = y_t - jnp.swapaxes(Lo_t1, -1, -2) @ x_next
            x_t = solve_triangular(jnp.swapaxes(Ld_t, -1, -2), rhs,
                                   lower=False)
            return x_t, x_t

        x0 = jnp.zeros_like(b_b[0])
        _, x_rev = jax.lax.scan(bwd, x0, (Ld[::-1], Lo_next[::-1], y[::-1]))
        return x_rev[::-1]

    flat = jax.vmap(per_batch)(
        L_diag.reshape((-1,) + L_diag.shape[-3:]),
        L_off_pad.reshape((-1,) + L_off_pad.shape[-3:]),
        b.reshape((-1, H, m)))
    return flat.reshape(batch + (H, m))


def block_tridiag_solve(D, U, b):
    """Solve the block-tridiagonal SPD system A x = b.

    D: (..., H, m, m); U: (..., H-1, m, m); b: (..., H, m).  Leading batch
    dims broadcast (e.g. an unbatched prior Hessian against batched rhs).

    Implementation: fused blocked-Cholesky + forward substitution in ONE
    forward lax.scan (the factorization and L y = b sweeps march together),
    then one backward scan for L^T x = y — two sequential sweeps total, at
    float32 matmul precision.
    """
    H, m = b.shape[-2], b.shape[-1]
    batch = jnp.broadcast_shapes(D.shape[:-3], U.shape[:-3], b.shape[:-2])
    D = jnp.broadcast_to(D, batch + (H, m, m)).reshape((-1, H, m, m))
    U_pad = jnp.concatenate([U, jnp.zeros_like(U[..., :1, :, :])], axis=-3)
    U_pad = jnp.broadcast_to(U_pad, batch + (H, m, m)).reshape((-1, H, m, m))
    b_flat = jnp.broadcast_to(b, batch + (H, m)).reshape((-1, H, m))

    with jax.default_matmul_precision("float32"):
        x_flat = jax.vmap(_fused_solve_one)(D, U_pad, b_flat)
    return x_flat.reshape(batch + (H, m))


def _fused_solve_one(D, U_pad, b):
    """Fused factorize+forward then backward, one problem: D (H, m, m),
    U_pad (H, m, m) (last block unused), b (H, m)."""
    m = b.shape[-1]

    def fwd(carry, inp):
        S_prev, Wy_prev = carry
        D_t, U_t, b_t = inp
        L_t = jnp.linalg.cholesky(D_t - S_prev)
        # forward substitution: y_t = L_t^{-1} (b_t - W_{t-1}^T y_{t-1})
        y_t = solve_triangular(L_t, b_t - Wy_prev, lower=True)
        # W_t = L_t^{-1} U_t feeds both the Schur complement and the next rhs
        W_t = solve_triangular(L_t, U_t, lower=True)
        S_next = jnp.swapaxes(W_t, -1, -2) @ W_t
        Wy_next = jnp.swapaxes(W_t, -1, -2) @ y_t[..., None]
        return (S_next, Wy_next[..., 0]), (L_t, W_t, y_t)

    S0 = jnp.zeros_like(D[0])
    Wy0 = jnp.zeros_like(b[0])
    _, (L, W, y) = jax.lax.scan(fwd, (S0, Wy0), (D, U_pad, b))

    # backward: L^T x = y with x_t = L_t^{-T} (y_t - W_t x_{t+1})
    def bwd(x_next, inp):
        L_t, W_t, y_t = inp
        rhs = y_t - (W_t @ x_next[..., None])[..., 0]
        x_t = solve_triangular(jnp.swapaxes(L_t, -1, -2), rhs, lower=False)
        return x_t, x_t

    x0 = jnp.zeros_like(b[0])
    _, x_rev = jax.lax.scan(bwd, x0, (L[::-1], W[::-1], y[::-1]))
    return x_rev[::-1]


def block_tridiag_logdet(L_diag):
    """log|A| from the blocked Cholesky diagonal factors."""
    diags = jnp.diagonal(L_diag, axis1=-2, axis2=-1)
    return 2.0 * jnp.sum(jnp.log(diags), axis=(-1, -2))
