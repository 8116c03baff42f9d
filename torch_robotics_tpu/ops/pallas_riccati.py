"""Pallas TPU kernel: square-root Riccati backward sweep, VMEM-resident.

The iLQR lanes backward pass (solve/ilqr.py backward_lanes) runs the
two-phase Householder square-root recursion as an XLA ``lax.scan`` whose
per-step intermediates (the S factor, the shrinking reflection workspaces)
round-trip HBM between steps — the same structure the block-tridiagonal
sweep kernels eliminated (ops/pallas_btridiag.py).  This kernel runs the
WHOLE reverse sweep for a lane tile inside one ``pallas_call``: the value
gradient Vx (m, TB) and the factor S (m, m, TB) live in VMEM scratch, the
per-step (d + m + P, d + m) stacked-array QR is Python-unrolled at trace
time into (TB,)-entry chains (S/M/G as scalar entries, CLAUDE.md lesson 2)
with the P residual-factor rows kept as (P, TB) ARRAY slices (one vector
op per reduce over the factor rows, lesson 12b(e)).

Math identical to ``backward_lanes`` (same reflections, same block-sparsity
exploitation: F-rows are zero in the u-columns, the top block's pivot is
the constant sqrt(r+mu), S@Phi / S@B are elementwise in the
double-integrator structure).  Not bit-identical (different accumulation
association), parity ~1e-5 relative on the gains.

Layouts (time-major lanes):
  U_t_l (T, d, B), l_l (T, m, B), Fc_l (T, m, P, B)  [F COLUMN-major:
  Fc_l[t, c] are the P factor-row entries of column c], Vx0 (m, B)
  -> ks (T, d, B), Ks (T, d, m, B).
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["riccati_backward_pallas_factory", "riccati_pallas_tile_for",
           "linesearch_rollout_pallas_factory", "rollout_pallas_tile_for"]


def _kernel(d: int, m: int, P: int, T: int, dt: float, r: float,
            sqrt_ru: float, sqrt_kg: float,
            U_ref, l_ref, F_ref, Vx0_ref, ks_ref, Ks_ref, Vx_ref, S_ref):
    dtype = U_ref.dtype

    Vx_ref[:] = Vx0_ref[:]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)).astype(dtype)
    S_ref[:] = jnp.broadcast_to(sqrt_kg * eye[:, :, None], S_ref.shape)

    def step(idx, _):
        t = T - 1 - idx
        Vx = [Vx_ref[i] for i in range(m)]               # (TB,) entries
        S = [[S_ref[i, j] for j in range(m)] for i in range(m)]
        u = [U_ref[t, j] for j in range(d)]
        l_x = [l_ref[t, i] for i in range(m)]
        F_c = [F_ref[t, c] for c in range(m)]            # (P, TB) per column

        # S @ B and S @ Phi columns (double-integrator structure)
        G = [[0.5 * dt * dt * S[i][j] + dt * S[i][j + d] for j in range(d)]
             for i in range(m)]
        M = [[S[i][j] if j < d else dt * S[i][j - d] + S[i][j]
              for j in range(m)] for i in range(m)]

        # phase 1: d reflections over the u-block columns.  F-rows are zero
        # in these columns; top-block row j has the constant pivot sqrt_ru.
        R11 = [[None] * d for _ in range(d)]
        R12 = [[None] * m for _ in range(d)]
        for j in range(d):
            g = [G[i][j] for i in range(m)]
            gg = g[0] * g[0]
            for i in range(1, m):
                gg = gg + g[i] * g[i]
            alpha = -jnp.sqrt(sqrt_ru * sqrt_ru + gg)
            v0 = sqrt_ru - alpha                          # > 0 always
            beta = 2.0 / (v0 * v0 + gg)
            for c in range(m):
                w = g[0] * M[0][c]
                for i in range(1, m):
                    w = w + g[i] * M[i][c]
                R12[j][c] = -(beta * v0) * w
                bw = beta * w
                for i in range(m):
                    M[i][c] = M[i][c] - bw * g[i]
            R11[j][j] = alpha
            for c in range(j + 1, d):
                w = g[0] * G[0][c]
                for i in range(1, m):
                    w = w + g[i] * G[i][c]
                R11[j][c] = -(beta * v0) * w
                bw = beta * w
                for i in range(m):
                    G[i][c] = G[i][c] - bw * g[i]

        # phase 2: m reflections triangularize [M; F] -> S_next.
        # Rows < j of M are stale after reflection j (never read again).
        S_new = [[None] * m for _ in range(m)]
        for j in range(m):
            head = M[j][j]
            rest2 = jnp.sum(F_c[j] * F_c[j], axis=0)
            for i in range(j + 1, m):
                rest2 = rest2 + M[i][j] * M[i][j]
            norm = jnp.sqrt(head * head + rest2)
            alpha = -jnp.where(head >= 0, 1.0, -1.0).astype(dtype) * norm
            v0 = head - alpha
            vtv = v0 * v0 + rest2
            beta = jnp.where(vtv > 0,
                             2.0 / jnp.where(vtv > 0, vtv, 1.0), 0.0)
            S_new[j][j] = alpha
            for c in range(j + 1, m):
                w = v0 * M[j][c] + jnp.sum(F_c[j] * F_c[c], axis=0)
                for i in range(j + 1, m):
                    w = w + M[i][j] * M[i][c]
                bw = beta * w
                S_new[j][c] = M[j][c] - bw * v0
                for i in range(j + 1, m):
                    M[i][c] = M[i][c] - bw * M[i][j]
                F_c[c] = F_c[c] - bw[None] * F_c[j]

        # Qx = l_x + Phi^T Vx, Qu = r u + B^T Vx (elementwise structure)
        Qx = [l_x[i] + Vx[i] if i < d
              else l_x[i] + dt * Vx[i - d] + Vx[i] for i in range(m)]
        Qu = [r * u[j] + 0.5 * dt * dt * Vx[j] + dt * Vx[j + d]
              for j in range(d)]

        # w = R11^{-T} Qu (forward subst), k = -R11^{-1} w (back subst)
        inv11 = [pl.reciprocal(R11[i][i], approx=False) for i in range(d)]
        w_rows = []
        for i in range(d):
            acc = Qu[i]
            for l2 in range(i):
                acc = acc - R11[l2][i] * w_rows[l2]
            w_rows.append(acc * inv11[i])
        k = [None] * d
        for i in range(d - 1, -1, -1):
            acc = -w_rows[i]
            for l2 in range(i + 1, d):
                acc = acc - R11[i][l2] * k[l2]
            k[i] = acc * inv11[i]
        # K = -R11^{-1} R12 (back substitution, m RHS columns)
        K = [[None] * m for _ in range(d)]
        for i in range(d - 1, -1, -1):
            for c in range(m):
                acc = -R12[i][c]
                for l2 in range(i + 1, d):
                    acc = acc - R11[i][l2] * K[l2][c]
                K[i][c] = acc * inv11[i]
        # Vx_next = Qx + Qux^T k = Qx + R12^T (R11 k)
        y = [None] * d
        for i in range(d):
            y_i = R11[i][i] * k[i]
            for l2 in range(i + 1, d):
                y_i = y_i + R11[i][l2] * k[l2]
            y[i] = y_i
        for c in range(m):
            acc = Qx[c]
            for i in range(d):
                acc = acc + R12[i][c] * y[i]
            Vx_ref[c] = acc
        for i in range(m):
            for j in range(m):
                S_ref[i, j] = S_new[i][j] if j >= i else jnp.zeros_like(
                    S_new[0][0])
        for j in range(d):
            ks_ref[t, j] = k[j]
            for c in range(m):
                Ks_ref[t, j, c] = K[j][c]
        return 0

    jax.lax.fori_loop(0, T, step, 0, unroll=False)


def riccati_pallas_tile_for(d: int, m: int, P: int, T: int, B: int):
    """Lane tile for the Riccati sweep kernel, or None (dispatch guard)."""
    if jax.default_backend() != "tpu":
        return None
    for tb in (512, 256, 128):
        if B % tb:
            continue
        # F stack (+ pipeline buffer) dominates; Ks output + S/Vx scratch
        vmem = (2 * T * m * P + 2 * T * d * m + 2 * T * (d + m)
                + 2 * m * m) * tb * 4
        if vmem <= 88 * 1024 * 1024:
            return tb
    return None


def riccati_backward_pallas_factory(d: int, m: int, P: int, T: int,
                                    dt: float, r: float, mu: float,
                                    kg: float):
    """Build the jitted sweep fn for static (d, m, P, T) and weights.

    Returns fn(U_t_l (T, d, B), l_l (T, m, B), Fc_l (T, m, P, B),
    Vx0 (m, B), tile_b, interpret) -> (ks (T, d, B), Ks (T, d, m, B)).
    """
    sqrt_ru = (r + mu) ** 0.5
    sqrt_kg = kg ** 0.5
    kernel = partial(_kernel, d, m, P, T, dt, r, sqrt_ru, sqrt_kg)

    @partial(jax.jit, static_argnames=("tile_b", "interpret"))
    def sweep(U_t_l, l_l, Fc_l, Vx0, tile_b: int = 256,
              interpret: bool = False):
        B = U_t_l.shape[-1]
        assert B % tile_b == 0, (B, tile_b)
        grid = (B // tile_b,)
        # out_shape carries the operands' vma so shard_map callers see
        # correctly-varying outputs (CLAUDE.md lesson in ffd1809)
        from .pallas_common import out_struct as _out_struct
        ops = (U_t_l, l_l, Fc_l, Vx0)
        ks, Ks = pl.pallas_call(
            kernel,
            out_shape=[_out_struct((T, d, B), U_t_l.dtype, *ops),
                       _out_struct((T, d, m, B), U_t_l.dtype, *ops)],
            grid=grid,
            in_specs=[
                pl.BlockSpec((T, d, tile_b), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, m, tile_b), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, m, P, tile_b), lambda i: (0, 0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m, tile_b), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((T, d, tile_b), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, d, m, tile_b), lambda i: (0, 0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((m, tile_b), U_t_l.dtype),      # Vx carry
                pltpu.VMEM((m, m, tile_b), U_t_l.dtype),   # S carry
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(U_t_l, l_l, Fc_l, Vx0)
        return ks, Ks

    return sweep


def _rollout_kernel(d: int, m: int, T: int, A: int, dt: float,
                    alphas: tuple,
                    xs_ref, U_ref, ks_ref, Ks_ref, xs_out, U_out):
    """A-alpha closed-loop rollout, all alphas in one VMEM pass.

    x_a(0) = xs[0] for every alpha; per step t:
      u_a = U[t] + alpha_a k[t] + K[t] (x_a - xs[t]);  x_a step via the
    double-integrator structure.  The XLA form is a 31-step lax.scan
    vmapped over alphas whose per-step work is ~100 elementwise ops — scan
    overhead and HBM round-trips of the carried states dominate it."""

    x0 = xs_ref[0]                                       # (m, TB)
    x_all = jnp.broadcast_to(x0[None], (A,) + x0.shape)  # (A, m, TB)

    def step(t, x_all):
        x_ref_t = [xs_ref[t, i] for i in range(m)]
        K = [[Ks_ref[t, j, c] for c in range(m)] for j in range(d)]
        u_base = [U_ref[t, j] for j in range(d)]
        k_t = [ks_ref[t, j] for j in range(d)]
        nxt = []
        for a in range(A):
            xa = [x_all[a, i] for i in range(m)]
            dx = [xa[i] - x_ref_t[i] for i in range(m)]
            u = []
            for j in range(d):
                acc = u_base[j] + alphas[a] * k_t[j]
                for c in range(m):
                    acc = acc + K[j][c] * dx[c]
                u.append(acc)
            x_next = ([xa[i] + dt * xa[i + d] + 0.5 * dt * dt * u[i]
                       for i in range(d)]
                      + [xa[i + d] + dt * u[i] for i in range(d)])
            xs_out[a, t] = jnp.stack(x_next)
            U_out[a, t] = jnp.stack(u)
            nxt.append(jnp.stack(x_next))
        return jnp.stack(nxt)

    jax.lax.fori_loop(0, T, step, x_all, unroll=False)


def rollout_pallas_tile_for(d: int, m: int, A: int, T: int, B: int):
    if jax.default_backend() != "tpu":
        return None
    for tb in (512, 256, 128):
        if B % tb:
            continue
        vmem = (2 * T * (m + d + d * m) + 2 * A * T * (m + d)
                + A * m) * tb * 4
        if vmem <= 88 * 1024 * 1024:
            return tb
    return None


def linesearch_rollout_pallas_factory(d: int, m: int, T: int, dt: float,
                                      alphas: tuple):
    """fn(xs_l (H, m, B), U_t_l (T, d, B), ks (T, d, B), Ks (T, d, m, B))
    -> (xs_new (A, T, m, B), U_new (A, T, d, B)) — the states AFTER step 0
    (the caller prepends the shared initial state row)."""
    A = len(alphas)
    kernel = partial(_rollout_kernel, d, m, T, A, dt, tuple(alphas))

    @partial(jax.jit, static_argnames=("tile_b", "interpret"))
    def rollout(xs_l, U_t_l, ks, Ks, tile_b: int = 256,
                interpret: bool = False):
        B = U_t_l.shape[-1]
        assert B % tile_b == 0, (B, tile_b)
        from .pallas_common import out_struct as _out_struct
        ops = (xs_l, U_t_l, ks, Ks)
        H = xs_l.shape[0]
        xs_new, U_new = pl.pallas_call(
            kernel,
            out_shape=[_out_struct((A, T, m, B), xs_l.dtype, *ops),
                       _out_struct((A, T, d, B), xs_l.dtype, *ops)],
            grid=(B // tile_b,),
            in_specs=[
                pl.BlockSpec((H, m, tile_b), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, d, tile_b), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, d, tile_b), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, d, m, tile_b), lambda i: (0, 0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((A, T, m, tile_b), lambda i: (0, 0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((A, T, d, tile_b), lambda i: (0, 0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(xs_l, U_t_l, ks, Ks)
        return xs_new, U_new

    return rollout
