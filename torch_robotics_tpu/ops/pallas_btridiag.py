"""Pallas TPU kernel: batched block-tridiagonal Cholesky solve, lanes layout.

The XLA lanes solver (solve/btridiag_lanes.py) expresses the sequential
block sweep as a `lax.scan` whose per-step intermediates round-trip through
HBM between fusions; the solve is LATENCY-bound on the Cholesky dependency
chain, not bandwidth or FLOPs.  This kernel keeps the ENTIRE sweep resident
in VMEM per lane-tile: one grid program handles a (H, m, m, TB) slice of
the batch, runs the forward factorization + backward substitution with all
carries/stacks in VMEM scratch, and writes only x back.

Same semantics as solve_lanes_core: D (H, m, m, B), U (H, m, m, 1) with the
last block unused (shared over the batch — the GP prior's off-diagonal
block), b (H, m, B) -> x (H, m, B).  SPD blocks, f32.

VMEM budget per program (TB lanes): D and L stacks are H*m*m*TB*4 bytes
each — at m=14, H=64, TB=128 that is ~6.4 MB apiece, so TB is chosen to
keep D + L + y + x + scratch within ~14 MB.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["solve_lanes_auto", "solve_lanes_pallas", "solve_lanes_pallas_cols",
           "solve_lanes_pallas_factor", "solve_lanes_pallas_subst",
           "solve_lanes_pallas_w",
           "pallas_tile_for_factor"]

import numpy as np


from .pallas_common import out_struct as _out_struct


def _kernel(m: int, H: int, bwd_trsv: bool, D_ref, U_ref, b_ref, x_ref,
            L_ref, y_ref, S_ref, Wy_ref):
    """Forward factorization + backward substitution, all in VMEM.

    Block entries are (TB,) vectors; the small linear algebra is Python-
    unrolled over the static m (same op structure as the proven XLA lanes
    solver, minus the HBM round-trips between steps).

    ``bwd_trsv``: the backward step needs only the VECTOR
    ``W_k x_{k+1} = L_k^{-1} (U_k x_{k+1})`` — a matvec + triangular
    vector solve (~1.5 m^2 ops) — not the full W matrix the trsm
    recomputation builds (~m^3/2 ops).  Same math, different rounding
    association (not bit-identical to the trsm tail).
    """
    S_ref[:] = jnp.zeros_like(S_ref)
    Wy_ref[:] = jnp.zeros_like(Wy_ref)

    def fwd_step(k, _):
        # A = D_k - S  (m, m, TB)
        A = D_ref[k] - S_ref[:]
        b_k = b_ref[k] - Wy_ref[:]
        # Cholesky, row-sequential, entries (TB,)
        L = [[None] * m for _ in range(m)]
        for i in range(m):
            for j in range(i + 1):
                s = A[i, j]
                for t in range(j):
                    s = s - L[i][t] * L[j][t]
                if i == j:
                    L[i][j] = jnp.sqrt(s)
                else:
                    L[i][j] = s * pl.reciprocal(L[j][j], approx=False)
        # y_k = L^{-1} (b_k - Wy)
        y = [None] * m
        for i in range(m):
            s = b_k[i]
            for t in range(i):
                s = s - L[i][t] * y[t]
            y[i] = s * pl.reciprocal(L[i][i], approx=False)
        # W = L^{-1} U_k  (U entries are per-step scalars, shared over TB)
        W = [[None] * m for _ in range(m)]
        for j in range(m):
            for i in range(m):
                s = U_ref[k, i, j] + jnp.zeros_like(A[0, 0])
                for t in range(i):
                    s = s - L[i][t] * W[t][j]
                W[i][j] = s * pl.reciprocal(L[i][i], approx=False)
        # S = W^T W ; Wy = W^T y
        for i in range(m):
            for j in range(m):
                s = W[0][i] * W[0][j]
                for t in range(1, m):
                    s = s + W[t][i] * W[t][j]
                S_ref[i, j] = s
            s = W[0][i] * y[0]
            for t in range(1, m):
                s = s + W[t][i] * y[t]
            Wy_ref[i] = s
        # persist L and y for the backward pass
        for i in range(m):
            y_ref[k, i] = y[i]
            for j in range(i + 1):
                L_ref[k, i, j] = L[i][j]
        return 0

    jax.lax.fori_loop(0, H, fwd_step, 0, unroll=False)

    # backward: x_H-1 = L^{-T} y; x_k = L^{-T} (y_k - W_k x_{k+1})
    def bwd_step(idx, _):
        k = H - 1 - idx
        L = [[L_ref[k, i, j] for j in range(i + 1)] for i in range(m)]
        rhs = [y_ref[k, i] for i in range(m)]

        def inner(rhs):
            x = [None] * m
            for i in reversed(range(m)):
                s = rhs[i]
                for t in range(i + 1, m):
                    s = s - L_ref[k, t, i] * x[t]
                x[i] = s * pl.reciprocal(L[i][i], approx=False)
            for i in range(m):
                x_ref[k, i] = x[i]

        @pl.when(k == H - 1)
        def _():
            inner(rhs)

        if bwd_trsv:
            @pl.when(k < H - 1)
            def _():
                # z = W_k x_{k+1} = L_k^{-1} (U_k x_{k+1}): matvec + trsv
                v = [None] * m
                for i in range(m):
                    s = U_ref[k, i, 0] * x_ref[k + 1, 0]
                    for j in range(1, m):
                        s = s + U_ref[k, i, j] * x_ref[k + 1, j]
                    v[i] = s
                z = [None] * m
                for i in range(m):
                    s = v[i]
                    for t in range(i):
                        s = s - L[i][t] * z[t]
                    z[i] = s * pl.reciprocal(L[i][i], approx=False)
                inner([rhs[i] - z[i] for i in range(m)])
        else:
            @pl.when(k < H - 1)
            def _():
                # W_k = L_k^{-1} U_k recomputed (saves an (H,m,m,TB) stack)
                W = [[None] * m for _ in range(m)]
                for j in range(m):
                    for i in range(m):
                        s = U_ref[k, i, j] + jnp.zeros_like(rhs[0])
                        for t in range(i):
                            s = s - L[i][t] * W[t][j]
                        W[i][j] = s * pl.reciprocal(L[i][i], approx=False)
                rhs2 = []
                for i in range(m):
                    s = rhs[i]
                    for j in range(m):
                        s = s - W[i][j] * x_ref[k + 1, j]
                    rhs2.append(s)
                inner(rhs2)
        return 0

    jax.lax.fori_loop(0, H, bwd_step, 0, unroll=False)


def _kernel_factor(m: int, H: int, D_ref, U_ref, b_ref, x_ref, L_ref, W_ref,
                   y_ref, S_ref, Wy_ref):
    """Forward factorization + backward substitution that PERSISTS the
    factors: L (block Cholesky factors of the condensed diagonals) and
    W = L^{-1} U to output refs, for later substitution-only re-solves
    against fresh right-hand sides (GN factorization reuse, CLAUDE.md
    round-5 A/B: quality-neutral on long batch solves).

    Same math as ``_kernel``; the backward pass reads W back instead of
    recomputing the trsm, so this variant is also slightly cheaper per
    backward step at the cost of the extra (H, m, m, TB) VMEM stack +
    HBM write-back (tile budget: ``pallas_tile_for_factor``)."""
    S_ref[:] = jnp.zeros_like(S_ref)
    Wy_ref[:] = jnp.zeros_like(Wy_ref)
    # L's strict upper triangle is never written below — zero the outputs
    # once so no uninitialized VMEM reaches HBM
    L_ref[:] = jnp.zeros_like(L_ref)

    def fwd_step(k, _):
        A = D_ref[k] - S_ref[:]
        b_k = b_ref[k] - Wy_ref[:]
        L = [[None] * m for _ in range(m)]
        for i in range(m):
            for j in range(i + 1):
                s = A[i, j]
                for t in range(j):
                    s = s - L[i][t] * L[j][t]
                if i == j:
                    L[i][j] = jnp.sqrt(s)
                else:
                    L[i][j] = s * pl.reciprocal(L[j][j], approx=False)
        y = [None] * m
        for i in range(m):
            s = b_k[i]
            for t in range(i):
                s = s - L[i][t] * y[t]
            y[i] = s * pl.reciprocal(L[i][i], approx=False)
        W = [[None] * m for _ in range(m)]
        for j in range(m):
            for i in range(m):
                s = U_ref[k, i, j] + jnp.zeros_like(A[0, 0])
                for t in range(i):
                    s = s - L[i][t] * W[t][j]
                W[i][j] = s * pl.reciprocal(L[i][i], approx=False)
        for i in range(m):
            for j in range(m):
                s = W[0][i] * W[0][j]
                for t in range(1, m):
                    s = s + W[t][i] * W[t][j]
                S_ref[i, j] = s
            s = W[0][i] * y[0]
            for t in range(1, m):
                s = s + W[t][i] * y[t]
            Wy_ref[i] = s
        for i in range(m):
            y_ref[k, i] = y[i]
            for j in range(i + 1):
                L_ref[k, i, j] = L[i][j]
            for j in range(m):
                W_ref[k, i, j] = W[i][j]
        return 0

    jax.lax.fori_loop(0, H, fwd_step, 0, unroll=False)
    _bwd_subst_loop(m, H, L_ref, W_ref, y_ref, x_ref)


def _bwd_subst_loop(m, H, L_ref, W_ref, y_ref, x_ref):
    """Backward substitution from persisted factors:
    x_{H-1} = L^{-T} y; x_k = L^{-T} (y_k - W_k x_{k+1})."""
    def bwd_step(idx, _):
        k = H - 1 - idx

        def inner(rhs):
            x = [None] * m
            for i in reversed(range(m)):
                s = rhs[i]
                for t in range(i + 1, m):
                    s = s - L_ref[k, t, i] * x[t]
                x[i] = s * pl.reciprocal(L_ref[k, i, i], approx=False)
            for i in range(m):
                x_ref[k, i] = x[i]

        @pl.when(k == H - 1)
        def _():
            inner([y_ref[k, i] for i in range(m)])

        @pl.when(k < H - 1)
        def _():
            rhs2 = []
            for i in range(m):
                s = y_ref[k, i]
                for j in range(m):
                    s = s - W_ref[k, i, j] * x_ref[k + 1, j]
                rhs2.append(s)
            inner(rhs2)
        return 0

    jax.lax.fori_loop(0, H, bwd_step, 0, unroll=False)


def _kernel_subst(m: int, H: int, L_ref, W_ref, b_ref, x_ref, y_ref,
                  Wy_ref):
    """Substitution-only re-solve against persisted factors (L, W) with a
    FRESH right-hand side b — ~3m^2 equations per block step vs ~1.7m^3
    for the full factorizing sweep (m=14: ~590 vs ~4,700); the sweep is
    issue-bound on its dependent-op chain so the op-count ratio is the
    speedup lever (GN factorization reuse, refactor-every-k)."""
    Wy_ref[:] = jnp.zeros_like(Wy_ref)

    def fwd_step(k, _):
        b_k = b_ref[k] - Wy_ref[:]
        y = [None] * m
        for i in range(m):
            s = b_k[i]
            for t in range(i):
                s = s - L_ref[k, i, t] * y[t]
            y[i] = s * pl.reciprocal(L_ref[k, i, i], approx=False)
        for i in range(m):
            s = W_ref[k, 0, i] * y[0]
            for t in range(1, m):
                s = s + W_ref[k, t, i] * y[t]
            Wy_ref[i] = s
            y_ref[k, i] = y[i]
        return 0

    jax.lax.fori_loop(0, H, fwd_step, 0, unroll=False)
    _bwd_subst_loop(m, H, L_ref, W_ref, y_ref, x_ref)


def pallas_tile_for_factor(H: int, m: int, B: int):
    """Lane tile for the factor-persisting sweep, or None.

    Four (H, m, m, tb) matrix stacks live per program (D in, L + W out,
    plus pipeline buffering) instead of the plain sweep's three."""
    if jax.default_backend() != "tpu":
        return None
    for tb in (512, 256, 128):
        if B % tb:
            continue
        vmem = (4 * m * m * H + 4 * m * H + 2 * m * m) * tb * 4
        if vmem <= 88 * 1024 * 1024:
            return tb
    return None


@partial(jax.jit, static_argnames=("tile_b", "interpret"))
def solve_lanes_pallas_w(D, U, b, tile_b: int = 256,
                         interpret: bool = False):
    """Plain-contract solve with a VMEM W stack (round 5 default sweep).

    Same contract as ``solve_lanes_pallas`` (x only), but runs the
    ``_kernel_factor`` body with L and W in SCRATCH: the backward pass
    reads W back instead of re-running the per-step trsm
    (~m^3/2 equations), which the chained micro measured at 1.446 ->
    1.164 ms/solve at the bench shapes EVEN when paying the factor
    variant's HBM write-back — this variant keeps the stacks on-chip.
    Costs one more (H, m, m, tb) VMEM stack, so the tile budget is
    ``pallas_tile_for_factor`` (256 at bench shapes vs the 3-stack 512)."""
    H, m, _, B = D.shape
    assert B % tile_b == 0, (B, tile_b)
    U3 = U[..., 0]

    kernel = partial(_kernel_factor, m, H)
    grid = (B // tile_b,)
    x = pl.pallas_call(
        kernel,
        out_shape=_out_struct((H, m, B), D.dtype, D, U3, b),
        grid=grid,
        in_specs=[
            pl.BlockSpec((H, m, m, tile_b), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, m, m), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, m, tile_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((H, m, tile_b), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H, m, m, tile_b), D.dtype),   # L stack
            pltpu.VMEM((H, m, m, tile_b), D.dtype),   # W stack
            pltpu.VMEM((H, m, tile_b), D.dtype),      # y stack
            pltpu.VMEM((m, m, tile_b), D.dtype),      # S carry
            pltpu.VMEM((m, tile_b), D.dtype),         # Wy carry
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(D, U3, b)
    return x


@partial(jax.jit, static_argnames=("tile_b", "interpret"))
def solve_lanes_pallas_factor(D, U, b, tile_b: int = 256,
                              interpret: bool = False):
    """Factor-persisting lane-layout block-tridiagonal SPD solve.

    Same contract as ``solve_lanes_pallas`` plus factor outputs:
    D (H, m, m, B), U (H, m, m, 1) shared over the batch, b (H, m, B)
    -> (x (H, m, B), L (H, m, m, B), W (H, m, m, B)).  Feed (L, W) to
    ``solve_lanes_pallas_subst`` to re-solve with fresh b at ~10% of the
    sweep's equations."""
    H, m, _, B = D.shape
    assert B % tile_b == 0, (B, tile_b)
    U3 = U[..., 0]

    kernel = partial(_kernel_factor, m, H)
    grid = (B // tile_b,)
    x, L, W = pl.pallas_call(
        kernel,
        out_shape=(
            _out_struct((H, m, B), D.dtype, D, U3, b),
            _out_struct((H, m, m, B), D.dtype, D, U3, b),
            _out_struct((H, m, m, B), D.dtype, D, U3, b),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((H, m, m, tile_b), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, m, m), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, m, tile_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((H, m, tile_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, m, m, tile_b), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, m, m, tile_b), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((H, m, tile_b), D.dtype),      # y stack
            pltpu.VMEM((m, m, tile_b), D.dtype),      # S carry
            pltpu.VMEM((m, tile_b), D.dtype),         # Wy carry
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(D, U3, b)
    return x, L, W


@partial(jax.jit, static_argnames=("tile_b", "interpret"))
def solve_lanes_pallas_subst(L, W, b, tile_b: int = 256,
                             interpret: bool = False):
    """Substitution-only solve from persisted factors.

    L, W (H, m, m, B) from ``solve_lanes_pallas_factor``, b (H, m, B)
    fresh right-hand side -> x (H, m, B) solving the ORIGINAL system with
    the new b."""
    H, m, _, B = L.shape
    assert B % tile_b == 0, (B, tile_b)

    kernel = partial(_kernel_subst, m, H)
    grid = (B // tile_b,)
    x = pl.pallas_call(
        kernel,
        out_shape=_out_struct((H, m, B), L.dtype, L, W, b),
        grid=grid,
        in_specs=[
            pl.BlockSpec((H, m, m, tile_b), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, m, m, tile_b), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, m, tile_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((H, m, tile_b), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H, m, tile_b), L.dtype),      # y stack
            pltpu.VMEM((m, tile_b), L.dtype),         # Wy carry
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(L, W, b)
    return x


def _kernel_cols(m: int, H: int, bwd_trsv: bool, D_ref, U_ref, b_ref, x_ref,
                 L_ref, y_ref, S_ref, Wy_ref):
    """Column-vectorized VMEM sweep for LARGE block sizes (m > ~16).

    The scalar-unrolled ``_kernel`` costs O(m^3) jaxpr equations — ~110k at
    m=40, which the Mosaic compiler cannot digest (the XLA BCR at m=40
    already failed to compile, CLAUDE.md).  This variant expresses every
    block op as O(m) ARRAY ops on (m, TB) / (m, m, TB) VMEM slices:
    right-looking (rank-1 Schur update) Cholesky, right-looking forward /
    backward substitution — ~6m equations per forward step (~600 at m=40).
    Arithmetic is the classic right-looking factorization; masked column
    extraction keeps rows < j exactly zero so no garbage propagates into
    the updates.
    """
    # row masks built in-kernel (captured jnp constants are not allowed):
    # masks[j] zeroes rows < j of a column slice
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    masks = [(row_ids >= j).astype(D_ref.dtype) for j in range(m)]

    S_ref[:] = jnp.zeros_like(S_ref)
    Wy_ref[:] = jnp.zeros_like(Wy_ref)

    def _chol_cols(A):
        """Right-looking Cholesky of (m, m, TB); returns (columns, inv-diag)."""
        cols, invs = [], []
        for j in range(m):
            dj = jnp.sqrt(A[j, j])
            inv = pl.reciprocal(dj, approx=False)
            col = A[:, j] * inv * masks[j]          # (m, TB); row j = dj
            A = A - col[:, None, :] * col[None, :, :]
            cols.append(col)
            invs.append(inv)
        return cols, invs

    def _trsv(cols, invs, c):
        """L y = c with L given as columns; c (m, TB)."""
        ys = []
        for i in range(m):
            yi = c[i] * invs[i]
            ys.append(yi)
            c = c - cols[i] * yi[None, :]
        return ys

    def _trsm(cols, invs, X):
        """L W = X with X (m, m, TB); returns W rows."""
        rows = []
        for i in range(m):
            wi = X[i] * invs[i]
            rows.append(wi)
            X = X - cols[i][:, None, :] * wi[None, :, :]
        return rows

    ones_tb = jnp.ones_like(b_ref[0, 0])            # (TB,)

    def fwd_step(k, _):
        A = D_ref[k] - S_ref[:]
        cols, invs = _chol_cols(A)
        ys = _trsv(cols, invs, b_ref[k] - Wy_ref[:])
        X0 = U_ref[k][:, :, None] * ones_tb          # (m, m, TB)
        w_rows = _trsm(cols, invs, X0)
        S = w_rows[0][:, None, :] * w_rows[0][None, :, :]
        Wy = w_rows[0] * ys[0][None, :]
        for t in range(1, m):
            S = S + w_rows[t][:, None, :] * w_rows[t][None, :, :]
            Wy = Wy + w_rows[t] * ys[t][None, :]
        S_ref[:] = S
        Wy_ref[:] = Wy
        L_ref[k] = jnp.stack(cols, axis=1)           # L[i, j] = cols[j][i]
        y_ref[k] = jnp.stack(ys)
        return 0

    jax.lax.fori_loop(0, H, fwd_step, 0, unroll=False)

    def bwd_step(idx, _):
        k = H - 1 - idx
        L = L_ref[k]                                  # (m, m, TB)
        cols = [L[:, j] for j in range(m)]
        invs = [pl.reciprocal(L[j, j], approx=False) for j in range(m)]

        def backsub(rhs):
            # L^T x = rhs; after x_i is known, rhs_j -= L[i, j] x_i (j < i)
            xs = [None] * m
            c = rhs
            for i in reversed(range(m)):
                xi = c[i] * invs[i]
                xs[i] = xi
                c = c - L[i] * xi[None, :]
            x_ref[k] = jnp.stack(xs)

        @pl.when(k == H - 1)
        def _():
            backsub(y_ref[k])

        if bwd_trsv:
            @pl.when(k < H - 1)
            def _():
                # z = W_k x_{k+1} = L_k^{-1} (U_k x_{k+1}): matvec + trsv on
                # (m, TB) slices instead of the trsm's m (m, m, TB) updates
                xk1 = x_ref[k + 1]                    # (m, TB)
                Uk = U_ref[k]                         # (m, m)
                v = Uk[:, 0:1] * xk1[0:1, :]
                for j in range(1, m):
                    v = v + Uk[:, j:j + 1] * xk1[j:j + 1, :]
                zs = _trsv(cols, invs, v)
                backsub(y_ref[k] - jnp.stack(zs))
        else:
            @pl.when(k < H - 1)
            def _():
                X0 = U_ref[k][:, :, None] * ones_tb
                w_rows = _trsm(cols, invs, X0)
                W = jnp.stack(w_rows)                 # (m, m, TB)
                rhs = y_ref[k] - jnp.sum(W * x_ref[k + 1][None, :, :],
                                         axis=1)
                backsub(rhs)
        return 0

    jax.lax.fori_loop(0, H, bwd_step, 0, unroll=False)


@partial(jax.jit, static_argnames=("tile_b", "interpret", "bwd_trsv"))
def solve_lanes_pallas_cols(D, U, b, tile_b: int = 128,
                            interpret: bool = False,
                            bwd_trsv: bool = False):
    """Large-m lane-layout block-tridiagonal SPD solve (column kernel).

    Same contract as ``solve_lanes_pallas``; use for m > ~16 where the
    scalar-unrolled body would explode.  Measured at the config-4 shapes
    (H=32, m=40, B=256): see benchmarks/btridiag_micro.py.
    """
    H, m, _, B = D.shape
    assert B % tile_b == 0, (B, tile_b)
    U3 = U[..., 0]

    kernel = partial(_kernel_cols, m, H, bwd_trsv)
    grid = (B // tile_b,)
    x = pl.pallas_call(
        kernel,
        out_shape=_out_struct((H, m, B), D.dtype, D, U3, b),
        grid=grid,
        in_specs=[
            pl.BlockSpec((H, m, m, tile_b), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, m, m), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, m, tile_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((H, m, tile_b), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H, m, m, tile_b), D.dtype),   # L stack
            pltpu.VMEM((H, m, tile_b), D.dtype),      # y stack
            pltpu.VMEM((m, m, tile_b), D.dtype),      # S carry
            pltpu.VMEM((m, tile_b), D.dtype),         # Wy carry
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(D, U3, b)
    return x


# m at or below which the scalar-unrolled kernel is used (proven at the
# m=14 bench shapes); above it the column kernel keeps the body compact
_SCALAR_KERNEL_MAX_M = 16


def pallas_tile_for(H: int, m: int, B: int):
    """Lane tile the Pallas sweep would use at these shapes, or None.

    Budget: D block (+ its pipeline double-buffer) + L stack + y/b/x
    stacks + S/W scratch within the 100 MB scoped-VMEM limit.
    """
    if jax.default_backend() != "tpu":
        return None
    for tb in (512, 256, 128):
        if B % tb:
            continue
        vmem = (3 * m * m * H + 3 * m * H + 3 * m * m) * tb * 4
        if vmem <= 88 * 1024 * 1024:
            return tb
    return None


def solve_lanes_auto(D, U, b):
    """Dispatch to the Pallas VMEM sweep when profitable, else the XLA
    lanes solver.

    Pallas requires: TPU backend, a lane tile of >=128 dividing B, and the
    resident stacks fitting the scoped-VMEM budget.  Measured at the bench
    shapes (H=64, m=14, B=1024): 1.33 vs 2.04 ms/solve (tile_b=512).
    Batches that are not a 128 multiple are EDGE-padded onto the kernel
    (padded lanes repeat the last real problem — a well-conditioned real
    solve, no synthetic pivots; zero-padding D would put sqrt(0)/indefinite
    blocks there), then sliced back; the TPU pads partial lane tiles
    anyway, so this beats falling back to the HBM-round-tripping XLA scan.
    """
    from ..solve.btridiag_lanes import solve_lanes_core
    H, m, _, B = D.shape
    B_pad = -(-B // 128) * 128
    if B_pad != B and U.shape[-1] == 1 and jax.default_backend() == "tpu":
        pad = [(0, 0)] * 3 + [(0, B_pad - B)]
        return solve_lanes_auto(jnp.pad(D, pad, mode="edge"), U,
                                jnp.pad(b, pad[1:], mode="edge"))[..., :B]
    # the Pallas kernels read U as (H, m, m) shared scalars — per-batch
    # off-diagonal blocks (B > 1) would silently use batch 0's U
    if U.shape[-1] == 1:
        if m <= _SCALAR_KERNEL_MAX_M:
            # prefer the W-persisting sweep (backward pass reads the VMEM
            # W stack instead of re-running the per-step trsm): 1.252 vs
            # 1.322 ms at the bench shapes, interleaved min-of-6 chained
            # timing (/tmp wstack micro, 2026-08-20); bit-exact
            tb_w = pallas_tile_for_factor(H, m, B)
            if tb_w is not None:
                return solve_lanes_pallas_w(D, U, b, tile_b=tb_w)
        tb = pallas_tile_for(H, m, B)
        if tb is not None:
            if m <= _SCALAR_KERNEL_MAX_M:
                return solve_lanes_pallas(D, U, b, tile_b=tb)
            # trsv backward tail: 1.51-1.53 vs 1.60-1.67 ms/solve at the
            # config-4 shapes, consistent over three interleaved runs
            # (benchmarks/btridiag_trsv_ab.py)
            return solve_lanes_pallas_cols(D, U, b, tile_b=tb,
                                           bwd_trsv=True)
    return solve_lanes_core(D, U, b)


@partial(jax.jit, static_argnames=("tile_b", "interpret", "bwd_trsv"))
def solve_lanes_pallas(D, U, b, tile_b: int = 128, interpret: bool = False,
                       bwd_trsv: bool = False):
    """Lane-layout block-tridiagonal SPD solve on a Pallas VMEM sweep.

    D (H, m, m, B), U (H, m, m, 1) (last block unused), b (H, m, B)
    -> x (H, m, B).  B must be a multiple of ``tile_b``.
    """
    H, m, _, B = D.shape
    assert B % tile_b == 0, (B, tile_b)
    U3 = U[..., 0]                                  # (H, m, m) shared scalars

    kernel = partial(_kernel, m, H, bwd_trsv)
    grid = (B // tile_b,)
    x = pl.pallas_call(
        kernel,
        out_shape=_out_struct((H, m, B), D.dtype, D, U3, b),
        grid=grid,
        in_specs=[
            pl.BlockSpec((H, m, m, tile_b), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, m, m), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, m, tile_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((H, m, tile_b), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H, m, m, tile_b), D.dtype),   # L stack
            pltpu.VMEM((H, m, tile_b), D.dtype),      # y stack
            pltpu.VMEM((m, m, tile_b), D.dtype),      # S carry
            pltpu.VMEM((m, tile_b), D.dtype),         # Wy carry
        ],
        # D block + its pipeline double-buffer + the L stack exceed the
        # 16 MB default scoped-vmem limit at tile_b=128; v5e has headroom
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(D, U3, b)
    return x


def _kernel_bcr(m: int, H: int, D_ref, U_ref, b_ref, x_ref):
    """Block CYCLIC REDUCTION, log2(H) wide levels instead of H narrow steps.

    The sweep kernels above are ISSUE/latency-bound: each of the H
    sequential steps runs ~O(m^3) dependent ops on (TB,)-wide vectors
    (measured ~10 us/step at m=14, ~5x the bandwidth bound).  Cyclic
    reduction eliminates the odd blocks of each level IN PARALLEL — the
    same unrolled block algebra runs on (n_blocks, ..., TB)-wide arrays,
    so the dependent-op count drops from H*O(m^3) to 2*log2(H)*O(m^2-ish)
    wide ops.  Math mirrors solve/btridiag_bcr.py (elimination identities
    in its module docstring); everything lives as VMEM values across the
    unrolled levels.  Requires H a power of two (wrapper pads) and the
    shared-U case (U (H, m, m), the GP prior's off-diagonal).

    MEASURED NEGATIVE RESULT at the bench shapes (H=64, m=14, B=1024,
    2026-08-19): 1.78 ms/solve at tile_b=128 vs 1.35 for the sweep kernel
    — the per-level solve chains (m dependent Cholesky columns + 2m
    substitution steps, ~2x for fwd+bwd per level) do not shrink with
    level width, VMEM forces tile 128 (the value working set at tile 256
    is ~109 MB), and the ~12k-op body costs a 17-minute Mosaic compile.
    Kept (correct: parity 3e-7 incl. 1e8-precision GN systems) but NOT
    wired into solve_lanes_auto; the sweep kernel remains the production
    path.  Mosaic porting notes: stride-2 slicing and any integer index
    on a >=3-D value lower to gathers (use reshape-pairs / index_in_dim),
    middle-axis reductions are unsupported (unroll to multiply-add
    chains), zero-size slices are invalid vector types (guard the n==2
    level).
    """
    dtype = D_ref.dtype
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)

    def _ix(a, axis, i):
        """Static integer index as a pure slice (jnp integer indexing on
        >=3-D values lowers to a gather Mosaic rejects)."""
        return jax.lax.index_in_dim(a, i, axis, keepdims=False)

    D = D_ref[...]                                     # (H, m, m, TB)
    b = b_ref[...]                                     # (H, m, TB)
    TB = b.shape[-1]
    U = U_ref[...][..., None]                          # (H, m, m, 1) shared

    def chol_cols(A):
        """Right-looking Cholesky of (n, m, m, TB) -> (columns, inv-diags,
        stacked L).  Masked column extraction keeps rows < j exactly zero
        (same structure as _kernel_cols, stable on the GN systems)."""
        cols, invs = [], []
        for j in range(m):
            inv = pl.reciprocal(jnp.sqrt(_ix(_ix(A, 1, j), 1, j)), approx=False)
            mask = (row_ids >= j).astype(dtype)[None]  # (1, m, 1)
            col = _ix(A, 2, j) * inv[:, None, :] * mask
            A = A - col[:, :, None, :] * col[:, None, :, :]
            cols.append(col)
            invs.append(inv)
        return cols, invs, jnp.stack(cols, axis=2)     # L[:, i, j]=cols[j][i]

    def solve_spd(A, X):
        """A^-1 X per block: A (n, m, m, TB) SPD, X (n, m, k, TB).

        Right-looking forward/backward substitution; each update touches
        ALL rows in one wide op — cols[i] (masked) / Lm row i carry zeros
        where no update belongs, and the solved row's self-cancellation is
        harmless (its value is already captured in ``rows``/``ys``)."""
        cols, invs, Lm = chol_cols(A)
        rows = []
        for i in range(m):                             # L W = X
            wi = _ix(X, 1, i) * invs[i][:, None, :]
            rows.append(wi)
            X = X - cols[i][:, :, None, :] * wi[:, None, :, :]
        W = jnp.stack(rows, axis=1)
        ys = [None] * m
        for i in reversed(range(m)):                   # L^T Y = W
            yi = _ix(W, 1, i) * invs[i][:, None, :]
            ys[i] = yi
            W = W - _ix(Lm, 1, i)[:, :, None, :] * yi[:, None, :, :]
        return jnp.stack(ys, axis=1)

    def mm(A_, B_, transpose_a=False):
        """Per-block matmul unrolled into multiply-add chains — Mosaic has
        no multi_reduction over a middle axis: (n, m, m, TB) x
        (n, m, k, TB) -> (n, m, k, TB)."""
        B_rows = [_ix(B_, 1, p) for p in range(m)]     # each (n, k, TB)
        rows = []
        for i in range(m):
            a_i = _ix(A_, 2, i) if transpose_a else _ix(A_, 1, i)
            acc = None
            for p in range(m):
                t = _ix(a_i, 1, p)[:, None, :] * B_rows[p]
                acc = t if acc is None else acc + t
            rows.append(acc)
        return jnp.stack(rows, axis=1)

    def mv(A_, x_, transpose_a=False):
        x_rows = [_ix(x_, 1, p) for p in range(m)]     # each (n, TB)
        rows = []
        for i in range(m):
            a_i = _ix(A_, 2, i) if transpose_a else _ix(A_, 1, i)
            acc = None
            for p in range(m):
                t = _ix(a_i, 1, p) * x_rows[p]
                acc = t if acc is None else acc + t
            rows.append(acc)
        return jnp.stack(rows, axis=1)

    saved = []
    n = H
    while n > 1:
        # stride-2 slicing lowers to a (>2D) gather Mosaic rejects; a
        # leading-dim reshape + unit slice is layout-preserving instead
        Dp = D.reshape((n // 2, 2) + D.shape[1:])
        Up = U.reshape((n // 2, 2) + U.shape[1:])
        bp = b.reshape((n // 2, 2) + b.shape[1:])
        D_e, D_o = _ix(Dp, 1, 0), _ix(Dp, 1, 1)
        U_e, U_o = _ix(Up, 1, 0), _ix(Up, 1, 1)
        b_e, b_o = _ix(bp, 1, 0), _ix(bp, 1, 1)

        ones = jnp.ones((1, 1, 1, TB), dtype)
        rhs = jnp.concatenate(
            [jnp.swapaxes(U_e, 1, 2) * ones, U_o * ones,
             b_o[:, :, None, :]], axis=2)              # (n/2, m, 2m+1, TB)
        sol = solve_spd(D_o, rhs)
        A_f = sol[:, :, :m]
        C_f = sol[:, :, m:2 * m]
        beta = _ix(sol, 2, 2 * m)

        UoT_C = mm(U_o, C_f, transpose_a=True)
        UoT_beta = mv(U_o, beta, transpose_a=True)
        zb = jnp.zeros_like(UoT_C[:1])
        zv = jnp.zeros_like(UoT_beta[:1])
        # zero-size slices are invalid Mosaic vector types: guard n == 2
        shift_C = (jnp.concatenate([zb, UoT_C[:-1]], axis=0)
                   if n > 2 else zb)
        shift_b = (jnp.concatenate([zv, UoT_beta[:-1]], axis=0)
                   if n > 2 else zv)
        D = D_e - shift_C - mm(U_e, A_f)
        b = b_e - shift_b - mv(U_e, beta)
        U_new = -mm(U_e, C_f)
        U = (jnp.concatenate([U_new[:-1], jnp.zeros_like(U_new[:1])], axis=0)
             if n > 2 else jnp.zeros_like(U_new))
        saved.append((A_f, C_f, beta))
        n //= 2

    x = _ix(solve_spd(D, b[:, :, None, :]), 2, 0)      # (1, m, TB)

    for A_f, C_f, beta in reversed(saved):
        n2 = A_f.shape[0]
        x_next = (jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], axis=0)
                  if n2 > 1 else jnp.zeros_like(x))
        x_o = beta - mv(A_f, x) - mv(C_f, x_next)
        x = jnp.stack([x, x_o], axis=1).reshape(2 * n2, m, TB)

    x_ref[...] = x


@partial(jax.jit, static_argnames=("tile_b", "interpret"))
def solve_lanes_pallas_bcr(D, U, b, tile_b: int = 256,
                           interpret: bool = False):
    """Cyclic-reduction block-tridiagonal SPD solve, one Pallas kernel.

    D (H, m, m, B), U (H, m, m, 1) shared over the batch (last block
    unused), b (H, m, B) -> x (H, m, B).  H is padded to a power of two
    with decoupled identity blocks; B must be a multiple of ``tile_b``.
    """
    H, m, _, B = D.shape
    assert B % tile_b == 0, (B, tile_b)
    assert U.shape[-1] == 1, "BCR kernel requires the shared-U case"
    H2 = 1
    while H2 < H:
        H2 *= 2
    pad = H2 - H
    U3 = U[..., 0]                                     # (H, m, m)
    if pad:
        eye = jnp.broadcast_to(jnp.eye(m, dtype=D.dtype)[None, :, :, None],
                               (pad, m, m, B))
        D = jnp.concatenate([D, eye], axis=0)
        b = jnp.concatenate([b, jnp.zeros((pad, m, B), D.dtype)], axis=0)
        # zero the coupling out of the original last block and the pads
        U3 = jnp.concatenate(
            [U3[: H - 1], jnp.zeros((pad + 1, m, m), D.dtype)], axis=0)
    else:
        U3 = jnp.concatenate([U3[: H - 1], jnp.zeros((1, m, m), D.dtype)],
                             axis=0)

    x = pl.pallas_call(
        partial(_kernel_bcr, m, H2),
        out_shape=_out_struct((H2, m, B), D.dtype, D, U, b),
        grid=(B // tile_b,),
        in_specs=[
            pl.BlockSpec((H2, m, m, tile_b), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H2, m, m), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H2, m, tile_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((H2, m, tile_b), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(D, U3, b)
    return x[:H]
