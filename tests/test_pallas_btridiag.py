import jax
import jax.numpy as jnp
import numpy as np

from test_solve_btridiag import make_spd_btd
from torch_robotics_tpu.ops.pallas_btridiag import (solve_lanes_auto,
                                                    solve_lanes_pallas,
                                                    solve_lanes_pallas_cols)
from torch_robotics_tpu.solve.btridiag_lanes import solve_lanes_core


def _lanes_inputs(key, H, m, B):
    D, _, b = make_spd_btd(key, H, m, batch=(B,))
    Dt = jnp.transpose(D, (1, 2, 3, 0))
    # shared off-diagonal blocks (the GP-prior structure the kernel assumes;
    # solve_lanes_core broadcasts the trailing batch dim of 1 identically)
    U_shared = jax.random.normal(jax.random.fold_in(key, 7),
                                 (H, m, m)) * 0.2
    Ut = U_shared[:, :, :, None]
    bt = jnp.transpose(b, (1, 2, 0))
    return Dt, Ut, bt


def test_pallas_solve_matches_lanes_core_interpret():
    """Interpret-mode kernel parity with the XLA lanes solver (the on-chip
    kernel is compared in /tmp benchmarks; max err 3e-7 at bench shapes)."""
    H, m, B = 8, 6, 256
    Dt, Ut, bt = _lanes_inputs(jax.random.PRNGKey(0), H, m, B)
    x_ref = solve_lanes_core(Dt, Ut, bt)
    x_p = solve_lanes_pallas(Dt, Ut, bt, tile_b=128, interpret=True)
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_cols_matches_lanes_core_interpret():
    """Column-kernel (large-m) parity with the XLA lanes solver — the
    production m=40 path (on-chip numbers + GN-scale conditioning in
    benchmarks/solver_m40_ab.py: 1.59 vs 41.2 ms/solve, residual 2e-7)."""
    for H, m, B in [(6, 9, 256), (4, 40, 128)]:
        Dt, Ut, bt = _lanes_inputs(jax.random.PRNGKey(2), H, m, B)
        x_ref = solve_lanes_core(Dt, Ut, bt)
        x_p = solve_lanes_pallas_cols(Dt, Ut, bt, tile_b=128, interpret=True)
        np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_ref),
                                   rtol=1e-4, atol=1e-5)


def test_solve_lanes_auto_cpu_falls_back():
    # on the CPU test backend the dispatcher must take the XLA path
    H, m, B = 6, 4, 128
    Dt, Ut, bt = _lanes_inputs(jax.random.PRNGKey(1), H, m, B)
    x_auto = solve_lanes_auto(Dt, Ut, bt)
    x_ref = solve_lanes_core(Dt, Ut, bt)
    np.testing.assert_allclose(np.asarray(x_auto), np.asarray(x_ref),
                               rtol=1e-5, atol=1e-6)


def test_pallas_bcr_matches_lanes_core_interpret():
    """Cyclic-reduction kernel parity (incl. non-power-of-two H padding).

    A kept NEGATIVE perf result — 1.78 vs 1.35 ms at the bench shapes, see
    its docstring — but the math must stay correct."""
    from torch_robotics_tpu.ops.pallas_btridiag import solve_lanes_pallas_bcr
    for H, m, B in [(8, 4, 128), (6, 5, 128)]:
        Dt, Ut, bt = _lanes_inputs(jax.random.PRNGKey(4), H, m, B)
        x_ref = solve_lanes_core(Dt, Ut, bt)
        x_p = solve_lanes_pallas_bcr(Dt, Ut, bt, tile_b=128, interpret=True)
        np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_ref),
                                   rtol=1e-4, atol=1e-5)


def test_pallas_factor_subst_interpret():
    """Factor-persisting sweep + substitution-only re-solve (GN
    factorization reuse, round 5): factor's x matches the XLA lanes
    solver; subst against a FRESH rhs matches solving the ORIGINAL system
    with that rhs."""
    from torch_robotics_tpu.ops.pallas_btridiag import (
        solve_lanes_pallas_factor, solve_lanes_pallas_subst)
    H, m, B = 8, 6, 256
    key = jax.random.PRNGKey(5)
    Dt, Ut, bt = _lanes_inputs(key, H, m, B)
    b2 = bt + jax.random.normal(jax.random.fold_in(key, 9), bt.shape)

    x, L, W = solve_lanes_pallas_factor(Dt, Ut, bt, tile_b=128,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(x),
                               np.asarray(solve_lanes_core(Dt, Ut, bt)),
                               rtol=1e-4, atol=1e-5)
    x2 = solve_lanes_pallas_subst(L, W, b2, tile_b=128, interpret=True)
    np.testing.assert_allclose(np.asarray(x2),
                               np.asarray(solve_lanes_core(Dt, Ut, b2)),
                               rtol=1e-4, atol=1e-5)


def test_pallas_w_matches_lanes_core_interpret():
    """W-persisting sweep (round-5 default on TPU via solve_lanes_auto:
    the backward pass reads the VMEM W stack instead of re-running the
    per-step trsm; 1.252 vs 1.322 ms at bench shapes) — parity with the
    XLA lanes solver."""
    from torch_robotics_tpu.ops.pallas_btridiag import solve_lanes_pallas_w
    H, m, B = 8, 6, 256
    Dt, Ut, bt = _lanes_inputs(jax.random.PRNGKey(6), H, m, B)
    x_ref = solve_lanes_core(Dt, Ut, bt)
    x_w = solve_lanes_pallas_w(Dt, Ut, bt, tile_b=128, interpret=True)
    np.testing.assert_allclose(np.asarray(x_w), np.asarray(x_ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_trsv_backward_matches_lanes_core_interpret():
    """trsv backward tail (matvec + triangular vector solve instead of the
    full W trsm recompute) parity for BOTH kernel families — the round-5
    default tails on TPU (A/B: benchmarks/btridiag_trsv_ab.py)."""
    H, m, B = 8, 6, 256
    Dt, Ut, bt = _lanes_inputs(jax.random.PRNGKey(6), H, m, B)
    x_ref = solve_lanes_core(Dt, Ut, bt)
    x_p = solve_lanes_pallas(Dt, Ut, bt, tile_b=128, interpret=True,
                             bwd_trsv=True)
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_ref),
                               rtol=1e-4, atol=1e-5)
    H, m, B = 4, 40, 128
    Dt, Ut, bt = _lanes_inputs(jax.random.PRNGKey(7), H, m, B)
    x_ref = solve_lanes_core(Dt, Ut, bt)
    x_p = solve_lanes_pallas_cols(Dt, Ut, bt, tile_b=128, interpret=True,
                                  bwd_trsv=True)
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_ref),
                               rtol=1e-4, atol=1e-5)
