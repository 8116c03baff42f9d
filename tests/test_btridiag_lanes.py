import jax
import jax.numpy as jnp
import numpy as np

from test_solve_btridiag import dense_from_blocks, make_spd_btd
from torch_robotics_tpu.solve.btridiag import block_tridiag_solve
from torch_robotics_tpu.solve.btridiag_lanes import block_tridiag_solve_lanes


def test_lanes_matches_generic():
    H, m = 16, 14
    D, U, b = make_spd_btd(jax.random.PRNGKey(0), H, m, batch=(6,))
    x_gen = block_tridiag_solve(D, U, b)
    x_lanes = block_tridiag_solve_lanes(D, U, b)
    np.testing.assert_allclose(x_lanes, x_gen, rtol=1e-3, atol=1e-4)


def test_lanes_matches_dense():
    H, m = 10, 4
    D, U, b = make_spd_btd(jax.random.PRNGKey(1), H, m)
    x = block_tridiag_solve_lanes(D, U, b)
    A = dense_from_blocks(D, U)
    x_dense = np.linalg.solve(A, np.asarray(b).reshape(-1)).reshape(H, m)
    np.testing.assert_allclose(x, x_dense, rtol=1e-3, atol=1e-4)


def test_lanes_matches_generic_m40():
    # multi-robot-sized blocks (q_dim=20 -> m=40): the reduce-form block ops
    # keep the graph O(m^2) so m=40 is tractable standalone; production
    # still routes m>32 to the tiled solver (_LANES_SOLVE_MAX_M=32 —
    # measured faster end-to-end, see solve/gpmp2.py), this test covers
    # the lanes solver's correctness at large m
    H, m = 8, 40
    D, U, b = make_spd_btd(jax.random.PRNGKey(3), H, m, batch=(3,))
    x_gen = block_tridiag_solve(D, U, b)
    x_lanes = block_tridiag_solve_lanes(D, U, b)
    np.testing.assert_allclose(x_lanes, x_gen, rtol=1e-3, atol=1e-4)


def test_lanes_broadcast_unbatched_DU():
    H, m = 8, 4
    D, U, b = make_spd_btd(jax.random.PRNGKey(2), H, m)
    b_batched = jnp.tile(b, (5, 1, 1)) + jnp.arange(5)[:, None, None] * 0.1
    x = block_tridiag_solve_lanes(D, U, b_batched)
    assert x.shape == (5, H, m)
    x_gen = block_tridiag_solve(D, U, b_batched)
    np.testing.assert_allclose(x, x_gen, rtol=1e-3, atol=1e-4)
