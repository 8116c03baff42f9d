import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_solve_btridiag import dense_from_blocks, make_spd_btd
from torch_robotics_tpu.solve.btridiag import block_tridiag_solve
from torch_robotics_tpu.solve.btridiag_bcr import block_tridiag_solve_bcr


@pytest.mark.parametrize("H,m", [(8, 4), (16, 14), (13, 3)])
def test_bcr_matches_dense(H, m):
    D, U, b = make_spd_btd(jax.random.PRNGKey(0), H, m)
    x = block_tridiag_solve_bcr(D, U, b)
    A = dense_from_blocks(D, U)
    x_dense = np.linalg.solve(A, np.asarray(b).reshape(-1)).reshape(H, m)
    np.testing.assert_allclose(x, x_dense, rtol=1e-3, atol=1e-4)


def test_bcr_batched_matches_sweep():
    H, m = 32, 14
    D, U, b = make_spd_btd(jax.random.PRNGKey(1), H, m, batch=(6,))
    x_bcr = block_tridiag_solve_bcr(D, U, b)
    x_sweep = block_tridiag_solve(D, U, b)
    np.testing.assert_allclose(x_bcr, x_sweep, rtol=1e-3, atol=1e-4)


def test_bcr_ill_conditioned_gp_system():
    """The realistic GPMP2 system: prior precisions up to 1e10 (sigma 1e-5).

    BCR squares condition numbers at each level; this guards the accuracy on
    the actual solver workload in f32.
    """
    from torch_robotics_tpu.solve.gp_prior import gp_prior_blocks
    H, d = 64, 7
    m = 2 * d
    D, U = gp_prior_blocks(d, H, dt=0.04, sigma_start=1e-5, sigma_gp=1e-2,
                           sigma_goal=1e-5)
    D = D + 1e-2 * jnp.eye(m)
    key = jax.random.PRNGKey(2)
    b = jax.random.normal(key, (4, H, m)) * 1e3
    x_bcr = block_tridiag_solve_bcr(D, U, b)
    x_sweep = block_tridiag_solve(D, U, b)
    assert bool(jnp.isfinite(x_bcr).all())
    # compare residuals ||A x - b|| rather than x (both are f32-approximate)
    def residual(x):
        Ax = jnp.einsum("hij,bhj->bhi", D, x)
        Ax = Ax.at[:, :-1].add(jnp.einsum("hij,bhj->bhi", U, x[:, 1:]))
        Ax = Ax.at[:, 1:].add(jnp.einsum("hji,bhj->bhi", U, x[:, :-1]))
        return jnp.linalg.norm(Ax - b) / jnp.linalg.norm(b)

    r_bcr = float(residual(x_bcr))
    r_sweep = float(residual(x_sweep))
    assert r_bcr < max(10 * r_sweep, 1e-3), (r_bcr, r_sweep)
