import jax
import jax.numpy as jnp
import numpy as np

from torch_robotics_tpu.solve import (
    block_tridiag_cholesky, block_tridiag_logdet, block_tridiag_solve,
    gp_Q_inv, gp_prior_terms, gp_transition, straight_line_trajs,
)


def make_spd_btd(key, H, m, batch=()):
    """Random SPD block-tridiagonal system + dense equivalent."""
    k1, k2, k3 = jax.random.split(key, 3)
    A_half = jax.random.normal(k1, batch + (H, m, m)) * 0.3
    D = (A_half @ jnp.swapaxes(A_half, -1, -2)
         + 3.0 * jnp.eye(m))                      # diagonally dominant SPD
    U = jax.random.normal(k2, batch + (H - 1, m, m)) * 0.2
    b = jax.random.normal(k3, batch + (H, m))
    return D, U, b


def dense_from_blocks(D, U):
    H, m = D.shape[0], D.shape[-1]
    A = np.zeros((H * m, H * m), np.float64)
    for t in range(H):
        A[t * m:(t + 1) * m, t * m:(t + 1) * m] = np.asarray(D[t])
        if t < H - 1:
            A[t * m:(t + 1) * m, (t + 1) * m:(t + 2) * m] = np.asarray(U[t])
            A[(t + 1) * m:(t + 2) * m, t * m:(t + 1) * m] = np.asarray(U[t]).T
    return A


def test_block_tridiag_solve_matches_dense():
    H, m = 12, 4
    D, U, b = make_spd_btd(jax.random.PRNGKey(0), H, m)
    x = block_tridiag_solve(D, U, b)
    A = dense_from_blocks(D, U)
    x_dense = np.linalg.solve(A, np.asarray(b).reshape(-1)).reshape(H, m)
    np.testing.assert_allclose(x, x_dense, rtol=1e-3, atol=1e-4)


def test_block_tridiag_solve_batched():
    H, m = 8, 3
    D, U, b = make_spd_btd(jax.random.PRNGKey(1), H, m, batch=(5,))
    x = block_tridiag_solve(D, U, b)
    assert x.shape == (5, H, m)
    for i in range(5):
        A = dense_from_blocks(D[i], U[i])
        x_dense = np.linalg.solve(A, np.asarray(b[i]).reshape(-1)).reshape(H, m)
        np.testing.assert_allclose(x[i], x_dense, rtol=1e-3, atol=1e-4)


def test_block_tridiag_logdet():
    H, m = 6, 3
    D, U, _ = make_spd_btd(jax.random.PRNGKey(2), H, m)
    L_diag, _ = block_tridiag_cholesky(D, U)
    ld = block_tridiag_logdet(L_diag)
    A = dense_from_blocks(D, U)
    np.testing.assert_allclose(ld, np.linalg.slogdet(A)[1], rtol=1e-4)


def test_gp_transition_and_Qinv():
    Phi = gp_transition(2, 0.1)
    np.testing.assert_allclose(
        Phi, [[1, 0, 0.1, 0], [0, 1, 0, 0.1], [0, 0, 1, 0], [0, 0, 0, 1]],
        atol=1e-7)
    Qi = gp_Q_inv(1, 0.5, 2.0)
    # closed form: qc_inv = 1/4
    np.testing.assert_allclose(
        Qi, [[12 / 0.125 / 4, -6 / 0.25 / 4], [-6 / 0.25 / 4, 4 / 0.5 / 4]],
        rtol=1e-6)


def test_gp_prior_terms_is_gradient_of_quadratic():
    """g must equal the autodiff gradient of the GP factor-graph energy, and
    (D, U) its (constant) Hessian blocks."""
    H, d = 6, 2
    m = 2 * d
    key = jax.random.PRNGKey(3)
    theta = jax.random.normal(key, (H, m))
    start = jnp.zeros(m)
    goal = jnp.ones(m)
    dt, ss, sg, sgoal = 0.1, 0.01, 0.3, 0.02

    Phi = gp_transition(d, dt)
    Qi = gp_Q_inv(d, dt, sg)

    def energy(th):
        e = th[1:] - th[:-1] @ Phi.T
        E = 0.5 * jnp.einsum("ti,ij,tj->", e, Qi, e)
        E += 0.5 / ss ** 2 * jnp.sum(jnp.square(th[0] - start))
        E += 0.5 / sgoal ** 2 * jnp.sum(jnp.square(th[-1] - goal))
        return E

    g, D, U = gp_prior_terms(theta, start, goal, dt, ss, sg, sgoal)
    g_auto = jax.grad(energy)(theta)
    np.testing.assert_allclose(g, g_auto, rtol=1e-3, atol=1e-3)

    H_auto = jax.hessian(energy)(theta).reshape(H * m, H * m)
    A = dense_from_blocks(D, U)
    np.testing.assert_allclose(A, H_auto, rtol=1e-3, atol=1e-2)


def test_straight_line_trajs():
    start = jnp.array([0.0, 0.0, 0.0, 0.0])
    goal = jnp.array([1.0, 2.0, 0.0, 0.0])
    th = straight_line_trajs(start, goal, 11)
    assert th.shape == (11, 4)
    np.testing.assert_allclose(th[0, :2], [0, 0], atol=1e-6)
    np.testing.assert_allclose(th[-1, :2], [1, 2], atol=1e-6)
    np.testing.assert_allclose(th[5, :2], [0.5, 1.0], atol=1e-6)


def test_gp_bridge_mean_and_exact_sampler():
    """Conditioned-GP bridge: mean pins endpoint states (zero velocities),
    and exact samples carry prior-scale GP energy (the retired Brownian
    finite-difference heuristic carried ~1e8 at these shapes)."""
    from torch_robotics_tpu.solve.gp_prior import (
        gp_bridge_mean, gp_bridge_sampler_matrix)

    d, H, dt, sig = 2, 32, 0.04, 0.1
    start = jnp.array([-0.5, -0.5, 0.0, 0.0])
    goal = jnp.array([0.5, 0.7, 0.0, 0.0])
    mu = gp_bridge_mean(start, goal, H, dt, sig)
    np.testing.assert_allclose(np.asarray(mu[0]), np.asarray(start),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(mu[-1]), np.asarray(goal),
                               atol=1e-4)
    # POSITION transition residuals of the mean are tiny (a*dt^2/2 for the
    # bridge's deterministic acceleration a ~ 3 rad/s^2); velocity
    # residuals equal a*dt by construction — that's the acceleration the
    # prior's process noise models, not an inconsistency
    Phi = gp_transition(d, dt, mu.dtype)
    e = mu[1:] - mu[:-1] @ Phi.T
    assert float(jnp.abs(e[:, :d]).max()) < 5e-3

    # sample energy: E[eps^T P eps] = n; measure against the same precision
    M = gp_bridge_sampler_matrix(d, H, dt, sig)
    n = H * 2 * d
    xi = jax.random.normal(jax.random.PRNGKey(0), (512, n))
    eps = xi @ M.T
    Qi = gp_Q_inv(d, dt, sig, mu.dtype)
    seq = eps.reshape(512, H, 2 * d)
    e = seq[:, 1:] - seq[:, :-1] @ Phi.T
    energy = jnp.einsum("bti,ij,btj->b", e, Qi, e)
    mean_E = float(energy.mean())
    # transition part of E[eps^T P eps] is n minus the endpoint-prior share
    assert 0.5 * n < mean_E < 1.5 * n, mean_E
    # endpoints pinned to the 1e-5 prior
    assert float(jnp.abs(seq[:, 0]).max()) < 1e-3
    assert float(jnp.abs(seq[:, -1]).max()) < 1e-3
