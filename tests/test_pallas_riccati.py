"""Parity of the Pallas square-root Riccati sweep kernel against an
independent batched jnp.linalg.qr reference (the ilqr.py "qr" mode form —
different algorithm, same math; triangular-solve outputs are invariant to
QR row-sign conventions)."""
import jax
import jax.numpy as jnp
import numpy as np

from torch_robotics_tpu.ops.pallas_riccati import (
    riccati_backward_pallas_factory)


def _qr_reference(d, m, P, T, dt, r, mu, kg, U_t, l_t, F_t, Vx0):
    """U_t (T, B, d), l_t (T, B, m), F_t (T, B, P, m), Vx0 (B, m)."""
    B = Vx0.shape[0]
    dtype = Vx0.dtype
    eye_d = jnp.eye(d, dtype=dtype)
    Phi = jnp.block([[jnp.eye(d), dt * jnp.eye(d)],
                     [jnp.zeros((d, d)), jnp.eye(d)]]).astype(dtype)
    Bm = jnp.concatenate([0.5 * dt * dt * jnp.eye(d, dtype=dtype),
                          dt * jnp.eye(d, dtype=dtype)], axis=0)
    sqrt_ru = (r + mu) ** 0.5
    top = jnp.broadcast_to(
        jnp.concatenate([sqrt_ru * eye_d, jnp.zeros((d, m), dtype)],
                        axis=-1), (B, d, d + m))
    zeros_Pd = jnp.zeros((B, P, d), dtype)
    S = jnp.broadcast_to((kg ** 0.5) * jnp.eye(m, dtype=dtype), (B, m, m))
    Vx = Vx0
    ks, Ks = [], []
    for t in range(T - 1, -1, -1):
        A = jnp.concatenate([
            top,
            jnp.concatenate([S @ Bm, S @ Phi], axis=-1),
            jnp.concatenate([zeros_Pd, F_t[t]], axis=-1)], axis=-2)
        R = jnp.linalg.qr(A, mode="r")
        R11, R12 = R[:, :d, :d], R[:, :d, d:]
        S = R[:, d:, d:]
        Qx = l_t[t] + Vx @ Phi
        Qu = r * U_t[t] + Vx @ Bm
        w = jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(R11, -1, -2), Qu[..., None], lower=True)
        k = -jax.scipy.linalg.solve_triangular(R11, w, lower=False)[..., 0]
        K = -jax.scipy.linalg.solve_triangular(R11, R12, lower=False)
        Vx = Qx + jnp.einsum("bdm,bd->bm", R12,
                             (R11 @ k[..., None])[..., 0])
        ks.append(k)
        Ks.append(K)
    ks = jnp.stack(ks[::-1])                                  # (T, B, d)
    Ks = jnp.stack(Ks[::-1])                                  # (T, B, d, m)
    return ks, Ks


def test_riccati_pallas_matches_qr_reference_interpret():
    d, m, P, T, B = 3, 6, 5, 6, 16
    dt, r, mu, kg = 0.04, 1e-4, 1e-6, 1e4
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    U_t = jax.random.normal(k1, (T, B, d))
    l_t = jax.random.normal(k2, (T, B, m))
    F_t = jax.random.normal(k3, (T, B, P, m))
    Vx0 = jax.random.normal(k4, (B, m))

    ks_ref, Ks_ref = _qr_reference(d, m, P, T, dt, r, mu, kg,
                                   U_t, l_t, F_t, Vx0)

    sweep = riccati_backward_pallas_factory(d, m, P, T, dt, r, mu, kg)
    U_l = jnp.transpose(U_t, (0, 2, 1))                       # (T, d, B)
    l_l = jnp.transpose(l_t, (0, 2, 1))                       # (T, m, B)
    Fc_l = jnp.transpose(F_t, (0, 3, 2, 1))               # (T, m, P, B)
    ks_p, Ks_p = sweep(U_l, l_l, Fc_l, Vx0.T, tile_b=8, interpret=True)

    # f32 across two different factorizations (Householder chains vs
    # jnp.linalg.qr): tight relative agreement except on near-zero gain
    # entries, which get an absolute floor
    np.testing.assert_allclose(np.asarray(jnp.transpose(ks_p, (0, 2, 1))),
                               np.asarray(ks_ref), rtol=2e-4, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(Ks_p, (0, 3, 1, 2))),
        np.asarray(Ks_ref), rtol=2e-4, atol=1e-3)


def test_ilqr_riccati_pallas_mode_falls_back_on_cpu():
    """riccati="pallas" must dispatch to the XLA lanes sweep on the CPU
    test backend and match riccati="lanes" bitwise there."""
    from torch_robotics_tpu.solve.ilqr import ILQRParams, ilqr_solve

    def residuals(q):
        return jnp.tanh(q) * 0.1

    B, d = 4, 2
    key = jax.random.PRNGKey(1)
    x0 = jnp.concatenate([jax.random.normal(key, (B, d)),
                          jnp.zeros((B, d))], -1)
    goal = jnp.zeros((B, 2 * d))
    base = dict(n_support_points=8, dt=0.05, opt_iters=4, sigma_coll=1e-1,
                sigma_goal_prior=1e-2)
    r_lanes = ilqr_solve(residuals, x0, goal,
                         ILQRParams(riccati="lanes", **base))
    r_pal = ilqr_solve(residuals, x0, goal,
                       ILQRParams(riccati="pallas", **base))
    np.testing.assert_array_equal(np.asarray(r_lanes.trajs),
                                  np.asarray(r_pal.trajs))


def test_rollout_pallas_matches_xla_interpret():
    """Fused A-alpha closed-loop rollout parity vs the plain XLA scan."""
    from torch_robotics_tpu.ops.pallas_riccati import (
        linesearch_rollout_pallas_factory)
    d, m, T, B = 3, 6, 7, 16
    dt = 0.05
    alphas = (1.0, 0.5, 0.1)
    key = jax.random.PRNGKey(2)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    xs_l = jax.random.normal(k1, (T + 1, m, B))
    U_l = jax.random.normal(k2, (T, d, B))
    ks = jax.random.normal(k3, (T, d, B))
    Ks = jax.random.normal(k4, (T, d, m, B)) * 0.1

    def xla_rollout(alpha):
        def step(x, inp):
            x_ref, u_ref, k, K = inp
            dx = x - x_ref
            u = u_ref + alpha * k + jnp.sum(K * dx[None], axis=1)
            x_next = jnp.concatenate(
                [x[:d] + dt * x[d:] + 0.5 * dt * dt * u,
                 x[d:] + dt * u], axis=0)
            return x_next, (x_next, u)
        _, (xs_new, U_new) = jax.lax.scan(
            step, xs_l[0], (xs_l[:-1], U_l, ks, Ks))
        return xs_new, U_new

    xs_ref, U_ref = jax.vmap(xla_rollout)(jnp.asarray(alphas))
    roll = linesearch_rollout_pallas_factory(d, m, T, dt, alphas)
    xs_p, U_p = roll(xs_l, U_l, ks, Ks, tile_b=8, interpret=True)
    np.testing.assert_allclose(np.asarray(xs_p), np.asarray(xs_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(U_p), np.asarray(U_ref),
                               rtol=1e-5, atol=1e-5)
