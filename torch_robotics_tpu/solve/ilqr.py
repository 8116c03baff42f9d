"""Batched iLQR trajectory optimizer on constant-velocity dynamics.

The iLQR variant of the solver engine (the reference ships no optimizers at
all — its envs only carry hyperparameters for external planners, e.g.
/root/reference/torch_robotics/environments/env_dense_2d.py:93-121).  Where
GPMP2 (solve/gpmp2.py) treats the trajectory as a factor graph and solves the
joint block-tridiagonal system, iLQR keeps the trajectory *dynamically
feasible by construction*: states x_t = [q_t, qd_t] follow the
double-integrator x_{t+1} = Phi x_t + B u_t exactly (u = joint acceleration),
and the optimizer runs a Riccati backward pass + rolled-out forward pass.

TPU-native shape: batch-first — states carry (B, ...) everywhere (no
outer vmap), both sweeps are `lax.scan`s over the horizon with batched
(m, m) linear algebra, every residual/Jacobian evaluation is ONE
lanes-path call over the flattened (B*(H-1), d) state batch, and the line
search evaluates all step sizes in one batched rollout picking the argmin
PER problem — no data-dependent control flow, jits end-to-end.

Cost model matches GPMP2's factors so presets transfer: hinge obstacle
residuals (sigma_coll), control effort (R approx the GP process-noise
penalty), terminal goal prior (sigma_goal_prior).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["ILQRParams", "ILQRResult", "ilqr_solve"]


@dataclasses.dataclass(frozen=True)
class ILQRParams:
    n_support_points: int = 64
    dt: float = 0.04
    opt_iters: int = 50
    sigma_coll: float = 1e-2
    sigma_goal_prior: float = 1e-2
    # running goal-POSITION cost (receding-horizon regulation): 0.0 disables.
    # With terminal-only goal cost an MPC loop executing the first control
    # of each plan never contracts — "always H steps left to arrive" leaves
    # the immediate motion unconstrained; a small running pull toward the
    # goal position makes the loop contractive.  Position-only: including
    # velocity in the pull damps motion itself and slows convergence
    # (A/B'd: state-pull sigma=0.1 reaches 0.41 rad in 30 steps, 0.05 only
    # 0.46; position-only is strictly better at equal weight).
    sigma_goal_running: float = 0.0
    # joint-limit hinge weight (0.0 disables): running cost
    # 0.5/sigma^2 * (relu(q - q_max)^2 + relu(q_min - q)^2), active only
    # when limits are passed to ilqr_solve via q_limits — the unconstrained
    # double integrator otherwise overshoots clipped-to-limit goals and the
    # executed states leave the joint range (trajectory validators count
    # out-of-limit states as collisions)
    sigma_limits: float = 0.0
    r_control: float = 1e-4          # control-effort weight (R = r I)
    mu: float = 1e-6                 # Levenberg regularization on Q_uu
    alphas: tuple = (1.0, 0.5, 0.25, 0.1, 0.03)   # line-search step sizes
    # backward-pass implementation: "pallas" (the lanes Householder sweep
    # fused into one VMEM-resident kernel, ops/pallas_riccati.py — the TPU
    # fast path; falls back to "lanes" off-TPU), "lanes" (batch in the
    # minor/lane axis, unrolled two-phase Householder QR in XLA, same
    # math) or "qr" (batched jnp.linalg.qr inside the scan — the portable
    # reference form, kept for A/B and non-TPU backends).  Static.
    # A/B at B=512, H=32 Panda/EnvSpheres3D (chained per-iteration,
    # 2026-08-20): pallas 0.975 vs lanes 1.175 ms/iter, quality equal
    # (free 0.953/0.951, goal dist 0.0178/0.0166).
    riccati: str = "pallas"


class ILQRResult(NamedTuple):
    trajs: jnp.ndarray        # (..., H, 2d) optimized state trajectories
    controls: jnp.ndarray     # (..., H-1, d) optimized accelerations
    costs: jnp.ndarray        # (...) final total costs
    cost_trace: jnp.ndarray   # (opt_iters, ...) total cost per iteration


def _dynamics_mats(d: int, dt: float, dtype):
    """Phi = [[I, dt I], [0, I]], B = [[dt^2/2 I], [dt I]]."""
    eye = jnp.eye(d, dtype=dtype)
    Phi = jnp.concatenate([
        jnp.concatenate([eye, dt * eye], axis=-1),
        jnp.concatenate([jnp.zeros((d, d), dtype), eye], axis=-1)], axis=-2)
    Bm = jnp.concatenate([0.5 * dt * dt * eye, dt * eye], axis=-2)
    return Phi, Bm


def _rollout(x0, U_t, Phi, Bm):
    """x0 (B, m), U_t (H-1, B, d) time-major -> states (B, H, m)."""
    def step(x, u):
        x_next = x @ Phi.T + u @ Bm.T
        return x_next, x_next
    _, xs = jax.lax.scan(step, x0, U_t)
    return jnp.concatenate([x0[:, None], jnp.moveaxis(xs, 0, 1)], axis=1)


def _ilqr_batch(residual_fn, x0, goal_state, params: ILQRParams,
                u_init=None, x_ref=None, q_limits=None):
    """Batch-first iLQR: x0/goal (B, m); every residual/Jacobian evaluation
    is ONE call on the whole flattened (B*(H-1), d) state batch, so
    PlanningTask residuals ride the lanes FK chain instead of a vmapped
    per-sample AoS chain (measured 83% of solve time before: 0.61 s full
    vs 0.106 s with trivial residuals at B=512, H=32, 30 iters)."""
    B, m = x0.shape
    d = m // 2
    H = params.n_support_points
    dtype = x0.dtype
    refs = (jnp.broadcast_to(goal_state[:, None], (B, H, m)) if x_ref is None
            else x_ref)
    Phi, Bm = _dynamics_mats(d, params.dt, dtype)

    lam = 1.0 / (params.sigma_coll ** 2)
    kg = 1.0 / (params.sigma_goal_prior ** 2)
    kr = (0.0 if params.sigma_goal_running == 0.0
          else 1.0 / (params.sigma_goal_running ** 2))
    kl = (0.0 if params.sigma_limits == 0.0 or q_limits is None
          else 1.0 / (params.sigma_limits ** 2))
    r = params.r_control
    sqrt_ru = (r + params.mu) ** 0.5
    sqrt_kr = kr ** 0.5
    sqrt_kl = kl ** 0.5

    raj = getattr(residual_fn, "residuals_and_jacobian", None)
    raj_batched = raj is not None and getattr(raj, "supports_batch", False)
    res_batched = getattr(residual_fn, "supports_batch", False)

    def batch_residuals(q_flat):
        return (residual_fn(q_flat) if res_batched
                else jax.vmap(residual_fn)(q_flat))

    # fused forward-only cost kernel (ops/pallas_terms.py): the line
    # search evaluates cost VALUES at every candidate — never their
    # derivative — so it can skip the residual materialization entirely
    cost_lanes = getattr(residual_fn, "collision_cost_lanes", None)

    def batch_coll_cost(q):
        """q (..., H-1, d) -> 0.5 * sum_p r^2 summed over waypoints."""
        if cost_lanes is not None:
            c = cost_lanes(q.reshape(-1, d).T)
            return jnp.sum(c.reshape(q.shape[:-1]), axis=-1)
        res = batch_residuals(q.reshape(-1, d)).reshape(q.shape[:-1] + (-1,))
        return 0.5 * jnp.sum(jnp.square(res), axis=(-1, -2))

    def batch_raj(q_flat):
        if raj is not None:
            return raj(q_flat) if raj_batched else jax.vmap(raj)(q_flat)
        return batch_residuals(q_flat), jax.vmap(
            jax.jacfwd(residual_fn))(q_flat)

    def total_cost(xs, U):
        """xs (..., H, m), U (..., H-1, d) -> (...,) batch costs."""
        q = xs[..., :-1, :d]
        c = lam * batch_coll_cost(q) \
            + 0.5 * r * jnp.sum(jnp.square(U), axis=(-1, -2))
        if kr:
            c = c + 0.5 * kr * jnp.sum(
                jnp.square(q - refs[..., :-1, :d]), axis=(-1, -2))
        if kl:
            c = c + 0.5 * kl * jnp.sum(
                jnp.square(jax.nn.relu(q - q_limits[1]))
                + jnp.square(jax.nn.relu(q_limits[0] - q)), axis=(-1, -2))
        return c + 0.5 * kg * jnp.sum(
            jnp.square(xs[..., -1, :] - refs[..., -1, :]), axis=-1)

    eye_u = jnp.eye(d, dtype=dtype)
    eye_m = jnp.eye(m, dtype=dtype)
    dt_ = params.dt

    def running_terms(xs):
        """Gauss-Newton gradient + FACTORED Hessian of the running state
        costs at ALL (B, H-1) states in one batched evaluation; the GN
        structure lam J^T J factors exactly as (sqrt(lam) J)^T(sqrt(lam) J)
        so the square-root sweeps never form the ill-conditioned product.
        Returns l_x_T (B, m), l_xs (B, H-1, m), F (B, H-1, P_tot, m)."""
        l_x_T = kg * (xs[:, -1] - refs[:, -1])                 # (B, m)
        q = xs[:, :-1, :d]                                     # (B, H-1, d)
        res, J = batch_raj(q.reshape(-1, d))
        P = res.shape[-1]
        res = res.reshape(B, H - 1, P)
        J = J.reshape(B, H - 1, P, d)
        g_q = lam * jnp.einsum("bhpd,bhp->bhd", J, res)
        l_xs = jnp.concatenate(
            [g_q, jnp.zeros((B, H - 1, m - d), dtype)], axis=-1)
        F = jnp.concatenate(
            [jnp.sqrt(lam) * J, jnp.zeros((B, H - 1, P, m - d), dtype)],
            axis=-1)                                           # (B,H-1,P,m)
        if kr:
            l_xs = l_xs + kr * jnp.concatenate(
                [q - refs[:, :-1, :d], jnp.zeros((B, H - 1, m - d), dtype)],
                axis=-1)
            F = jnp.concatenate(
                [F, jnp.broadcast_to(sqrt_kr * jnp.eye(d, m, dtype=dtype),
                                     (B, H - 1, d, m))], axis=-2)
        if kl:
            r_hi = jax.nn.relu(q - q_limits[1])
            r_lo = jax.nn.relu(q_limits[0] - q)
            l_xs = l_xs + kl * jnp.concatenate(
                [r_hi - r_lo, jnp.zeros((B, H - 1, m - d), dtype)], axis=-1)
            act = ((r_hi > 0) | (r_lo > 0)).astype(dtype)      # (B, H-1, d)
            F = jnp.concatenate(
                [F, sqrt_kl * act[..., None] * jnp.eye(d, m, dtype=dtype)],
                axis=-2)
        return l_x_T, l_xs, F

    def backward(xs, U_t):
        """Square-root Riccati sweep (batched); U_t (H-1, B, d) time-major.
        Returns time-major feedforward ks (H-1, B, d) and feedback
        Ks (H-1, B, d, m).

        The value Hessian is propagated as a factor S with Vxx = S^T S
        (initialized to sqrt(kg) I).  Each step QR-factors the stacked
        array A = [[sqrt(r+mu) I, 0], [S B, S Phi], [0, F_t]] whose Gram is
        the full [[Quu, Qux], [Qux^T, Qxx]] block: R11^T R11 = Quu,
        R11^{-1} R12 = Quu^{-1} Qux, and R22^T R22 is EXACTLY the Schur
        complement Qxx - Qux^T Quu^{-1} Qux = Vxx_next — computed without
        the catastrophic float32 cancellation of the dense recursion, and
        PSD by construction (the plain Cholesky sweep NaNs on TPU/float32
        at kg/r ratios ~1e10; dynamic range here is sqrt(kg)/sqrt(r)).
        """
        l_x_T, l_xs, F = running_terms(xs)
        S_T = jnp.broadcast_to(jnp.sqrt(kg) * eye_m, (B, m, m))
        P_tot = F.shape[-2]
        top = jnp.broadcast_to(
            jnp.concatenate([sqrt_ru * eye_u,
                             jnp.zeros((d, m), dtype)], axis=-1),
            (B, d, d + m))
        zeros_Pd = jnp.zeros((B, P_tot, d), dtype)

        def step(carry, inp):
            Vx, S = carry                                      # (B,m),(B,m,m)
            u, l_x, F_t = inp
            SB = S @ Bm                                        # (B, m, d)
            SPhi = S @ Phi                                     # (B, m, m)
            A = jnp.concatenate([
                top,
                jnp.concatenate([SB, SPhi], axis=-1),
                jnp.concatenate([zeros_Pd, F_t], axis=-1)], axis=-2)
            R = jnp.linalg.qr(A, mode="r")                     # (B,d+m,d+m)
            R11 = R[:, :d, :d]
            R12 = R[:, :d, d:]
            S_new = R[:, d:, d:]                               # Vxx = S^T S
            Qx = l_x + Vx @ Phi                                # Phi^T Vx
            Qu = r * u + Vx @ Bm                               # B^T Vx
            w = jax.scipy.linalg.solve_triangular(
                jnp.swapaxes(R11, -1, -2), Qu[..., None], lower=True)
            k = -jax.scipy.linalg.solve_triangular(
                R11, w, lower=False)[..., 0]                   # (B, d)
            K = -jax.scipy.linalg.solve_triangular(
                R11, R12, lower=False)                         # (B, d, m)
            # Vx_next = Qx + Qux^T k with Qux = R11^T R12
            Vx_new = Qx + jnp.einsum(
                "bdm,bd->bm", R12, (R11 @ k[..., None])[..., 0])
            return (Vx_new, S_new), (k, K)

        _, (ks, Ks) = jax.lax.scan(
            step, (l_x_T, S_T),
            (U_t, jnp.moveaxis(l_xs, 1, 0), jnp.moveaxis(F, 1, 0)),
            reverse=True)
        return ks, Ks

    sqrt_kg = kg ** 0.5

    def backward_lanes(xs, U_t_l, terms=None):
        """Same square-root Riccati math as ``backward``, in the lanes
        layout (batch in the minor axis) with the in-scan QR unrolled into
        a two-phase Householder factorization — the TPU fast path.  The
        batched ``jnp.linalg.qr`` of the (B, d+m+P, d+m) stack was ~70% of
        the solve (0.105 of 0.15 s at B=512, H=32, 30 iters); here each
        reflection is a handful of (rows, cols, B) elementwise
        multiply-reduce ops (CLAUDE.md lesson 2: no dot_general with the
        lane axis as batch dim; columns shrink via static slices, rows are
        emitted via concatenation — no scatter, lesson 1).

        Structure exploited in the stacked array
        A = [[sqrt(r+mu) I, 0], [S B, S Phi], [0, F_t]]:
        - the P F-rows are ZERO in the u-columns, so phase 1's reflections
          touch only the top d+m rows;
        - top-block row j is touched only by reflection j (v_j support is
          {row j} + the m S-rows), so its pivot is the CONSTANT sqrt(r+mu)
          and R11[j, c>j] / R12[j, :] are zero until reflection j fires;
        - S @ B and S @ Phi are elementwise in the double-integrator
          structure (Phi = [[I, dt I], [0, I]], B = [[dt^2/2 I], [dt I]]).
        Takes U_t_l (H-1, d, B) time-major lanes; returns ks (H-1, d, B),
        Ks (H-1, d, m, B).  ``terms``: precomputed running_terms output
        (the pallas fallback path passes it to avoid evaluating the
        dominant residual+Jacobian stage twice)."""
        l_x_T, l_xs, F = running_terms(xs) if terms is None else terms
        l_l = jnp.transpose(l_xs, (1, 2, 0))                   # (H-1, m, B)
        F_l = jnp.transpose(F, (1, 2, 3, 0))               # (H-1, P, m, B)
        Vx0 = l_x_T.T                                          # (m, B)
        S0 = sqrt_kg * eye_m[:, :, None] + jnp.zeros_like(Vx0)[None]

        def step(carry, inp):
            Vx, S = carry                              # (m, B), (m, m, B)
            u, l_x, F_t = inp                      # (d,B), (m,B), (P,m,B)
            S1, S2 = S[:, :d], S[:, d:]
            G = 0.5 * dt_ * dt_ * S1 + dt_ * S2        # S @ B   (m, d, B)
            M = jnp.concatenate([S1, dt_ * S1 + S2], axis=1)   # S @ Phi

            # phase 1: d reflections over the u-block columns
            r11_rows, r12_rows = [], []
            for j in range(d):
                g = G[:, 0]                                    # (m, B)
                gg = jnp.sum(g * g, axis=0)                    # (B,)
                alpha = -jnp.sqrt(sqrt_ru * sqrt_ru + gg)
                v0 = sqrt_ru - alpha                           # > 0 always
                beta = 2.0 / (v0 * v0 + gg)
                W_x = jnp.sum(g[:, None] * M, axis=0)          # (m, B)
                r12_rows.append(-(beta * v0) * W_x)
                M = M - (beta * W_x)[None] * g[:, None]
                if j < d - 1:
                    W_u = jnp.sum(g[:, None] * G[:, 1:], axis=0)
                    r11_rows.append(jnp.concatenate(
                        [jnp.zeros((j,) + alpha.shape, dtype), alpha[None],
                         -(beta * v0) * W_u], axis=0))
                    G = G[:, 1:] - (beta * W_u)[None] * g[:, None]
                else:
                    r11_rows.append(jnp.concatenate(
                        [jnp.zeros((j,) + alpha.shape, dtype), alpha[None]],
                        axis=0))

            # phase 2: m reflections triangularize [M; F_t] -> S_next
            s_rows = []
            Fm = F_t
            for j in range(m):
                vm, vf = M[:, 0], Fm[:, 0]         # (m-j, B), (P, B)
                head = vm[0]
                rest2 = (jnp.sum(vm[1:] * vm[1:], axis=0)
                         + jnp.sum(vf * vf, axis=0))
                norm = jnp.sqrt(head * head + rest2)
                alpha = -jnp.where(head >= 0, 1.0, -1.0).astype(dtype) * norm
                v0 = head - alpha
                vtv = v0 * v0 + rest2
                beta = jnp.where(vtv > 0,
                                 2.0 / jnp.where(vtv > 0, vtv, 1.0), 0.0)
                if j < m - 1:
                    v_m = jnp.concatenate([v0[None], vm[1:]], axis=0)
                    W = (jnp.sum(v_m[:, None] * M[:, 1:], axis=0)
                         + jnp.sum(vf[:, None] * Fm[:, 1:], axis=0))
                    Mr = M[:, 1:] - (beta * W)[None] * v_m[:, None]
                    Fm = Fm[:, 1:] - (beta * W)[None] * vf[:, None]
                    s_rows.append(jnp.concatenate(
                        [jnp.zeros((j,) + alpha.shape, dtype), alpha[None],
                         Mr[0]], axis=0))
                    M = Mr[1:]
                else:
                    s_rows.append(jnp.concatenate(
                        [jnp.zeros((j,) + alpha.shape, dtype), alpha[None]],
                        axis=0))
            S_new = jnp.stack(s_rows)                          # (m, m, B)

            # Qx = l_x + Phi^T Vx, Qu = r u + B^T Vx (elementwise structure)
            Vq, Vv = Vx[:d], Vx[d:]
            Qx = jnp.concatenate(
                [l_x[:d] + Vq, l_x[d:] + dt_ * Vq + Vv], axis=0)
            Qu = r * u + 0.5 * dt_ * dt_ * Vq + dt_ * Vv       # (d, B)

            R11 = r11_rows                         # list of (d, B) rows
            R12 = jnp.stack(r12_rows)                          # (d, m, B)
            # w = R11^{-T} Qu (forward subst), k = -R11^{-1} w (back subst)
            w_rows = []
            for i in range(d):
                acc = Qu[i]
                for l2 in range(i):
                    acc = acc - R11[l2][i] * w_rows[l2]
                w_rows.append(acc / R11[i][i])
            k_rows = [None] * d
            for i in range(d - 1, -1, -1):
                acc = -w_rows[i]
                for l2 in range(i + 1, d):
                    acc = acc - R11[i][l2] * k_rows[l2]
                k_rows[i] = acc / R11[i][i]
            k = jnp.stack(k_rows)                              # (d, B)
            # K = -R11^{-1} R12 (back substitution, m RHS columns at once)
            K_rows = [None] * d
            for i in range(d - 1, -1, -1):
                acc = -R12[i]
                for l2 in range(i + 1, d):
                    acc = acc - R11[i][l2][None] * K_rows[l2]
                K_rows[i] = acc / R11[i][i][None]
            K = jnp.stack(K_rows)                              # (d, m, B)
            # Vx_next = Qx + Qux^T k = Qx + R12^T (R11 k)
            Vx_new = Qx
            for i in range(d):
                y_i = R11[i][i] * k_rows[i]
                for l2 in range(i + 1, d):
                    y_i = y_i + R11[i][l2] * k_rows[l2]
                Vx_new = Vx_new + R12[i] * y_i[None]
            return (Vx_new, S_new), (k, K)

        _, (ks, Ks) = jax.lax.scan(
            step, (Vx0, S0), (U_t_l, l_l, F_l), reverse=True)
        return ks, Ks                        # (H-1, d, B), (H-1, d, m, B)

    # batches that are not a multiple of the 128-lane tile are zero-padded
    # on the lane axis (the sweep is per-lane; padded lanes stay NaN-free:
    # every pivot is >= sqrt(r+mu) or sqrt(kg), beta is vtv-guarded).
    # Lanes below a full tile are padded by the TPU anyway, so a padded
    # kernel call beats falling back to the HBM-round-tripping XLA scan.
    B_pad = -(-B // 128) * 128

    def _pad_lanes(a):
        return (a if B_pad == B else
                jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, B_pad - B)]))

    def backward_pallas(xs, U_t_l):
        """Same sweep as ``backward_lanes`` but VMEM-resident: the whole
        reverse recursion runs inside one Pallas kernel per lane tile
        (ops/pallas_riccati.py), so the S factor and the reflection
        workspaces never round-trip HBM between steps.  Falls back to the
        XLA lanes sweep off-TPU / at incompatible shapes."""
        from ..ops.pallas_riccati import (riccati_backward_pallas_factory,
                                          riccati_pallas_tile_for)
        l_x_T, l_xs, F = running_terms(xs)
        P_tot = F.shape[-2]
        tb = riccati_pallas_tile_for(d, m, P_tot, H - 1, B_pad)
        if tb is None:
            return backward_lanes(xs, U_t_l, terms=(l_x_T, l_xs, F))
        l_l = jnp.transpose(l_xs, (1, 2, 0))               # (H-1, m, B)
        Fc_l = jnp.transpose(F, (1, 3, 2, 0))          # (H-1, m, P, B)
        sweep = riccati_backward_pallas_factory(
            d, m, P_tot, H - 1, dt_, r, params.mu, kg)
        ks_l, Ks_l = sweep(_pad_lanes(U_t_l), _pad_lanes(l_l),
                           _pad_lanes(Fc_l), _pad_lanes(l_x_T.T),
                           tile_b=tb)
        return ks_l[..., :B], Ks_l[..., :B]

    def forward_lanes(xs_l, U_t_l, ks, Ks, alpha):
        """Closed-loop rollout at step size alpha, lanes layout
        (time-major xs_l (H, m, B)); dynamics applied elementwise via the
        double-integrator structure."""
        def step(x, inp):
            x_ref, u_ref, k, K = inp
            dx = x - x_ref                                     # (m, B)
            u = u_ref + alpha * k + jnp.sum(K * dx[None], axis=1)
            x_next = jnp.concatenate(
                [x[:d] + dt_ * x[d:] + 0.5 * dt_ * dt_ * u,
                 x[d:] + dt_ * u], axis=0)
            return x_next, (x_next, u)
        _, (xs_new, U_new) = jax.lax.scan(
            step, xs_l[0], (xs_l[:-1], U_t_l, ks, Ks))
        return jnp.concatenate([xs_l[:1], xs_new], axis=0), U_new

    def forward_all_pallas(xs_l, U_t_l, ks_l, Ks_l):
        """All line-search alphas rolled out in ONE VMEM-resident kernel
        (ops/pallas_riccati.py) instead of A vmapped 31-step XLA scans of
        ~100-op bodies.  Returns (xs_c_l (A, H, m, B), U_c_l (A, H-1, d,
        B)) or None off-TPU / at incompatible shapes."""
        from ..ops.pallas_riccati import (linesearch_rollout_pallas_factory,
                                          rollout_pallas_tile_for)
        A = len(params.alphas)
        tb = rollout_pallas_tile_for(d, m, A, H - 1, B_pad)
        if tb is None:
            return None
        roll = linesearch_rollout_pallas_factory(
            d, m, H - 1, dt_, tuple(params.alphas))
        xs_new, U_new = roll(_pad_lanes(xs_l), _pad_lanes(U_t_l),
                             _pad_lanes(ks_l), _pad_lanes(Ks_l), tile_b=tb)
        xs_new, U_new = xs_new[..., :B], U_new[..., :B]
        xs_c_l = jnp.concatenate(
            [jnp.broadcast_to(xs_l[None, :1], (A, 1, m, B)), xs_new],
            axis=1)
        return xs_c_l, U_new

    def forward(xs, U_t, ks, Ks, alpha):
        """Closed-loop rollout at step size alpha; time-major inputs."""
        xs_ref_t = jnp.moveaxis(xs[:, :-1], 1, 0)              # (H-1, B, m)

        def step(x, inp):
            x_ref, u_ref, k, K = inp
            u = u_ref + alpha * k + jnp.einsum(
                "bdm,bm->bd", K, x - x_ref)
            x_next = x @ Phi.T + u @ Bm.T
            return x_next, (x_next, u)
        _, (xs_new, U_new) = jax.lax.scan(
            step, xs[:, 0], (xs_ref_t, U_t, ks, Ks))
        xs_new = jnp.concatenate(
            [xs[:, :1], jnp.moveaxis(xs_new, 0, 1)], axis=1)
        return xs_new, jnp.moveaxis(U_new, 0, 1)

    def iteration(carry, _):
        xs, U, cost = carry                                    # U (B, H-1, d)
        U_t = jnp.moveaxis(U, 1, 0)
        # line search: all alphas in one batched rollout, argmin PER problem
        alphas = jnp.asarray(params.alphas, dtype)
        if params.riccati in ("lanes", "pallas"):
            U_t_l = jnp.transpose(U_t, (0, 2, 1))              # (H-1, d, B)
            ks_l, Ks_l = (backward_pallas if params.riccati == "pallas"
                          else backward_lanes)(xs, U_t_l)
            xs_l = jnp.transpose(xs, (1, 2, 0))                # (H, m, B)
            rolled = (forward_all_pallas(xs_l, U_t_l, ks_l, Ks_l)
                      if params.riccati == "pallas" else None)
            if rolled is None:
                xs_c_l, U_c_l = jax.vmap(
                    lambda a: forward_lanes(xs_l, U_t_l, ks_l, Ks_l,
                                            a))(alphas)
            else:
                xs_c_l, U_c_l = rolled
            xs_c = jnp.transpose(xs_c_l, (0, 3, 1, 2))         # (A, B, H, m)
            U_c = jnp.transpose(U_c_l, (0, 3, 1, 2))
        else:
            ks, Ks = backward(xs, U_t)
            xs_c, U_c = jax.vmap(
                lambda a: forward(xs, U_t, ks, Ks, a))(alphas)
        costs_c = total_cost(xs_c, U_c)                        # (A, B)
        best = jnp.argmin(costs_c, axis=0)                     # (B,)
        pick = jax.nn.one_hot(best, alphas.shape[0], axis=0,
                              dtype=dtype)                     # (A, B)
        xs_b = jnp.einsum("ab,abhm->bhm", pick, xs_c)
        U_b = jnp.einsum("ab,abhd->bhd", pick, U_c)
        cost_b = jnp.min(costs_c, axis=0)
        improved = cost_b < cost                               # (B,)
        xs_n = jnp.where(improved[:, None, None], xs_b, xs)
        U_n = jnp.where(improved[:, None, None], U_b, U)
        cost_n = jnp.where(improved, cost_b, cost)
        return (xs_n, U_n, cost_n), cost_n

    # derive the zero init from x0 (0*x0 term), not a fresh constant:
    # under shard_map, lax.scan's varying-axis tracking rejects a carry
    # whose input is unvarying but whose output is device-varying
    # (CLAUDE.md lesson 8)
    U0 = (jnp.zeros((B, H - 1, d), dtype) + 0.0 * x0[:, None, :d]
          if u_init is None else u_init)
    xs0 = _rollout(x0, jnp.moveaxis(U0, 1, 0), Phi, Bm)
    cost0 = total_cost(xs0, U0)
    (xs, U, cost), trace = jax.lax.scan(
        iteration, (xs0, U0, cost0), None, length=params.opt_iters)
    return ILQRResult(trajs=xs, controls=U, costs=cost, cost_trace=trace)


@partial(jax.jit, static_argnames=("residual_fn", "params"))
def ilqr_solve(residual_fn: Callable, start_state, goal_state,
               params: ILQRParams, u_init=None, x_ref=None,
               q_limits=None) -> ILQRResult:
    """Batched iLQR solve.

    residual_fn: per-waypoint hinge obstacle residuals (e.g.
    ``PlanningTask.collision_residuals``).  When the function (and its
    ``residuals_and_jacobian`` fast path) advertises ``supports_batch``,
    every evaluation inside the solver is ONE call over the whole flattened
    (B*(H-1), d) state batch — the lanes FK path, ~5x the vmapped
    per-sample form end-to-end.
    start_state/goal_state: (..., 2d).  u_init (optional): warm-start
    controls (..., H-1, d) — e.g. from a previous MPC step or a coarse
    plan; defaults to a zero-control rollout.
    x_ref (optional): (..., H, 2d) reference trajectory for the
    running/terminal goal costs — tracking-MPC mode: a receding window of
    a converged plan, so the controller follows the plan's detours instead
    of pulling straight at a point target through obstacles.
    q_limits (optional): (q_min (d,), q_max (d,)) joint limits, shared
    across the batch; activates the ``sigma_limits`` hinge cost.
    Returns dynamically-feasible trajectories (states obey the double
    integrator exactly).  Runs at float32 matmul precision like the GN
    solver (the Riccati recursions inherit the GN systems' conditioning).
    """
    with jax.default_matmul_precision("float32"):
        m = start_state.shape[-1]
        batch = start_state.shape[:-1]
        flat_s = start_state.reshape((-1, m))
        flat_g = goal_state.reshape((-1, m))
        flat_u = (None if u_init is None
                  else u_init.reshape((-1,) + u_init.shape[-2:]))
        flat_r = (None if x_ref is None
                  else x_ref.reshape((-1,) + x_ref.shape[-2:]))
        res = _ilqr_batch(residual_fn, flat_s, flat_g, params,
                          u_init=flat_u, x_ref=flat_r, q_limits=q_limits)
        if batch:
            return ILQRResult(
                trajs=res.trajs.reshape(batch + res.trajs.shape[1:]),
                controls=res.controls.reshape(
                    batch + res.controls.shape[1:]),
                costs=res.costs.reshape(batch),
                cost_trace=res.cost_trace.reshape(
                    (params.opt_iters,) + batch))
        return ILQRResult(
            trajs=res.trajs[0], controls=res.controls[0],
            costs=res.costs[0], cost_trace=res.cost_trace[:, 0])
