"""Batched inverse kinematics via Adam in a lax.scan.

Functional version of the reference IK
(/root/reference/torch_robotics/torch_kinematics_tree/models/robot_tree.py:303-442):
the host-driven optimizer loop with early exit becomes a fixed-iteration
``lax.scan`` over optax Adam updates; per-sample convergence is tracked with a
validity mask (data-dependent early exit does not jit).  Loss parity:
SE(3) distance + quadratic joint-limit penalty + optional rest-posture cost
(robot_tree.py:386-417).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..core.se3 import SE3_distance
from .fk import fk_all_links
from .model import KinematicModel

__all__ = ["IKResult", "ik_loss_per_q", "ik_valid_mask", "inverse_kinematics",
           "inverse_kinematics_gn"]


class IKResult(NamedTuple):
    q: jnp.ndarray           # (B, n_dofs) final joint values
    valid: jnp.ndarray       # (B,) bool: within limits and SE3 error < eps
    err_se3: jnp.ndarray     # (B,) final SE(3) distances
    iters_to_valid: jnp.ndarray  # (B,) first iteration at which valid (or max)


def ik_loss_per_q(model: KinematicModel, q, H_target, link_name: str,
                  w_se3=1.0, w_joint_limits=300.0, lower=None, upper=None,
                  w_q_rest=1.0, q_rest=None):
    """Per-sample IK loss (robot_tree.py:386-417)."""
    lower = model.q_lower if lower is None else lower
    upper = model.q_upper if upper is None else upper
    H = fk_all_links(model, q, link_list=[link_name])[..., 0, :, :]
    err_se3 = SE3_distance(H, H_target, w_pos=1.0, w_rot=1.0)
    err_lo = jnp.sum(jnp.square(lower - q) * (q < lower), axis=-1)
    err_hi = jnp.sum(jnp.square(upper - q) * (q > upper), axis=-1)
    err = w_se3 * err_se3 + w_joint_limits * (err_lo + err_hi)
    if q_rest is not None:
        err = err + w_q_rest * jnp.linalg.norm(q - q_rest, axis=-1)
    return err


def ik_valid_mask(model: KinematicModel, q, H_target, link_name: str,
                  lower=None, upper=None, se3_eps=1e-1):
    """Termination test (robot_tree.py:419-442) as a boolean mask."""
    lower = model.q_lower if lower is None else lower
    upper = model.q_upper if upper is None else upper
    in_limits = jnp.all((q >= lower) & (q <= upper), axis=-1)
    H = fk_all_links(model, q, link_list=[link_name])[..., 0, :, :]
    err = SE3_distance(H, H_target, w_pos=1.0, w_rot=1.0)
    return in_limits & (err < se3_eps), err


@partial(jax.jit, static_argnames=("link_name", "max_iters", "lr",
                                   "restart_every"))
def _ik_run(model, H_target, link_name, q0, lower, upper,
            max_iters, lr, se3_eps, q_rest, key=None,
            restart_every: int = 50):
    """Adam scan with solution freezing and resample-on-stall.

    - the first q that satisfies the validity test is KEPT (``q_best``) even
      if later Adam steps drift away from it;
    - every ``restart_every`` iterations, still-unconverged samples are
      re-drawn uniformly inside the limits with their Adam state reset —
      the fixed-budget analogue of the reference's repeated random trials
      (robot_tree.py:329-342), which rescues samples stuck in bad basins.
    """
    opt = optax.adam(lr)
    if key is None:
        key = jax.random.PRNGKey(0)

    def loss_fn(q):
        return jnp.sum(ik_loss_per_q(model, q, H_target, link_name,
                                     lower=lower, upper=upper, q_rest=q_rest))

    def step(carry, i):
        q, opt_state, valid, q_best, iters_to_valid = carry
        new_valid, _ = ik_valid_mask(model, q, H_target, link_name,
                                     lower=lower, upper=upper, se3_eps=se3_eps)
        first = new_valid & ~valid
        q_best = jnp.where(first[:, None], q, q_best)
        iters_to_valid = jnp.where(first, i, iters_to_valid)
        valid = valid | new_valid

        # resample stalled problems with fresh starts + reset Adam state
        do_restart = (i % restart_every == restart_every - 1)
        u = jax.random.uniform(jax.random.fold_in(key, i), q.shape)
        q_fresh = lower + u * (upper - lower)
        mask = (do_restart & ~valid)[:, None]
        q = jnp.where(mask, q_fresh, q)
        opt_state = jax.tree.map(
            lambda s: (jnp.where(mask, jnp.zeros_like(s), s)
                       if isinstance(s, jnp.ndarray) and s.shape == q.shape
                       else s), opt_state)

        g = jax.grad(loss_fn)(q)
        updates, opt_state = opt.update(g, opt_state, q)
        q = optax.apply_updates(q, updates)
        return (q, opt_state, valid, q_best, iters_to_valid), None

    valid0 = jnp.zeros(q0.shape[0], bool)
    iters0 = jnp.full(q0.shape[0], max_iters, jnp.int32)
    (q, _, valid, q_best, iters), _ = jax.lax.scan(
        step, (q0, opt.init(q0), valid0, q0, iters0), jnp.arange(max_iters))
    final_valid, err_final = ik_valid_mask(
        model, q, H_target, link_name, lower=lower, upper=upper,
        se3_eps=se3_eps)
    # frozen first-valid solution for converged samples; last iterate else
    q_out = jnp.where((valid & ~final_valid)[:, None], q_best, q)
    _, err = ik_valid_mask(model, q_out, H_target, link_name,
                           lower=lower, upper=upper, se3_eps=se3_eps)
    return IKResult(q=q_out, valid=valid | final_valid, err_se3=err,
                    iters_to_valid=iters)


def inverse_kinematics(
        model: KinematicModel, H_target, link_name: str = "ee_link",
        batch_size: int = 1, max_iters: int = 1000, lr: float = 1e-2,
        se3_eps: float = 1e-1, q0: Optional[jnp.ndarray] = None,
        q0_noise: float = jnp.pi / 8, eps_joint_lim: float = jnp.pi / 100,
        q_rest: Optional[jnp.ndarray] = None,
        key: Optional[jax.Array] = None) -> IKResult:
    """Solve batched IK with Adam (robot_tree.py:303-384).

    H_target: (4, 4) or (B, 4, 4).  Initial q is sampled uniformly inside the
    (slightly shrunk) joint limits, or jittered around a provided ``q0``.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    H_target = jnp.asarray(H_target)
    if H_target.ndim == 2:
        H_target = H_target[None]
    lower = model.q_lower + eps_joint_lim
    upper = model.q_upper - eps_joint_lim
    if q0 is None:
        u = jax.random.uniform(key, (batch_size, model.n_dofs))
        q0 = lower + u * (upper - lower)
    else:
        noise = jax.random.normal(key, (batch_size, model.n_dofs)) * q0_noise
        q0 = jnp.clip(q0 + noise, lower, upper)

    return _ik_run(model, H_target, link_name, q0, lower, upper,
                   max_iters, lr, se3_eps, q_rest,
                   key=jax.random.fold_in(key, 1))


@partial(jax.jit, static_argnames=("link_name", "max_iters", "restart_every"))
def _ik_gn_run(model, H_target, link_name, q0, lower, upper, max_iters,
               damping, se3_eps, key, restart_every):
    """DLS scan with every per-iteration FK / Jacobian / 6x6 solve in the
    lane layout (ops/lanes_fk.py): the AoS path paid three tile-padded
    (B, L, 3, 3) FK passes per iteration.  Values match the AoS step."""
    from ..ops.lanes_fk import _matvec3, fk_lanes
    from ..solve.btridiag_lanes import (_chol_lanes, _trsv_lower_lanes,
                                        _trsv_upper_lanes)
    from .model import JOINT_PRISMATIC

    ee = model.link_index(link_name)
    ctrl = list(model.controlled_link_idxs())
    anc = model.ancestry_matrix()[ee]
    prism = [model.joint_types[li] == JOINT_PRISMATIC for li in ctrl]
    d = model.n_dofs
    # target entries as lane scalars (shape () or (B,) — broadcasts)
    Rt = [[H_target[..., i, j] for j in range(3)] for i in range(3)]
    tt = [H_target[..., i, 3] for i in range(3)]

    def fk_ee_lanes(q):
        R_w, t_w = fk_lanes(model, q.T)
        return R_w, t_w, R_w[ee], t_w[ee]

    def se3_err_lanes(R, t):
        # SE3_distance parity: w_rot*(1 - cos(angle(R Rt^T))) + w_pos*|t-tt|
        tr = sum(R[i][j] * Rt[i][j] for i in range(3) for j in range(3))
        d2 = sum(jnp.square(t[k] - tt[k]) for k in range(3))
        return (1.0 - (tr - 1.0) * 0.5) + jnp.sqrt(d2)

    def step(carry, i):
        q, valid, q_best, iters_to_valid = carry
        _, _, R, t = fk_ee_lanes(q)
        err = se3_err_lanes(R, t)
        in_limits = jnp.all((q >= lower) & (q <= upper), axis=-1)
        new_valid = in_limits & (err < se3_eps)
        first = new_valid & ~valid
        q_best = jnp.where(first[:, None], q, q_best)
        iters_to_valid = jnp.where(first, i, iters_to_valid)
        valid = valid | new_valid

        # resample stalled problems
        do_restart = (i % restart_every == restart_every - 1)
        u = jax.random.uniform(jax.random.fold_in(key, i), q.shape)
        mask = (do_restart & ~valid)[:, None]
        q = jnp.where(mask, lower + u * (upper - lower), q)

        # twist error e = (t_err, log_SO3(Rt R^T)) in lanes
        R_w, t_w, R, t = fk_ee_lanes(q)
        R_err = [[sum(Rt[i][k] * R[j][k] for k in range(3))
                  for j in range(3)] for i in range(3)]
        trR = jnp.clip((R_err[0][0] + R_err[1][1] + R_err[2][2] - 1.0) * 0.5,
                       -1.0, 1.0)
        theta = jnp.arccos(trR)
        scale = theta / (2.0 * jnp.sin(theta) + 1.0e-14)
        e = [tt[0] - t[0], tt[1] - t[1], tt[2] - t[2],
             scale * (R_err[2][1] - R_err[1][2]),
             scale * (R_err[0][2] - R_err[2][0]),
             scale * (R_err[1][0] - R_err[0][1])]
        e = [jnp.broadcast_to(ek, q.shape[:1]) for ek in e]

        # geometric Jacobian columns (6 rows x d cols of (B,) lanes)
        J = [[None] * d for _ in range(6)]
        for j, li in enumerate(ctrl):
            if not anc[j]:
                continue
            axis = tuple(model.joint_axis[li, k] for k in range(3))
            z = _matvec3(R_w[li], axis)
            if prism[j]:
                for r in range(3):
                    J[r][j] = z[r]
            else:
                dx = tuple(t[k] - t_w[li][k] for k in range(3))
                J[0][j] = z[1] * dx[2] - z[2] * dx[1]
                J[1][j] = z[2] * dx[0] - z[0] * dx[2]
                J[2][j] = z[0] * dx[1] - z[1] * dx[0]
                for r in range(3):
                    J[3 + r][j] = z[r]

        # damped least squares: dq = J^T (J J^T + lam I)^{-1} e, all lanes
        zero = jnp.zeros_like(e[0])
        JJt = jnp.stack([
            jnp.stack([
                sum((J[a][c] * J[b][c] for c in range(d)
                     if J[a][c] is not None and J[b][c] is not None),
                    start=zero) + (damping if a == b else 0.0)
                for b in range(6)])
            for a in range(6)])                              # (6, 6, B)
        L = _chol_lanes(JJt)
        y = _trsv_upper_lanes(L, _trsv_lower_lanes(L, jnp.stack(e)))
        dq = jnp.stack([
            sum((J[a][c] * y[a] for a in range(6)
                 if J[a][c] is not None), start=zero)
            for c in range(d)])                              # (d, B)
        q = jnp.clip(q + dq.T, lower, upper)
        return (q, valid, q_best, iters_to_valid), None

    valid0 = jnp.zeros(q0.shape[0], bool)
    iters0 = jnp.full(q0.shape[0], max_iters, jnp.int32)
    (q, valid, q_best, iters), _ = jax.lax.scan(
        step, (q0, valid0, q0, iters0), jnp.arange(max_iters))
    final_valid, _ = ik_valid_mask(model, q, H_target, link_name,
                                   lower=lower, upper=upper, se3_eps=se3_eps)
    q_out = jnp.where((valid & ~final_valid)[:, None], q_best, q)
    _, err = ik_valid_mask(model, q_out, H_target, link_name,
                           lower=lower, upper=upper, se3_eps=se3_eps)
    return IKResult(q=q_out, valid=valid | final_valid, err_se3=err,
                    iters_to_valid=iters)


def inverse_kinematics_gn(
        model: KinematicModel, H_target, link_name: str = "ee_link",
        batch_size: int = 1, max_iters: int = 60, damping: float = 1e-4,
        se3_eps: float = 1e-1, eps_joint_lim: float = jnp.pi / 100,
        restart_every: int = 20,
        key: Optional[jax.Array] = None) -> IKResult:
    """Damped-least-squares (Gauss-Newton) batched IK.

    Beyond-reference solver: the reference only ships first-order Adam IK
    (robot_tree.py:303-384, kept as ``inverse_kinematics`` for parity).
    DLS iterates dq = J^T (J J^T + lam I)^{-1} e with the joint-space
    iterate clipped to the limits, converging in tens of iterations where
    Adam needs hundreds; unconverged samples are redrawn every
    ``restart_every`` iterations.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    H_target = jnp.asarray(H_target)
    if H_target.ndim == 2:
        H_target = H_target[None]
    lower = model.q_lower + eps_joint_lim
    upper = model.q_upper - eps_joint_lim
    u = jax.random.uniform(key, (batch_size, model.n_dofs))
    q0 = lower + u * (upper - lower)
    return _ik_gn_run(model, H_target, link_name, q0, lower, upper,
                      max_iters, damping, se3_eps,
                      jax.random.fold_in(key, 1), restart_every)
