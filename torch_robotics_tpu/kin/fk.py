"""Batched forward kinematics and Jacobians on a compiled KinematicModel.

Replaces the reference's recursive stateful FK
(/root/reference/torch_robotics/torch_kinematics_tree/models/rigid_body.py:146-211
and robot_tree.py:267-301) with a statically-unrolled chain of batched (R, t)
composes over the topological link order.  Everything is pure: ``fk(model, q)``
jits, vmaps and differentiates.

The small 3x3 matmuls in the chain run with ``precision=HIGHEST`` so float32
results on TPU match the CPU reference within the 1e-3 parity budget (the MXU
defaults to bf16 inputs otherwise).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.se3 import axis_angle_rotation, pack_homogeneous
from .model import KinematicModel

__all__ = [
    "local_joint_transforms", "fk_rot_trans", "fk_all_links",
    "fk_link_positions", "geometric_jacobian", "analytical_jacobian",
]

_PREC = jax.lax.Precision.HIGHEST


def local_joint_transforms(model: KinematicModel, q):
    """Per-link local (R, t) from joint values.

    q: (..., n_dofs) -> R: (..., n_links, 3, 3), t: (..., n_links, 3)
    """
    q = jnp.asarray(q)
    # gather per-link joint values (0 where fixed), clamp to limits
    if model.n_dofs > 0:
        q_link = q[..., model.q_map]
    else:
        q_link = jnp.zeros(q.shape[:-1] + (model.n_links,), q.dtype)
    has_q = model.rot_mask + model.prism_mask
    q_link = q_link * has_q
    q_link = jnp.clip(q_link, model.clamp_lower, model.clamp_upper)

    angle = q_link * model.rot_mask
    R_joint = axis_angle_rotation(model.joint_axis, angle)
    R = jnp.matmul(model.joint_fixed_rot, R_joint, precision=_PREC)
    t = model.joint_trans + model.joint_axis * (q_link * model.prism_mask)[..., None]
    return R, t


def fk_rot_trans(model: KinematicModel, q, base_rot=None, base_trans=None):
    """World (R, t) for every link.

    q: (..., n_dofs) -> R: (..., n_links, 3, 3), t: (..., n_links, 3)

    The compose chain is unrolled over the static topological order; each step
    is one batched 3x3 matmul + matvec, which XLA fuses across the batch.
    An optional base pose places the root link in the world.
    """
    R_loc, t_loc = local_joint_transforms(model, q)
    topo = model.topological_order()

    R_world = [None] * model.n_links
    t_world = [None] * model.n_links
    for i in topo:
        p = model.parent_idx[i]
        Ri = R_loc[..., i, :, :]
        ti = t_loc[..., i, :]
        if p < 0:
            # base_rot / base_trans are independent (identity / zero
            # defaults), matching the batched lanes branch in fk_all_links
            if base_rot is not None:
                Ri = jnp.matmul(base_rot, Ri, precision=_PREC)
                ti = jnp.matmul(base_rot, ti[..., None],
                                precision=_PREC)[..., 0]
            if base_trans is not None:
                ti = ti + base_trans
            R_world[i] = Ri
            t_world[i] = ti
        else:
            Rp, tp = R_world[p], t_world[p]
            R_world[i] = jnp.matmul(Rp, Ri, precision=_PREC)
            t_world[i] = jnp.matmul(Rp, ti[..., None],
                                    precision=_PREC)[..., 0] + tp
    return (jnp.stack(R_world, axis=-3), jnp.stack(t_world, axis=-2))


def fk_all_links(model: KinematicModel, q, link_list: Optional[Sequence[str]] = None,
                 base_rot=None, base_trans=None):
    """Stateless FK for all links as homogeneous matrices.

    q: (..., n_dofs) -> (..., n_links, 4, 4) in URDF file order, matching the
    reference ``compute_forward_kinematics_all_links`` (robot_tree.py:267-301).
    ``link_list`` selects/orders a subset of links.

    Batched calls compute via the lane-layout chain (ops/lanes_fk.py): the
    AoS (B, L, 3, 3) rotation math tile-pads ~40x on TPU; only the final
    repack into the (..., L, 4, 4) output touches the padded layout
    (measured 15.7x at B=65536, parity ~2e-7).  Per-sample calls
    (q.ndim == 1, e.g. under jax.vmap/jacfwd) keep the AoS path — vmap
    would batch the lanes scalars into trailing-dim-1 arrays (128x tile
    padding, exploded graph).
    """
    q = jnp.asarray(q)
    if q.ndim == 1:
        R, t = fk_rot_trans(model, q, base_rot=base_rot,
                            base_trans=base_trans)
        H = pack_homogeneous(R, t)
        if link_list is not None:
            idxs = np.array([model.link_index(n) for n in link_list])
            H = H[..., idxs, :, :]
        return H
    from ..ops.lanes_fk import _matmul3, _matvec3, _scalar_mat3, fk_lanes
    batch = q.shape[:-1]
    d = q.shape[-1]
    R_w, t_w = fk_lanes(model, q.reshape((-1, d)).T)
    if base_rot is not None or base_trans is not None:
        Rb_arr = (jnp.eye(3, dtype=q.dtype)
                  if base_rot is None else jnp.asarray(base_rot))
        tb_arr = (jnp.zeros((3,), q.dtype)
                  if base_trans is None else jnp.asarray(base_trans))
        # batched base poses flatten into the lane axis ((N,) entries
        # broadcast against the (N,) FK lanes)
        if Rb_arr.ndim > 2:
            Rb_flat = Rb_arr.reshape((-1, 3, 3))
            Rb = tuple(tuple(Rb_flat[:, i, j] for j in range(3))
                       for i in range(3))
        else:
            Rb = _scalar_mat3(Rb_arr)
        if tb_arr.ndim > 1:
            tb_flat = tb_arr.reshape((-1, 3))
            tb = tuple(tb_flat[:, k] for k in range(3))
        else:
            tb = tuple(tb_arr[k] for k in range(3))
        R_w = [_matmul3(Rb, R) for R in R_w]
        t_w = [tuple(v + tb[k] for k, v in enumerate(_matvec3(Rb, t)))
               for t in t_w]
    links = (range(model.n_links) if link_list is None
             else [model.link_index(n) for n in link_list])
    rows = [jnp.stack([R_w[li][i][j] for i in range(3) for j in range(3)]
                      + [t_w[li][k] for k in range(3)])         # (12, N)
            for li in links]
    flat = jnp.moveaxis(jnp.stack(rows), -1, 0)                 # (N, L, 12)
    L = len(rows)
    R = flat[..., :9].reshape(batch + (L, 3, 3))
    t = flat[..., 9:].reshape(batch + (L, 3))
    return pack_homogeneous(R, t)


def fk_link_positions(model: KinematicModel, q, link_idxs=None):
    """World positions of (a subset of) links: q (..., n_dofs) -> (..., L, 3).

    Per-sample calls (q.ndim == 1, e.g. under jax.vmap/jacfwd) take the AoS
    chain — vmapping the lanes path batches its scalars into trailing-dim-1
    arrays (128x tile padding; CLAUDE.md lesson 10).
    """
    q = jnp.asarray(q)
    if q.ndim == 1:
        _, t = fk_rot_trans(model, q)
        if link_idxs is not None:
            t = t[..., np.asarray(link_idxs), :]
        return t
    from ..ops.lanes_fk import fk_positions_lanes
    return fk_positions_lanes(model, q, link_idxs=link_idxs)


def fk_with_velocities(model: KinematicModel, q, qd):
    """FK + body-velocity propagation as one pure function.

    Replaces the reference's stateful ``update_kinematic_state``
    (robot_tree.py:136-190): velocities are expressed in each body's local
    frame, following the reference convention — v_child = joint_twist +
    (parent twist transformed into the child frame by the inverse joint
    pose), with joint twist (0, qd * axis).

    q, qd: (..., n_dofs) -> (R (..., L, 3, 3), t (..., L, 3),
    lin (..., L, 3), ang (..., L, 3)).
    """
    R_loc, t_loc = local_joint_transforms(model, q)
    if model.n_dofs > 0:
        qd_link = qd[..., model.q_map] * (model.rot_mask + model.prism_mask)
    else:
        qd_link = jnp.zeros(q.shape[:-1] + (model.n_links,), q.dtype)
    # joint twist in the child frame (reference: update_joint_state,
    # rigid_body.py:253-256 — angular for revolute, linear stays zero there;
    # we extend prismatic joints with the linear rate)
    ang_joint = model.joint_axis * (qd_link * model.rot_mask)[..., None]
    lin_joint = model.joint_axis * (qd_link * model.prism_mask)[..., None]

    topo = model.topological_order()
    R_world = [None] * model.n_links
    t_world = [None] * model.n_links
    lin = [None] * model.n_links
    ang = [None] * model.n_links
    for i in topo:
        p = model.parent_idx[i]
        Ri = R_loc[..., i, :, :]
        ti = t_loc[..., i, :]
        if p < 0:
            R_world[i], t_world[i] = Ri, ti
            lin[i] = jnp.zeros_like(ti)
            ang[i] = jnp.zeros_like(ti)
            continue
        R_world[i] = jnp.matmul(R_world[p], Ri, precision=_PREC)
        t_world[i] = jnp.matmul(R_world[p], ti[..., None],
                                precision=_PREC)[..., 0] + t_world[p]
        # parent twist into child frame via the inverse joint pose
        R_inv = jnp.swapaxes(Ri, -1, -2)
        t_inv = -jnp.matmul(R_inv, ti[..., None], precision=_PREC)[..., 0]
        ang_p = jnp.matmul(R_inv, ang[p][..., None], precision=_PREC)[..., 0]
        lin_p = (jnp.cross(t_inv, ang_p)
                 + jnp.matmul(R_inv, lin[p][..., None], precision=_PREC)[..., 0])
        ang[i] = ang_joint[..., i, :] + ang_p
        lin[i] = lin_joint[..., i, :] + lin_p
    return (jnp.stack(R_world, axis=-3), jnp.stack(t_world, axis=-2),
            jnp.stack(lin, axis=-2), jnp.stack(ang, axis=-2))


def geometric_jacobian(model: KinematicModel, q, link_name: str):
    """Geometric Jacobian of one link frame.

    q: (..., n_dofs) -> (lin_jac, ang_jac): (..., 3, n_dofs).

    Vectorized over joints (the reference loops in Python,
    robot_tree.py:238-246) using a static ancestry mask: column j is
    z_j x (p_ee - p_j) / z_j if joint j is an ancestor of the link, else 0.
    Prismatic joints contribute z_j to the linear part instead.
    """
    R, t = fk_rot_trans(model, q)
    ee_idx = model.link_index(link_name)
    p_ee = t[..., ee_idx, :]

    ctrl = list(model.controlled_link_idxs())
    idxs = jnp.asarray(np.array(ctrl, np.int32))
    R_j = R[..., idxs, :, :]
    p_j = t[..., idxs, :]
    axis_j = model.joint_axis[idxs]
    z_j = jnp.matmul(R_j, axis_j[..., None], precision=_PREC)[..., 0]

    ancestry = model.ancestry_matrix()[ee_idx]  # (n_dofs,)
    mask = jnp.asarray(ancestry, q.dtype)[..., None]
    prism = model.prism_mask[idxs][..., None]

    lin_rev = jnp.cross(z_j, p_ee[..., None, :] - p_j)
    lin = jnp.where(prism > 0, z_j, lin_rev) * mask
    ang = z_j * (1.0 - prism) * mask
    return (jnp.swapaxes(lin, -1, -2), jnp.swapaxes(ang, -1, -2))


def point_jacobians(model: KinematicModel, R, t, points, point_link_idx,
                    q=None):
    """Analytic position Jacobians of points rigidly attached to links.

    For a point p attached to link l, column j of its Jacobian is
    z_j x (p - t_j) for revolute ancestors j of l (z_j for prismatic), else 0
    — the classic geometric Jacobian formula, evaluated for all points at
    once from one FK pass (this replaces autodiff through the FK chain in the
    Gauss-Newton obstacle terms; ~5x cheaper).

    R, t: fk_rot_trans output (..., L, 3, 3)/(..., L, 3);
    points: (..., P, 3) world points; point_link_idx: (P,) owning link ids.
    If ``q`` is given, columns of joints clamped at their limits inside FK
    are zeroed (matching d/dq of the clamped chain).
    Returns J: (..., P, 3, n_dofs).
    """
    import numpy as np
    ctrl = np.asarray(list(model.controlled_link_idxs()), np.int32)
    R_j = R[..., ctrl, :, :]
    t_j = t[..., ctrl, :]
    axis_j = model.joint_axis[ctrl]
    z_j = jnp.matmul(R_j, axis_j[..., None], precision=_PREC)[..., 0]
    # ancestry of each point's link w.r.t. each controlled joint
    A = model.ancestry_matrix()[np.asarray(point_link_idx)]     # (P, n_dofs)
    mask = jnp.asarray(A, points.dtype)
    prism = model.prism_mask[ctrl]

    diff = points[..., :, None, :] - t_j[..., None, :, :]       # (..., P, J, 3)
    lin_rev = jnp.cross(z_j[..., None, :, :], diff)
    lin = jnp.where(prism[..., None] > 0, z_j[..., None, :, :], lin_rev)
    J = lin * mask[..., None]                                    # (..., P, J, 3)
    if q is not None:
        in_limits = ((q >= model.clamp_lower[ctrl])
                     & (q <= model.clamp_upper[ctrl])).astype(J.dtype)
        J = J * in_limits[..., None, :, None]
    return jnp.swapaxes(J, -1, -2)                               # (..., P, 3, J)


def analytical_jacobian(model: KinematicModel, q, link_list=None):
    """Jacobian of stacked [pos(3), quat(4)] per link via forward-mode AD.

    Mirrors the reference ``compute_analytical_jacobian_all_links``
    (robot_tree.py:250-265) but uses jacfwd instead of autograd-of-sum.
    q: (n_dofs,) or (B, n_dofs) -> (B, n_links, 7, n_dofs)
    """
    from ..core.se3 import link_pos_from_link_tensor, link_quat_from_link_tensor

    def f(q_single):
        H = fk_all_links(model, q_single, link_list=link_list)
        return jnp.concatenate(
            [link_pos_from_link_tensor(H), link_quat_from_link_tensor(H)],
            axis=-1)

    if q.ndim == 1:
        return jax.jacfwd(f)(q)
    return jax.vmap(jax.jacfwd(f))(q)
