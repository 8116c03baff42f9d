"""Task-space (end-effector SE(3)) goal factors for Gauss-Newton solvers.

Brings the reference's EE-pose objective (``EESE3DistanceField``,
distance_fields.py:335-359) into the GPMP2 factor graph: instead of a
config-space goal prior, the final waypoint carries residuals on the EE pose

    r_pos = w_pos * (p_ee(q) - p*)                (3 residuals)
    r_rot = w_rot * vec(R_ee(q) - R*)             (9 residuals)

with fully analytic Jacobians (dp/dq_j = z_j x (p - t_j),
dR_col/dq_j = z_j x R_col for revolute ancestors) — no autodiff through the
FK chain.  Useful for reaching Cartesian targets without running IK first.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..kin.fk import fk_rot_trans
from ..kin.model import KinematicModel

__all__ = ["make_ee_goal_terms"]


def make_ee_goal_terms(robot, target_H, w_pos: float = 1.0,
                       w_rot: float = 1.0,
                       sigma_ee: float = 1e-2) -> Callable:
    """Build the GN terms function for an EE-pose goal on the final waypoint.

    robot: a kinematic robot (RobotPanda / KinematicRobot) with ``model`` and
    ``link_name_ee``; target_H: (4, 4) target pose.
    Returns f(q (..., d)) -> (g (..., m), Hb (..., m, m), err (...)) where
    err is the weighted SE(3) residual norm.
    """
    model: KinematicModel = robot.model
    ee_idx = model.link_index(robot.link_name_ee)
    target_H = jnp.asarray(target_H)
    p_star = target_H[:3, 3]
    R_star = target_H[:3, :3]
    lam = 1.0 / (sigma_ee ** 2)

    ctrl = np.asarray(list(model.controlled_link_idxs()), np.int32)
    ancestry = jnp.asarray(model.ancestry_matrix()[ee_idx], jnp.float32)
    prism = model.prism_mask[ctrl]

    def terms(q):
        d = q.shape[-1]
        m = 2 * d
        R, t = fk_rot_trans(model, q)
        p_ee = t[..., ee_idx, :]
        R_ee = R[..., ee_idx, :, :]

        R_j = R[..., ctrl, :, :]
        t_j = t[..., ctrl, :]
        axis_j = model.joint_axis[ctrl]
        z_j = jnp.einsum("...ij,...j->...i", R_j, axis_j)    # (..., J, 3)
        in_lim = ((q >= model.clamp_lower[ctrl])
                  & (q <= model.clamp_upper[ctrl])).astype(q.dtype)
        mask = ancestry * in_lim                              # (..., J)

        # position rows: (..., 3, d)
        lin_rev = jnp.cross(z_j, p_ee[..., None, :] - t_j)
        lin = jnp.where(prism[..., None] > 0, z_j, lin_rev) * mask[..., None]
        J_pos = w_pos * jnp.swapaxes(lin, -1, -2)
        r_pos = w_pos * (p_ee - p_star)

        # rotation rows: dR_col_k/dq_j = z_j x R_col_k (revolute only)
        cols = jnp.swapaxes(R_ee, -1, -2)                     # (..., 3cols, 3)
        # (..., J, 3cols, 3): cross of z_j with each column
        dR = jnp.cross(z_j[..., :, None, :], cols[..., None, :, :])
        dR = dR * ((1.0 - prism)[..., None, None]
                   * mask[..., None, None])
        # residual vector r_rot: (..., 9); jacobian (..., 9, d)
        r_rot = w_rot * (cols - R_star.T).reshape(q.shape[:-1] + (9,))
        J_rot = w_rot * jnp.moveaxis(
            dR.reshape(q.shape[:-1] + (len(ctrl), 9)), -2, -1)

        r = jnp.concatenate([r_pos, r_rot], axis=-1)
        J = jnp.concatenate([J_pos, J_rot], axis=-2)

        g_q = lam * jnp.einsum("...pi,...p->...i", J, r)
        H_qq = lam * jnp.einsum("...pi,...pj->...ij", J, J)
        g = jnp.concatenate(
            [g_q, jnp.zeros(q.shape[:-1] + (m - d,), q.dtype)], axis=-1)
        top = jnp.concatenate(
            [H_qq, jnp.zeros(q.shape[:-1] + (d, m - d), q.dtype)], axis=-1)
        bot = jnp.zeros(q.shape[:-1] + (m - d, m), q.dtype)
        Hb = jnp.concatenate([top, bot], axis=-2)
        err = jnp.linalg.norm(r, axis=-1)
        return g, Hb, err

    return terms
