"""Lane-vectorized (structure-of-arrays) FK and Gauss-Newton terms.

TPU performance core.  Arrays with tiny trailing dims ((B, 3, 3) rotations,
(B, P, 3) points) get tile-padded 24-57x on TPU; this module instead carries
every scalar component as a (N,)-vector with the batch in the minor (lane)
dimension.  The FK chain, point Jacobians, SDF residuals and J^T J assembly
unroll into fused elementwise multiply-adds over (N,) lanes — zero padding,
pure VPU — and feed the lane-layout block-tridiagonal solver without any
transposes in between.

Semantics are identical to kin.fk + tasks.planning_task residuals; tests
assert exact equivalence.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kin.model import (JOINT_CONTINUOUS, JOINT_FIXED, JOINT_PRISMATIC,
                         JOINT_REVOLUTE, KinematicModel)

__all__ = ["fk_lanes", "fk_positions_lanes", "point_jacobians_lanes",
           "sdf_lanes", "obstacle_terms_lanes_factory"]

Vec3 = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]
Mat3 = Tuple[Vec3, Vec3, Vec3]


def _static_q_map(model: KinematicModel) -> List[int]:
    q_map, c = [], 0
    for t in model.joint_types:
        q_map.append(c if t != JOINT_FIXED else -1)
        if t != JOINT_FIXED:
            c += 1
    return q_map


def _matmul3(A: Mat3, B: Mat3) -> Mat3:
    return tuple(
        tuple(sum(A[i][k] * B[k][j] for k in range(3)) for j in range(3))
        for i in range(3))


def _matvec3(A: Mat3, v: Vec3) -> Vec3:
    return tuple(sum(A[i][k] * v[k] for k in range(3)) for i in range(3))


def _scalar_mat3(M) -> Mat3:
    """3x3 jnp array (traced scalars) -> nested tuple."""
    return tuple(tuple(M[i, j] for j in range(3)) for i in range(3))


def fk_lanes(model: KinematicModel, q_cols):
    """FK with batch in lanes.

    q_cols: (d, N) joint values.  Returns (R_w, t_w): lists over links of
    nested-tuple rotations / translation tuples, each entry an (N,) vector.
    Matches kin.fk.fk_rot_trans exactly (same clamping and composition).
    """
    N = q_cols.shape[-1]
    q_map = _static_q_map(model)
    ones = jnp.ones((N,), q_cols.dtype)

    R_w: List[Mat3] = [None] * model.n_links
    t_w: List[Vec3] = [None] * model.n_links
    for i in model.topological_order():
        jtype = model.joint_types[i]
        F = _scalar_mat3(model.joint_fixed_rot[i])
        trans = tuple(model.joint_trans[i, k] * ones for k in range(3))
        if jtype in (JOINT_REVOLUTE, JOINT_CONTINUOUS):
            qi = q_cols[q_map[i]]
            if jtype == JOINT_REVOLUTE:
                qi = jnp.clip(qi, model.clamp_lower[i], model.clamp_upper[i])
            c, s = jnp.cos(qi), jnp.sin(qi)
            ax, ay, az = (model.joint_axis[i, k] for k in range(3))
            one_c = 1.0 - c
            # Rodrigues: R = I + s K + (1-c) K^2 with K = skew(axis)
            R_j = (
                (1.0 + one_c * (ax * ax - 1.0),
                 -s * az + one_c * ax * ay,
                 s * ay + one_c * ax * az),
                (s * az + one_c * ax * ay,
                 1.0 + one_c * (ay * ay - 1.0),
                 -s * ax + one_c * ay * az),
                (-s * ay + one_c * ax * az,
                 s * ax + one_c * ay * az,
                 1.0 + one_c * (az * az - 1.0)),
            )
            R_loc = _matmul3(F, R_j)
        elif jtype == JOINT_PRISMATIC:
            qi = jnp.clip(q_cols[q_map[i]], model.clamp_lower[i],
                          model.clamp_upper[i])
            R_loc = tuple(tuple(F[r][c] * ones for c in range(3))
                          for r in range(3))
            trans = tuple(trans[k] + model.joint_axis[i, k] * qi
                          for k in range(3))
        else:  # fixed
            R_loc = tuple(tuple(F[r][c] * ones for c in range(3))
                          for r in range(3))

        p = model.parent_idx[i]
        if p < 0:
            R_w[i] = R_loc
            t_w[i] = trans
        else:
            R_w[i] = _matmul3(R_w[p], R_loc)
            tp = _matvec3(R_w[p], trans)
            t_w[i] = tuple(tp[k] + t_w[p][k] for k in range(3))
    return R_w, t_w


def fk_positions_lanes(model: KinematicModel, q, link_idxs=None,
                       extra_points=None):
    """World link positions via the lanes FK chain: q (..., n_dofs) ->
    (..., L [+ E], 3).

    Same values as kin.fk.fk_link_positions, but every intermediate of the
    compose chain is an (N,)-vector with the batch in the lane axis — the
    (B, 3, 3) rotation arrays of the AoS path tile-pad ~40x on TPU, so for
    position-only queries at large batch this is the fast path (measured
    43x at B=65536).  Only the final (L, 3, N) -> (..., L, 3) repack
    touches a padded layout, once.

    extra_points: optional list of (link_idx, (3,) local point) — each is
    transformed by that link's world frame and appended after the links
    (grasped-object collision points, robot_panda.py:155-168 semantics).
    """
    q = jnp.asarray(q)
    batch = q.shape[:-1]
    d = q.shape[-1]
    q_cols = q.reshape((-1, d)).T                       # (d, N)
    R_w, t_w = fk_lanes(model, q_cols)
    links = (list(range(model.n_links)) if link_idxs is None
             else [int(x) for x in np.asarray(link_idxs)])
    cols = [t_w[li] for li in links]
    for li, p in (extra_points or []):
        w = _matvec3(R_w[li], tuple(p[k] for k in range(3)))
        cols.append(tuple(w[k] + t_w[li][k] for k in range(3)))
    flat = jnp.stack([jnp.stack(c) for c in cols])      # (L+E, 3, N)
    return jnp.moveaxis(flat, -1, 0).reshape(batch + (len(cols), 3))


def fk_points_jacobians_lanes(model: KinematicModel, q, extra_points=None):
    """AoS-compatible (points (..., P, 3), J (..., P, 3, d)) computed via
    the lanes FK chain + lanes analytic point Jacobians.

    Same values as kin.fk.fk_rot_trans + kin.fk.point_jacobians (incl.
    clamped-joint column zeroing), but the whole chain runs with the batch
    in the lane axis; only the final repacks touch padded layouts, once.
    P = all links, plus optional ``extra_points`` [(link_idx, (3,) local
    point)] appended (grasped-object collision points).
    """
    q = jnp.asarray(q)
    batch = q.shape[:-1]
    d = q.shape[-1]
    q_cols = q.reshape((-1, d)).T                        # (d, N)
    R_w, t_w = fk_lanes(model, q_cols)
    pts = [t_w[li] for li in range(model.n_links)]
    link_ids = list(range(model.n_links))
    for li, p in (extra_points or []):
        w = _matvec3(R_w[li], tuple(p[k] for k in range(3)))
        pts.append(tuple(w[k] + t_w[li][k] for k in range(3)))
        link_ids.append(li)
    J = point_jacobians_lanes(model, R_w, t_w, pts, link_ids, q_cols=q_cols)
    zeros = jnp.zeros_like(q_cols[0])
    pts_flat = jnp.stack([jnp.stack(p) for p in pts])    # (P, 3, N)
    J_flat = jnp.stack([
        jnp.stack([
            jnp.stack([J[p][j][k] if J[p][j] is not None else zeros
                       for j in range(d)])               # (d, N)
            for k in range(3)])                          # (3, d, N)
        for p in range(len(pts))])                       # (P, 3, d, N)
    P = len(pts)
    pts_out = jnp.moveaxis(pts_flat, -1, 0).reshape(batch + (P, 3))
    J_out = jnp.moveaxis(J_flat, -1, 0).reshape(batch + (P, 3, d))
    return pts_out, J_out


def point_jacobians_lanes(model: KinematicModel, R_w, t_w, pts,
                          point_link_idx: Sequence[int], q_cols=None):
    """Analytic point Jacobians in lanes layout.

    pts: list over P of Vec3 world points; point_link_idx: owning link ids.
    If ``q_cols`` (d, N) is given, columns of joints clamped at their limits
    are zeroed (d/dq of the clamped FK chain).
    Returns J: list over P of (3, n_dofs) nested lists of (N,) vectors
    (None entries = structurally zero).
    """
    ctrl = list(model.controlled_link_idxs())
    q_map = _static_q_map(model)
    ancestry = model.ancestry_matrix()
    # world joint axes (masked by clamp activation)
    z = []
    for li in ctrl:
        axis = tuple(model.joint_axis[li, k] for k in range(3))
        zi = _matvec3(R_w[li], axis)
        if q_cols is not None:
            qj = q_cols[q_map[li]]
            in_lim = ((qj >= model.clamp_lower[li])
                      & (qj <= model.clamp_upper[li])).astype(qj.dtype)
            zi = tuple(c * in_lim for c in zi)
        z.append(zi)
    prism = [model.joint_types[li] == JOINT_PRISMATIC for li in ctrl]

    J = []
    for p_vec, link in zip(pts, point_link_idx):
        cols = []
        anc = ancestry[link]
        for j, li in enumerate(ctrl):
            if not anc[j]:
                cols.append(None)
                continue
            if prism[j]:
                cols.append(z[j])
            else:
                dx = tuple(p_vec[k] - t_w[li][k] for k in range(3))
                zx, zy, zz = z[j]
                cols.append((zy * dx[2] - zz * dx[1],
                             zz * dx[0] - zx * dx[2],
                             zx * dx[1] - zy * dx[0]))
        J.append(cols)
    return J


def _group_sdf_lanes(group, x):
    """SDF of one primitive group in SoA: x tuple of dim (N,) comps -> (N,).

    Batched over the primitive count as (n_prim, N) broadcasts with the
    lanes minor (measured 2.7x the per-primitive unrolled chain at the
    bench shapes — the min-chain over primitives fused poorly); values and
    vjp gradients are bitwise identical to the unrolled form and to
    geom.sdf.{Spheres,SharpBoxes,RoundedBoxes}.signed_distance.
    """
    from ..geom.sdf import RoundedBoxes, SharpBoxes, Spheres
    dim = len(x)
    if isinstance(group, Spheres):
        d2 = None
        for k in range(dim):
            t = jnp.square(x[k][None, :] - group.centers[:, k:k + 1])
            d2 = t if d2 is None else d2 + t
        nz = d2 > 0
        dist = jnp.where(nz, jnp.sqrt(jnp.where(nz, d2, 1.0)), 0.0)
        return jnp.min(dist - group.radii[:, None], axis=0)
    if isinstance(group, RoundedBoxes):
        q = [jnp.abs(x[k][None, :] - group.centers[:, k:k + 1])
             - group.half_sizes[:, k:k + 1] + group.round_radii[:, None]
             for k in range(dim)]
        max_q = q[0]
        for qk in q[1:]:
            max_q = jnp.maximum(max_q, qk)
        n2 = None
        for qk in q:
            t = jnp.square(jax.nn.relu(qk))
            n2 = t if n2 is None else n2 + t
        nz = n2 > 0
        norm = jnp.where(nz, jnp.sqrt(jnp.where(nz, n2, 1.0)), 0.0)
        s = jnp.minimum(max_q, 0.0) + norm - group.round_radii[:, None]
        return jnp.min(s, axis=0)
    if isinstance(group, SharpBoxes):
        s = None
        for k in range(dim):
            t = (jnp.abs(x[k][None, :] - group.centers[:, k:k + 1])
                 - group.half_sizes[:, k:k + 1])
            s = t if s is None else jnp.maximum(s, t)
        return jnp.min(s, axis=0)
    raise NotImplementedError(type(group))


def _object_sdf_lanes(obj, pts3):
    """Posed ObjectField SDF in SoA (mirrors ObjectField.signed_distance)."""
    dim = obj.dim
    # lift 2-D queries with z = 0, pull back into the object frame
    x3 = list(pts3) + [jnp.zeros_like(pts3[0])] * (3 - dim)
    from ..core.quaternion import q_to_rotation_matrix
    Rm = q_to_rotation_matrix(obj.ori)
    # x' = R^T (x - pos)
    dxyz = [x3[k] - obj.pos[k] for k in range(3)]
    x_obj = tuple(sum(Rm[k, i] * dxyz[k] for k in range(3))
                  for i in range(3))[:dim]
    out = None
    for f in obj.fields:
        s = _group_sdf_lanes(f, x_obj)
        out = s if out is None else jnp.minimum(out, s)
    return out


def sdf_lanes(df_obj_list, pts3):
    """Min-over-objects SDF of lane-layout points: pts3 tuple of (N,) comps.

    Fully SoA — every intermediate is an (N,)-vector, no (N, 3) reshapes.
    """
    from ..geom.grid_sdf import GridSDF
    sdf = None
    for df in df_obj_list:
        if isinstance(df, GridSDF):
            s = _grid_sdf_value_lanes(df, pts3)
        else:
            s = _object_sdf_lanes(df, pts3)
        sdf = s if sdf is None else jnp.minimum(sdf, s)
    return sdf


def _grid_cell_index(grid, pts3):
    """Flat nearest-cell index of lane-layout points (reference indexing,
    grid_map_sdf.py:93-97)."""
    dim = grid.dim
    cmap = grid.cmap_dim
    idxs = []
    for k in range(dim):
        extent = jnp.abs(grid.limits[1, k] - grid.limits[0, k])
        ik = jnp.floor((pts3[k] - grid.limits[0, k]) / extent
                       * cmap[k]).astype(jnp.int32)
        idxs.append(jnp.clip(ik, 0, cmap[k] - 1))
    flat = idxs[0]
    for k in range(1, dim):
        flat = flat * cmap[k] + idxs[k]
    return flat


def _grid_sdf_lanes(grid, pts3):
    """GridSDF nearest-cell lookup in SoA: returns (value (N,), grad tuple).

    Same indexing + surrogate-gradient semantics as GridSDF.signed_distance
    (geom/grid_sdf.py): value = cell SDF, gradient = cell gradient.

    TPU gathers on this toolchain run at a flat ~11 ns/ROW independent of
    table size and row width up to 8 channels (micro-bench in git history /
    CLAUDE.md), so [sdf, grad] are packed into ONE (C, 1+dim) row gather —
    measured 4.7x over per-component gathers (the strided grad-column
    gathers were the pathology).  The packed table is loop-invariant, so
    XLA hoists its construction out of solver scans.
    """
    dim = grid.dim
    flat = _grid_cell_index(grid, pts3)
    packed = jnp.concatenate(
        [grid.sdf_grid.reshape(-1, 1), grid.grad_grid.reshape(-1, dim)],
        axis=-1)                                        # (C, 1 + dim)
    rows = packed[flat]                                 # (N, 1 + dim)
    val = rows[:, 0]
    grad = tuple(rows[:, 1 + k] for k in range(dim))
    if dim == 2:
        grad = grad + (jnp.zeros_like(grad[0]),)
    return val, grad


def _grid_sdf_value_lanes(grid, pts3):
    """Value-only nearest-cell lookup (single flat gather)."""
    flat = _grid_cell_index(grid, pts3)
    return grid.sdf_grid.reshape(-1)[flat]


def _grid_sdf_lanes_multi(grid, pts_list):
    """Packed-row (sdf, grad) lookup for a LIST of lane-layout points in
    ONE gather: P points of (N,) lanes -> vals (P, N), grads (P, dim, N).

    TPU gathers run at a flat ~7-11 ns/row regardless of row width
    (CLAUDE.md lesson 12), so batching all P points' indices into a single
    (P*N, 1+dim) row gather costs the same per row as the per-point form
    but issues once — this is the XLA stage of the grid-scene fused-terms
    split pipeline (ops/pallas_terms.py): the gather stays in XLA (Mosaic
    has no vector gather), the hinge+assembly tail runs in the kernel.
    """
    dim = grid.dim
    P = len(pts_list)
    N = pts_list[0][0].shape[-1]
    flat = jnp.stack([_grid_cell_index(grid, p) for p in pts_list])  # (P, N)
    packed = jnp.concatenate(
        [grid.sdf_grid.reshape(-1, 1), grid.grad_grid.reshape(-1, dim)],
        axis=-1)                                        # (C, 1 + dim)
    rows = packed[flat.reshape(-1)].reshape(P, N, 1 + dim)
    vals = rows[:, :, 0]                                # (P, N)
    grads = jnp.moveaxis(rows[:, :, 1:], -1, 1)         # (P, dim, N)
    return vals, grads


def _grid_sdf_value_lanes_multi(grid, pts_list):
    """Value-only variant of ``_grid_sdf_lanes_multi``: (P, N) SDF values
    via one flat gather (the forward-only cost kernel's XLA stage)."""
    flat = jnp.stack([_grid_cell_index(grid, p) for p in pts_list])
    return grid.sdf_grid.reshape(-1)[flat.reshape(-1)].reshape(flat.shape)


def sdf_and_grad_lanes(df_obj_list, pts3, ws_dim):
    """(min-over-objects SDF, its gradient) in SoA.

    Analytic fields use one reverse sweep each; GridSDF uses the closed-form
    surrogate gradient.  The gradient of the min selects per-element.
    """
    from ..geom.grid_sdf import GridSDF
    best_val, best_grad = None, None
    for df in df_obj_list:
        if isinstance(df, GridSDF):
            val, grad = _grid_sdf_lanes(df, pts3)
            grad = grad[:ws_dim]
        else:
            val, vjp = jax.vjp(lambda xyz: _object_sdf_lanes(df, xyz), pts3)
            grad = vjp(jnp.ones_like(val))[0]
        if best_val is None:
            best_val, best_grad = val, list(grad)
        else:
            take = val < best_val
            best_grad = [jnp.where(take, g_new, g_old)
                         for g_new, g_old in zip(grad, best_grad)]
            best_val = jnp.minimum(best_val, val)
    return best_val, tuple(best_grad)


def lanes_supported_scene(df_obj_list) -> bool:
    from ..geom.grid_sdf import GridSDF
    from ..geom.sdf import ObjectField
    return all(isinstance(df, (ObjectField, GridSDF)) for df in df_obj_list)


def _member_lanes_points(r, q_cols_i, Rb, tb):
    """FK + world-frame transforms for one multi-robot member.

    r: member robot (has .model); q_cols_i (d_i, N); Rb nested-tuple base
    rotation; tb base translation tuple.  Returns (R_wW, t_wW) world link
    frames, and the member's (obj_pts, self_pts, all link ids) in its
    fk_map_collision layout.
    """
    R_w, t_w = fk_lanes(r.model, q_cols_i)
    R_wW = [_matmul3(Rb, R) for R in R_w]
    t_wW = []
    for t in t_w:
        tw = _matvec3(Rb, t)
        t_wW.append(tuple(tw[k] + tb[k] for k in range(3)))

    def grasped(section_ids):
        pts_g, ids_g = [], []
        if getattr(r, "grasped_n_points", 0) > 0:
            gi = r.model.link_index(r.link_name_grasped_object)
            for g in range(r.grasped_n_points):
                gp = tuple(r.grasped_points[g, k] for k in range(3))
                world = _matvec3(R_wW[gi], gp)
                pts_g.append(tuple(world[k] + t_wW[gi][k] for k in range(3)))
                ids_g.append(gi)
        return pts_g, ids_g

    obj_pts = [t_wW[li] for li in r.object_coll_idxs]
    obj_ids = list(r.object_coll_idxs)
    g_pts, g_ids = grasped(obj_ids)
    obj_pts += g_pts
    obj_ids += g_ids

    self_pts, self_ids = [], []
    if r.self_coll_idxs:
        self_pts = [t_wW[li] for li in r.self_coll_idxs]
        self_ids = list(r.self_coll_idxs)
        g_pts, g_ids = grasped(self_ids)
        self_pts += g_pts
        self_ids += g_ids
    return R_wW, t_wW, obj_pts, obj_ids, self_pts, self_ids


def obstacle_terms_lanes_factory(task):
    """Build the lane-layout Gauss-Newton obstacle-terms function for a task.

    Returns f(q_cols (d, N), lam) -> (g (m, N), Hb (m, m, N), cost (N,)), or
    None if the task/robot combination has no lanes fast path (no kinematic
    model SoA support, grid SDFs are fine).  Residual semantics identical to
    PlanningTask.collision_residuals.
    """
    robot = task.robot
    from ..robots import RobotPointMass
    from ..robots.multi_robot import MultiRobot
    df_obj_list = task.df_obj_list
    cutoff = task.obstacle_cutoff_margin
    ws_min = task.ws_min
    ws_max = task.ws_max
    d = robot.q_dim
    m = 2 * d

    if isinstance(robot, RobotPointMass):
        def pts_jac_fn(q_cols):
            pts = [tuple(q_cols[k] for k in range(d))]
            eye_cols = [[tuple((jnp.full_like(q_cols[0], 1.0) if k == j
                                else jnp.zeros_like(q_cols[0]))
                               for k in range(d))
                         for j in range(d)]]
            return pts, eye_cols, [0]
        ws_dim = d
    elif isinstance(robot, MultiRobot):
        # every member needs a compiled KinematicModel for the lanes FK
        if not all(hasattr(r, "model") for r in robot.robots):
            return None
        if _MULTIROBOT_STRUCTURED:
            # block-structured fast path (member-width Jacobians, per-block
            # Hessian reduction); this padded generic branch is kept for
            # the A/B benchmark AND as the fallback when the structured
            # assembly declines the pair list (same-member mutual pairs)
            t = obstacle_terms_lanes_multirobot_factory(task, strict=False)
            if t is not None:
                return t
        members = robot.robots
        d_offsets = np.cumsum([0] + [r.q_dim for r in members])

        def pts_jac_fn(q_cols):
            obj_pts, self_pts = [], []
            obj_cols, self_cols = [], []
            for i, r in enumerate(members):
                lo, hi = int(d_offsets[i]), int(d_offsets[i + 1])
                q_i = q_cols[lo:hi]
                Rb = _scalar_mat3(robot.base_rots[i])
                tb = tuple(robot.base_trans[i, k] for k in range(3))
                (R_wW, t_wW, m_obj_pts, m_obj_ids,
                 m_self_pts, m_self_ids) = _member_lanes_points(
                    r, q_i, Rb, tb)
                all_pts = m_obj_pts + m_self_pts
                all_ids = m_obj_ids + m_self_ids
                J_i = point_jacobians_lanes(r.model, R_wW, t_wW, all_pts,
                                            all_ids, q_cols=q_i)
                # embed member columns block-diagonally into d_total
                pad_l = [None] * lo
                pad_r = [None] * (d - hi)
                J_full = [pad_l + cols + pad_r for cols in J_i]
                n_obj = len(m_obj_pts)
                obj_pts += m_obj_pts
                obj_cols += J_full[:n_obj]
                self_pts += m_self_pts
                self_cols += J_full[n_obj:]
            # fk_map_collision layout: [obj_0..obj_n, self_0..self_n]
            return (obj_pts + self_pts, obj_cols + self_cols,
                    list(range(len(obj_pts) + len(self_pts))))
        ws_dim = 3
    elif hasattr(robot, "model") and not robot.object_interpolate:
        # any single-model kinematic robot whose collision points are link
        # origins (+ grasped points): Panda, UR10/KinematicRobot, …
        # (robots with interpolated collision points, e.g. Planar2Link,
        # stay on the batched analytic-Jacobian path)
        model = robot.model
        obj_idxs = list(robot.object_coll_idxs)
        self_idxs = (list(robot.self_coll_idxs)
                     if robot.self_coll_idxs else [])
        used_links = sorted(set(obj_idxs + self_idxs))

        def pts_jac_fn(q_cols):
            R_w, t_w = fk_lanes(model, q_cols)
            pts_all = {li: t_w[li] for li in used_links}
            link_ids = used_links
            pts = [pts_all[li] for li in link_ids]
            if robot.grasped_n_points > 0:
                gi = model.link_index(robot.link_name_grasped_object)
                for g in range(robot.grasped_n_points):
                    gp = tuple(robot.grasped_points[g, k] for k in range(3))
                    world = _matvec3(R_w[gi], gp)
                    pts.append(tuple(world[k] + t_w[gi][k] for k in range(3)))
                link_ids = link_ids + [gi] * robot.grasped_n_points
            J = point_jacobians_lanes(model, R_w, t_w, pts, link_ids,
                                      q_cols=q_cols)
            return pts, J, link_ids
        ws_dim = 3
    else:
        return None

    pair_idxs = (np.asarray(robot.self_pair_idxs)
                 if robot.self_pair_idxs is not None else None)

    # map link index -> position in the pts list (built statically per robot)
    if isinstance(robot, RobotPointMass):
        obj_pts_pos = [0]
        self_pts_pos = None
        grasped_pos = []
    elif isinstance(robot, MultiRobot):
        # the pts list IS the fk_map_collision layout; object points are the
        # leading obj sections, and self_pair_idxs address the full layout
        n_obj_total = sum(
            int(r.object_margins.shape[0]) for r in robot.robots)
        obj_pts_pos = list(range(n_obj_total))
        n_self_total = sum(
            (len(r.self_coll_idxs) + getattr(r, "grasped_n_points", 0))
            if r.self_coll_idxs else 0 for r in robot.robots)
        self_pts_pos = list(range(n_obj_total + n_self_total))
    else:
        used_links = sorted(set(list(robot.object_coll_idxs)
                                + list(robot.self_coll_idxs or [])))
        link_to_pos = {li: i for i, li in enumerate(used_links)}
        obj_pts_pos = [link_to_pos[li] for li in robot.object_coll_idxs]
        n_used = len(used_links)
        grasped_pos = list(range(n_used, n_used + robot.grasped_n_points))
        obj_pts_pos = obj_pts_pos + grasped_pos
        if robot.self_coll_idxs:
            self_pts_pos = ([link_to_pos[li] for li in robot.self_coll_idxs]
                            + grasped_pos)
        else:
            self_pts_pos = None

    obj_margins = task.robot.object_margins
    self_margins = getattr(task.robot, "self_margins", None)
    # learned self-collision net replaces the pair rows (robot_panda.py:131)
    self_net = getattr(robot, "self_collision_net", None)
    if self_net is not None:
        self_pts_pos = None
    net_cutoff = getattr(task, "_NET_SELF_CUTOFF", 0.001)

    obj_pts_pos_np = np.asarray(obj_pts_pos, np.int32)

    # --- chain-depth (prefix) column-support structure -------------------
    # On a serial chain, a collision point at link L has structurally zero
    # Jacobian columns for every joint past L.  With rows depth-ASCENDING
    # inside each residual part, the per-column g/H reduces only need the
    # SUFFIX of rows whose chain reaches that column: 252 -> 112
    # multiply-reduce elements for the Panda Hessian (2.25x).  part-depth
    # None = no structure (dense, start 0 for every column).
    pts_supp = None
    if (not isinstance(robot, (RobotPointMass, MultiRobot))
            and hasattr(robot, "model")):
        anc = np.asarray(robot.model.ancestry_matrix())

        def _supp(link):
            row = np.asarray(anc[link]).astype(bool)
            k = int(row.sum())
            return k if bool(row[:k].all()) else None   # prefix supports only

        supp_list, ok = [], True
        for li in used_links:
            s = _supp(li)
            ok = ok and s is not None
            supp_list.append(s)
        if robot.grasped_n_points > 0:
            gi = robot.model.link_index(robot.link_name_grasped_object)
            s = _supp(gi)
            ok = ok and s is not None
            supp_list += [s] * robot.grasped_n_points
        if ok:
            obj_depth_seq = [supp_list[p] for p in obj_pts_pos]
            if all(a <= b for a, b in
                   zip(obj_depth_seq, obj_depth_seq[1:])):
                pts_supp = supp_list

    obj_part_depth = (np.asarray([pts_supp[p] for p in obj_pts_pos])
                      if pts_supp is not None else None)
    pair_a_pos = pair_b_pos = pair_depth = pair_perm = None
    if self_pts_pos is not None and pair_idxs is not None \
            and len(pair_idxs) > 0:
        pair_a_pos = np.asarray([self_pts_pos[ia] for ia, _ in pair_idxs],
                                np.int32)
        pair_b_pos = np.asarray([self_pts_pos[ib] for _, ib in pair_idxs],
                                np.int32)
        if pts_supp is not None:
            dep = np.maximum(
                np.asarray([pts_supp[p] for p in pair_a_pos]),
                np.asarray([pts_supp[p] for p in pair_b_pos]))
            pair_perm = np.argsort(dep, kind="stable").astype(np.int32)
            pair_a_pos = pair_a_pos[pair_perm]
            pair_b_pos = pair_b_pos[pair_perm]
            pair_depth = dep[pair_perm]

    def _col_starts(depths):
        """starts[j] = first row (depth-ascending) whose chain reaches
        column j; None depths -> all zeros (dense)."""
        if depths is None:
            return None
        return [int(np.searchsorted(depths, j + 1)) for j in range(d)]

    obj_starts = _col_starts(obj_part_depth)
    pair_starts = _col_starts(pair_depth)

    def terms(q_cols, lam, h=None):
        """q_cols (d, N) -> GN obstacle terms.

        h=None: lanes-minor outputs g (m, N), Hb (m, m, N), cost (N,).
        h=H (with N = H * B, h-major lane order): emits the solver layout
        g (H, m, B), Hb (H, m, m, B), cost (H, B) DIRECTLY from the final
        einsums, skipping the (m, m, H, B) -> (H, m, m, B) transpose of
        the 51 MB Hessian-block array between assembly and the solver
        scan (measured +2% end-to-end at B=1024; fetch-forced timing
        shows the solver scan itself, not the transpose, dominates).
        """
        dtype = q_cols.dtype
        N = q_cols.shape[-1]
        pts, J, _ = pts_jac_fn(q_cols)
        P_pts = len(pts)
        zeros_N = jnp.zeros((N,), dtype)

        # stack points (ws_dim, P, N) and Jacobians (P, d, ws_dim, N) once;
        # downstream work is a handful of einsums with the batch minor.
        pts_arr = jnp.stack([jnp.stack([pts[p][k] for p in range(P_pts)])
                             for k in range(ws_dim)])
        J_arr = jnp.stack([
            jnp.stack([
                jnp.stack([J[p][j][k] if J[p][j] is not None else zeros_N
                           for k in range(ws_dim)])
                for j in range(d)])
            for p in range(P_pts)])

        r_parts, Jr_parts, part_starts = [], [], []

        def contract_ws(grad, J_sub):
            """sum_k grad[k] * J_sub[..., k, :]: (ws_dim, P, N) x
            (P, d, ws_dim, N) -> (P, d, N).  Unrolled over ws_dim — einsum
            here lowers to dot_general batched on the lane axis, whose
            B-major TPU output layout forces a transpose per call."""
            s = grad[0][:, None, :] * J_sub[:, :, 0, :]
            for k in range(1, J_sub.shape[2]):
                s = s + grad[k][:, None, :] * J_sub[:, :, k, :]
            return s

        def hinge_rows(margins_vec, val, grad, J_sub, starts=None):
            """val (P?, N), grad (ws_dim, P?, N), J_sub (P?, d, ws_dim, N)."""
            r = jax.nn.relu(margins_vec[:, None] + cutoff - val)
            act = (r > 0).astype(dtype)
            Jr = -act[:, None, :] * contract_ws(grad, J_sub)
            r_parts.append(r)
            Jr_parts.append(Jr)
            part_starts.append(starts)

        obj_pts_sub = pts_arr[:, obj_pts_pos_np]          # (ws_dim, P_obj, N)
        J_obj_sub = J_arr[obj_pts_pos_np]                 # (P_obj, d, ws_dim, N)

        # --- objects: one stacked SDF evaluation (+ gradient) ---
        if df_obj_list:
            P_obj = obj_pts_sub.shape[1]
            flat = tuple(obj_pts_sub[k].reshape(P_obj * N)
                         for k in range(ws_dim))
            val_flat, grad_flat = sdf_and_grad_lanes(df_obj_list, flat,
                                                     ws_dim)
            val = val_flat.reshape(P_obj, N)
            grad = jnp.stack([g.reshape(P_obj, N) for g in grad_flat])
            hinge_rows(obj_margins, val, grad, J_obj_sub, obj_starts)

        # --- workspace bounds: closed-form min-face distance + gradient ---
        d_lo = obj_pts_sub - jnp.asarray(ws_min, dtype)[:, None, None]
        d_hi = jnp.asarray(ws_max, dtype)[:, None, None] - obj_pts_sub
        faces = jnp.concatenate([d_lo, d_hi], axis=0)     # (2*ws_dim, P, N)
        val_ws = jnp.min(faces, axis=0)
        amin = jnp.argmin(faces, axis=0)                  # (P, N)
        # grad of min-face distance: +e_k for a low face, -e_k for a high face
        sign = jnp.where(amin < ws_dim, 1.0, -1.0).astype(dtype)
        axis_id = jnp.where(amin < ws_dim, amin, amin - ws_dim)
        grad_ws = jnp.stack([sign * (axis_id == k).astype(dtype)
                             for k in range(ws_dim)])     # (ws_dim, P, N)
        hinge_rows(obj_margins, val_ws, grad_ws, J_obj_sub, obj_starts)

        # --- self-collision pairs (depth-sorted static index arrays) ---
        if pair_a_pos is not None:
            margins_p = (self_margins[jnp.asarray(pair_perm)]
                         if pair_perm is not None else self_margins)
            diff = pts_arr[:, pair_a_pos] - pts_arr[:, pair_b_pos]
            d2 = jnp.sum(jnp.square(diff), axis=0)
            nz = d2 > 0
            dist = jnp.where(nz, jnp.sqrt(jnp.where(nz, d2, 1.0)), 0.0)
            inv = jnp.where(nz, 1.0 / jnp.maximum(dist, 1e-9), 0.0)
            u = diff * inv[None]                          # (3, K, N)
            r_s = jax.nn.relu(margins_p[:, None] - dist)
            act = (r_s > 0).astype(dtype)
            J_d = J_arr[pair_a_pos] - J_arr[pair_b_pos]   # (K, d, 3, N)
            Jr_s = -act[:, None, :] * contract_ws(u, J_d)
            r_parts.append(r_s)
            Jr_parts.append(Jr_s)
            part_starts.append(pair_starts)

        # --- learned self-collision net (one residual row per waypoint) ---
        if self_net is not None:
            q_rows = q_cols.T                             # (N, d) MXU matmuls
            sd, vjp = jax.vjp(self_net.signed_distance, q_rows)
            g_net = vjp(jnp.ones_like(sd))[0]             # (N, d)
            r_n = jax.nn.relu(net_cutoff - sd)
            act_n = (r_n > 0).astype(dtype)
            r_parts.append(r_n[None])
            Jr_parts.append((-act_n[:, None] * g_net).T[None])
            part_starts.append(None)

        # --- assembly: per-part suffix-sliced reduces (J^T r, J^T J as
        # unrolled reduce-over-rows of elementwise products — einsum lowers
        # to a lane-batched dot_general whose B-major output forces a
        # transpose; see solver history in CLAUDE.md).  starts[j] skips the
        # rows whose chain never reaches column j ---
        if _ASSEMBLY_BARRIER:
            # materialize the residual rows ONCE before the d(d+3)/2 + 1
            # reduces: without the barrier XLA fuses the per-point
            # hinge/Jacobian chains into every consuming reduce and
            # re-computes them up to ~36x (measured: the reduces from
            # materialized rows run at one-HBM-pass speed, 0.055 ms at
            # N=65k, while the fused-in-context assembly stage measured
            # ~2.6 ms)
            flat = jax.lax.optimization_barrier(
                tuple(r_parts) + tuple(Jr_parts))
            r_parts = list(flat[:len(r_parts)])
            Jr_parts = list(flat[len(r_parts):])
        if h is not None:
            Bl = N // h
            parts = [(r.reshape(-1, h, Bl),
                      Jr.reshape(-1, d, h, Bl), st)
                     for r, Jr, st in zip(r_parts, Jr_parts, part_starts)]
            stack_g, stack_h = 1, 1
            zero_ent = jnp.zeros((h, Bl), dtype)
        else:
            parts = list(zip(r_parts, Jr_parts, part_starts))
            stack_g, stack_h = 0, 0
            zero_ent = jnp.zeros((N,), dtype)

        def red_g(j):
            acc = None
            for r_p, Jr_p, st in parts:
                s = 0 if st is None else st[j]
                if s >= r_p.shape[0]:
                    continue
                t = jnp.sum(r_p[s:] * Jr_p[s:, j], axis=0)
                acc = t if acc is None else acc + t
            return zero_ent if acc is None else acc

        def red_h(i, j):
            k = max(i, j)
            acc = None
            for _, Jr_p, st in parts:
                s = 0 if st is None else st[k]
                if s >= Jr_p.shape[0]:
                    continue
                t = jnp.sum(Jr_p[s:, i] * Jr_p[s:, j], axis=0)
                acc = t if acc is None else acc + t
            return zero_ent if acc is None else acc

        g_cols = [red_g(j) for j in range(d)]
        H_rows = []
        for i in range(d):
            row = []
            for j in range(d):
                row.append(H_rows[j][i] if j < i else red_h(i, j))
            H_rows.append(row)
        cost = 0.5 * lam * sum(
            jnp.sum(jnp.square(r_p), axis=0) for r_p, _, _ in parts)

        if h is not None:
            g_q = lam * jnp.stack(g_cols, axis=stack_g)            # (h, d, B)
            H_qq = lam * jnp.stack(
                [jnp.stack(row, axis=stack_h) for row in H_rows], axis=1)
            g = jnp.concatenate(
                [g_q, jnp.zeros((h, m - d, Bl), dtype)], axis=1)
            top = jnp.concatenate(
                [H_qq, jnp.zeros((h, d, m - d, Bl), dtype)], axis=2)
            bot = jnp.zeros((h, m - d, m, Bl), dtype)
            return g, jnp.concatenate([top, bot], axis=1), cost

        g_q = lam * jnp.stack(g_cols)
        H_qq = lam * jnp.stack([jnp.stack(row) for row in H_rows])
        # embed into the full state dimension (zeros on the velocity part)
        g = jnp.concatenate([g_q, jnp.zeros((m - d, N), dtype)], axis=0)
        top = jnp.concatenate([H_qq, jnp.zeros((d, m - d, N), dtype)], axis=1)
        bot = jnp.zeros((m - d, m, N), dtype)
        Hb = jnp.concatenate([top, bot], axis=0)
        return g, Hb, cost

    return terms


# structured MultiRobot terms (below) vs the padded generic path above;
# flipped by the A/B benchmark only
_MULTIROBOT_STRUCTURED = True

# materialize residual rows once before the GN reduces (see the barrier
# comment in obstacle_terms_lanes_factory.terms); flipped for A/B only
_ASSEMBLY_BARRIER = True


def obstacle_terms_lanes_multirobot_factory(task, strict=True):
    """Block-structured GN obstacle terms for a ``MultiRobot`` task.

    ``strict``: a same-member mutual pair (unsupported by this assembly)
    raises when True (the direct/forced-path contract); with False the
    factory warns and returns None so ``obstacle_terms_lanes_factory`` can
    fall back to the generic padded assembly, which handles i == j
    correctly — task construction with a custom pair list keeps working at
    the cost of the fast path.

    The generic path pads every collision point's Jacobian to the full
    d_total columns (config 4: 2/3 structural zeros — each point moves with
    exactly one member arm) and reduces all d^2/2 Hessian entries over ALL
    residual rows.  This path keeps per-member residual rows at member
    width d_i and reduces each Hessian BLOCK only over the rows that touch
    it: member rows (object SDF + workspace + own self pairs) contribute
    only to the diagonal block H_ii, and each mutual pair group (i, j)
    contributes to H_ii, H_jj and the single cross block H_ij.  At the
    3-arm (7, 7, 6) shape this is ~2.9x fewer multiply-reduce elements.

    Same output contract as ``obstacle_terms_lanes_factory``'s terms fn.
    """
    robot = task.robot
    from ..robots.multi_robot import MultiRobot
    if not isinstance(robot, MultiRobot):
        return None
    if not all(hasattr(r, "model") for r in robot.robots):
        return None
    members = robot.robots
    n_mem = len(members)
    df_obj_list = task.df_obj_list
    cutoff = task.obstacle_cutoff_margin
    ws_min = task.ws_min
    ws_max = task.ws_max
    d_list = [r.q_dim for r in members]
    d_off = np.cumsum([0] + d_list)
    d = robot.q_dim
    m = 2 * d
    obj_counts = list(robot.obj_counts)
    self_counts = list(robot.self_counts)
    n_obj_total = sum(obj_counts)
    obj_offsets = np.cumsum([0] + obj_counts)
    self_offsets = n_obj_total + np.cumsum([0] + self_counts)

    # classify the robot's pair list (order matches robot.self_margins):
    # own pairs index a member's self section; mutual pairs index two
    # members' object sections
    all_margins = np.asarray(robot.self_margins)
    own_pairs = [[] for _ in range(n_mem)]       # (a_local, b_local, margin)
    mutual_groups = {}                           # (i, j) -> list of rows
    for p_idx, (pa, pb) in enumerate(robot.self_pair_idxs or ()):
        mg = float(all_margins[p_idx])
        if pa >= n_obj_total:
            k = int(np.searchsorted(self_offsets, pa, side="right")) - 1
            own_pairs[k].append((pa - self_offsets[k], pb - self_offsets[k],
                                 mg))
        else:
            i = int(np.searchsorted(obj_offsets, pa, side="right")) - 1
            j = int(np.searchsorted(obj_offsets, pb, side="right")) - 1
            if i == j:
                # the assembly below assumes each mutual group spans TWO
                # members (the 'elif b == i' gradient branch and the
                # cross-block stitch are wrong for i == j); same-member
                # pairs belong in the member's self section
                msg = ("mutual pair (%d, %d) indexes object points of the "
                       "same member %d; encode same-member pairs via the "
                       "member's self-collision section instead"
                       % (pa, pb, i))
                if strict:
                    raise ValueError(msg)
                # task-construction path: the generic padded assembly is
                # correct for i == j — lose only the structured fast path
                import warnings
                warnings.warn(msg + " (falling back to the generic padded "
                              "assembly)", stacklevel=2)
                return None
            mutual_groups.setdefault((i, j), []).append(
                (pa - obj_offsets[i], pb - obj_offsets[j], mg))

    obj_margins_np = [np.asarray(r.object_margins) for r in members]
    ws_min_np = np.asarray(ws_min, np.float32)
    ws_max_np = np.asarray(ws_max, np.float32)

    def terms(q_cols, lam, h=None):
        """q_cols (d, N) -> (g (m, N), Hb (m, m, N), cost (N,)); with h=H
        (N = H * B, h-major lanes) emits the solver layout g (H, m, B),
        Hb (H, m, m, B), cost (H, B) like the generic path."""
        dtype = q_cols.dtype
        N = q_cols.shape[-1]
        zeros_N = jnp.zeros((N,), dtype)

        # --- per-member FK + member-width point Jacobians ---
        pts_list, J_list = [], []
        for i, r in enumerate(members):
            lo, hi = int(d_off[i]), int(d_off[i + 1])
            q_i = q_cols[lo:hi]
            Rb = _scalar_mat3(robot.base_rots[i])
            tb = tuple(robot.base_trans[i, k] for k in range(3))
            (R_wW, t_wW, m_obj_pts, m_obj_ids,
             m_self_pts, m_self_ids) = _member_lanes_points(r, q_i, Rb, tb)
            all_pts = m_obj_pts + m_self_pts
            all_ids = m_obj_ids + m_self_ids
            J_i = point_jacobians_lanes(r.model, R_wW, t_wW, all_pts,
                                        all_ids, q_cols=q_i)
            P_i = len(all_pts)
            d_i = d_list[i]
            pts_list.append(jnp.stack(
                [jnp.stack([all_pts[p][k] for p in range(P_i)])
                 for k in range(3)]))                   # (3, P_i, N)
            J_list.append(jnp.stack([
                jnp.stack([
                    jnp.stack([J_i[p][j][k] if J_i[p][j] is not None
                               else zeros_N for k in range(3)])
                    for j in range(d_i)])
                for p in range(P_i)]))                  # (P_i, d_i, 3, N)

        def contract_ws3(grad, J_sub):
            """(3, K, N) x (K, d_i, 3, N) -> (K, d_i, N), unrolled (see
            the generic path: lane-batched dot_general forces transposes)."""
            s = grad[0][:, None, :] * J_sub[:, :, 0, :]
            for k in range(1, 3):
                s = s + grad[k][:, None, :] * J_sub[:, :, k, :]
            return s

        # --- one stacked SDF evaluation over every member's object points ---
        sdf_val_by_mem = [None] * n_mem
        sdf_grad_by_mem = [None] * n_mem
        if df_obj_list:
            obj_cat = jnp.concatenate(
                [pts_list[i][:, :obj_counts[i]] for i in range(n_mem)],
                axis=1)                                 # (3, P_obj_tot, N)
            flat = tuple(obj_cat[k].reshape(n_obj_total * N)
                         for k in range(3))
            val_flat, grad_flat = sdf_and_grad_lanes(df_obj_list, flat, 3)
            val = val_flat.reshape(n_obj_total, N)
            grad = jnp.stack([g.reshape(n_obj_total, N) for g in grad_flat])
            for i in range(n_mem):
                lo, hi = int(obj_offsets[i]), int(obj_offsets[i + 1])
                sdf_val_by_mem[i] = val[lo:hi]
                sdf_grad_by_mem[i] = grad[:, lo:hi]

        # --- per-member row groups: r (rows_i, N), Jr (rows_i, d_i, N) ---
        member_rows = []
        for i in range(n_mem):
            P_obj_i = obj_counts[i]
            pts_i, J_i = pts_list[i], J_list[i]
            obj_pts_i = pts_i[:, :P_obj_i]
            J_obj_i = J_i[:P_obj_i]
            margins_i = jnp.asarray(obj_margins_np[i], dtype)
            r_parts, Jr_parts = [], []
            if df_obj_list:
                r_o = jax.nn.relu(margins_i[:, None] + cutoff
                                  - sdf_val_by_mem[i])
                act = (r_o > 0).astype(dtype)
                Jr_parts.append(-act[:, None, :] * contract_ws3(
                    sdf_grad_by_mem[i], J_obj_i))
                r_parts.append(r_o)
            # workspace bounds (object points only, like the generic path)
            d_lo = obj_pts_i - jnp.asarray(ws_min_np, dtype)[:, None, None]
            d_hi = jnp.asarray(ws_max_np, dtype)[:, None, None] - obj_pts_i
            faces = jnp.concatenate([d_lo, d_hi], axis=0)
            val_ws = jnp.min(faces, axis=0)
            amin = jnp.argmin(faces, axis=0)
            sign = jnp.where(amin < 3, 1.0, -1.0).astype(dtype)
            axis_id = jnp.where(amin < 3, amin, amin - 3)
            grad_ws = jnp.stack([sign * (axis_id == k).astype(dtype)
                                 for k in range(3)])
            r_w = jax.nn.relu(margins_i[:, None] + cutoff - val_ws)
            act_w = (r_w > 0).astype(dtype)
            Jr_parts.append(-act_w[:, None, :] * contract_ws3(
                grad_ws, J_obj_i))
            r_parts.append(r_w)
            # own self-collision pairs (index the member's self section)
            if own_pairs[i]:
                a_pos = np.asarray([P_obj_i + a for a, _, _ in own_pairs[i]],
                                   np.int32)
                b_pos = np.asarray([P_obj_i + b for _, b, _ in own_pairs[i]],
                                   np.int32)
                mg = jnp.asarray([g for _, _, g in own_pairs[i]], dtype)
                diff = pts_i[:, a_pos] - pts_i[:, b_pos]
                d2 = jnp.sum(jnp.square(diff), axis=0)
                nz = d2 > 0
                dist = jnp.where(nz, jnp.sqrt(jnp.where(nz, d2, 1.0)), 0.0)
                inv = jnp.where(nz, 1.0 / jnp.maximum(dist, 1e-9), 0.0)
                u = diff * inv[None]
                r_s = jax.nn.relu(mg[:, None] - dist)
                act_s = (r_s > 0).astype(dtype)
                J_d = J_i[a_pos] - J_i[b_pos]
                Jr_parts.append(-act_s[:, None, :] * contract_ws3(u, J_d))
                r_parts.append(r_s)
            member_rows.append((jnp.concatenate(r_parts, axis=0),
                                jnp.concatenate(Jr_parts, axis=0)))

        # --- mutual pair groups: r (K, N), A (K, d_i, N), B (K, d_j, N) ---
        mutual_rows = {}
        for (i, j), rows in mutual_groups.items():
            a_pos = np.asarray([a for a, _, _ in rows], np.int32)
            b_pos = np.asarray([b for _, b, _ in rows], np.int32)
            mg = jnp.asarray([g for _, _, g in rows], dtype)
            diff = pts_list[i][:, a_pos] - pts_list[j][:, b_pos]
            d2 = jnp.sum(jnp.square(diff), axis=0)
            nz = d2 > 0
            dist = jnp.where(nz, jnp.sqrt(jnp.where(nz, d2, 1.0)), 0.0)
            inv = jnp.where(nz, 1.0 / jnp.maximum(dist, 1e-9), 0.0)
            u = diff * inv[None]
            r_m = jax.nn.relu(mg[:, None] - dist)
            act = (r_m > 0).astype(dtype)
            A = -act[:, None, :] * contract_ws3(u, J_list[i][a_pos])
            B = act[:, None, :] * contract_ws3(u, J_list[j][b_pos])
            mutual_rows[(i, j)] = (r_m, A, B)

        # --- assembly (both layouts share the block math; only the reshape
        # of the row arrays and the stack axes differ) ---
        if h is not None:
            Bl = N // h

            def rsh_r(x):        # (rows, N) -> (rows, h, B)
                return x.reshape(-1, h, Bl)

            def rsh_J(x):        # (rows, d_i, N) -> (rows, d_i, h, B)
                return x.reshape(x.shape[0], x.shape[1], h, Bl)
            stack_ax = 1
        else:
            rsh_r = rsh_J = lambda x: x
            stack_ax = 0

        member_rows = [(rsh_r(r), rsh_J(Jr)) for r, Jr in member_rows]
        mutual_rows = {k: (rsh_r(r), rsh_J(A), rsh_J(B))
                       for k, (r, A, B) in mutual_rows.items()}

        # gradient blocks g_i = sum_rows r * Jr_col
        g_blocks = []
        for i in range(n_mem):
            r_i, Jr_i = member_rows[i]
            cols = [jnp.sum(r_i * Jr_i[:, c], axis=0)
                    for c in range(d_list[i])]
            for (a, b), (r_m, A, Bm_) in mutual_rows.items():
                if a == i:
                    cols = [c0 + jnp.sum(r_m * A[:, c], axis=0)
                            for c, c0 in enumerate(cols)]
                elif b == i:
                    cols = [c0 + jnp.sum(r_m * Bm_[:, c], axis=0)
                            for c, c0 in enumerate(cols)]
            g_blocks.append(jnp.stack(cols, axis=stack_ax))

        # Hessian blocks
        def sym_block(contribs, d_i):
            """contribs: list of (rows, d_i, ...) arrays sharing columns;
            returns the symmetric (d_i, d_i) entry grid."""
            ent = [[None] * d_i for _ in range(d_i)]
            for c1 in range(d_i):
                for c2 in range(c1, d_i):
                    s = None
                    for Jr in contribs:
                        t = jnp.sum(Jr[:, c1] * Jr[:, c2], axis=0)
                        s = t if s is None else s + t
                    ent[c1][c2] = s
                    ent[c2][c1] = s
            return ent

        diag_contribs = [[member_rows[i][1]] for i in range(n_mem)]
        for (a, b), (_, A, Bm_) in mutual_rows.items():
            diag_contribs[a].append(A)
            diag_contribs[b].append(Bm_)
        H_diag = [sym_block(diag_contribs[i], d_list[i])
                  for i in range(n_mem)]
        H_cross = {}
        for (a, b), (_, A, Bm_) in mutual_rows.items():
            ent = [[jnp.sum(A[:, c1] * Bm_[:, c2], axis=0)
                    for c2 in range(d_list[b])] for c1 in range(d_list[a])]
            H_cross[(a, b)] = ent

        # stitch the (d, d) grid of entries, then stack once
        full = [[None] * d for _ in range(d)]
        zero_cell = jnp.zeros(member_rows[0][0].shape[1:], dtype)
        for i in range(n_mem):
            oi = int(d_off[i])
            for c1 in range(d_list[i]):
                for c2 in range(d_list[i]):
                    full[oi + c1][oi + c2] = H_diag[i][c1][c2]
        for (a, b), ent in H_cross.items():
            oa, ob = int(d_off[a]), int(d_off[b])
            for c1 in range(d_list[a]):
                for c2 in range(d_list[b]):
                    full[oa + c1][ob + c2] = ent[c1][c2]
                    full[ob + c2][oa + c1] = ent[c1][c2]
        for c1 in range(d):
            for c2 in range(d):
                if full[c1][c2] is None:
                    full[c1][c2] = zero_cell

        cost_sq = sum(jnp.sum(jnp.square(r), axis=0)
                      for r, _ in member_rows)
        cost_sq = cost_sq + sum(jnp.sum(jnp.square(r), axis=0)
                                for r, _, _ in mutual_rows.values())

        if h is not None:
            g_q = lam * jnp.concatenate(g_blocks, axis=1)     # (h, d, B)
            H_qq = lam * jnp.stack(
                [jnp.stack(row, axis=1) for row in full], axis=1)
            cost = 0.5 * lam * cost_sq                        # (h, B)
            g = jnp.concatenate(
                [g_q, jnp.zeros((h, m - d, Bl), dtype)], axis=1)
            top = jnp.concatenate(
                [H_qq, jnp.zeros((h, d, m - d, Bl), dtype)], axis=2)
            bot = jnp.zeros((h, m - d, m, Bl), dtype)
            return g, jnp.concatenate([top, bot], axis=1), cost

        g_q = lam * jnp.concatenate(g_blocks, axis=0)         # (d, N)
        H_qq = lam * jnp.stack([jnp.stack(row) for row in full])
        cost = 0.5 * lam * cost_sq
        g = jnp.concatenate([g_q, jnp.zeros((m - d, N), dtype)], axis=0)
        top = jnp.concatenate([H_qq, jnp.zeros((d, m - d, N), dtype)],
                              axis=1)
        bot = jnp.zeros((m - d, m, N), dtype)
        return g, jnp.concatenate([top, bot], axis=0), cost

    return terms
