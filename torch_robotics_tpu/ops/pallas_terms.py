"""Fully-fused Gauss-Newton obstacle-terms Pallas kernel.

One kernel program computes, for a lane tile of waypoints, the ENTIRE terms
pipeline that ``ops/lanes_fk.obstacle_terms_lanes_factory`` runs as an XLA
graph: FK -> collision points -> analytic point Jacobians -> scene SDF +
gradient -> hinge residuals -> dense J^T r / J^T J assembly — all on
VMEM-resident (TN,) vectors, writing only g (d, N), H_qq (d, d, N), cost (N).

Why: the XLA graph materializes the stacked (P, d, 3, N) Jacobians and the
(P_res, d, N) weighted rows in HBM between stages, and every array whose
second-minor dim is 3 or 7 pays a 2.7x / 1.14x (8, 128)-tile padding on that
traffic (CLAUDE.md lesson 2).  Measured at the bench shapes (Panda /
EnvSpheres3D, B=1024, H=64): full terms 3.0 ms/iter of which the
hinge+contract+assembly tail is ~2.3 ms while its compute is ~60x less —
memory-bound on padded intermediates.  In-kernel everything stays in the
scalar-chains form (tuples of (TN,) vectors — zero padding, zero HBM
round-trips); HBM traffic drops to q in + (g, H, cost) out.

The kernel REUSES the exact trace-time chain builders (``fk_lanes``,
``point_jacobians_lanes``, ``_group_sdf_lanes``) — the only difference is
that model/scene constants are presented as numpy scalars (Pallas kernels
cannot capture jnp array constants, lesson 11) via ``StaticModel`` /
scalarized scene groups, so results are bit-identical to the XLA path.

Reference role parity: this replaces the reference's per-field cost stacking
(torch_planning_objectives/fields/distance_fields.py:107-130 +
tasks/tasks.py:139-232); residual semantics are identical to
``PlanningTask.collision_residuals``.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lanes_fk import (_group_sdf_lanes, _matmul3, _matvec3, fk_lanes,
                       obstacle_terms_lanes_factory, point_jacobians_lanes)

__all__ = ["StaticModel", "obstacle_terms_pallas_factory"]

_TILE_N = 1024


class StaticModel:
    """numpy-scalarized KinematicModel view: safe to close over in a Pallas
    kernel body (array reads yield numpy scalars, which lower to MLIR
    constants instead of captured jnp values)."""

    def __init__(self, m):
        self.joint_trans = np.asarray(m.joint_trans)
        self.joint_axis = np.asarray(m.joint_axis)
        self.clamp_lower = np.asarray(m.clamp_lower)
        self.clamp_upper = np.asarray(m.clamp_upper)
        self.joint_fixed_rot = np.asarray(m.joint_fixed_rot)
        self.joint_types = m.joint_types
        self.parent_idx = m.parent_idx
        self.n_links = m.n_links
        self.n_dofs = m.n_dofs
        self.link_names = m.link_names
        self._m = m

    def topological_order(self):
        return self._m.topological_order()

    def controlled_link_idxs(self):
        return self._m.controlled_link_idxs()

    def ancestry_matrix(self):
        return self._m.ancestry_matrix()

    def link_index(self, name):
        return self._m.link_index(name)


def _scalarize_scene(df_obj_list):
    """Scene split for the fused kernel: -> (spec, flat_arrays, grids).

    ``spec`` is [(Rm 3x3 nested float tuple, pos float tuple, dim,
    [(kind, n_arrays)])] for the ANALYTIC ObjectFields and ``flat_arrays``
    their primitive tables in order (passed as kernel INPUTS — Pallas
    cannot capture non-scalar constants).  ``grids`` collects the scene's
    ``GridSDF`` fields: grid lookups are gathers, which Mosaic does not
    vectorize (CLAUDE.md lesson 12), so they run in an XLA pre-stage
    (``_grid_sdf_lanes_multi``) whose packed (val, grad) rows enter the
    kernel as inputs.  Returns None if the scene has any other field type.
    """
    from ..core.quaternion import q_to_rotation_matrix
    from ..geom.grid_sdf import GridSDF
    from ..geom.sdf import ObjectField, RoundedBoxes, SharpBoxes, Spheres

    spec, flat, grids = [], [], []
    for obj in df_obj_list:
        if isinstance(obj, GridSDF):
            grids.append(obj)
            continue
        if not isinstance(obj, ObjectField):
            return None
        Rm = np.asarray(q_to_rotation_matrix(obj.ori), np.float64)
        pos = np.asarray(obj.pos, np.float64)
        groups = []
        for f in obj.fields:
            if isinstance(f, Spheres):
                groups.append(("spheres", 2))
                flat += [np.asarray(f.centers, np.float32),
                         np.asarray(f.radii, np.float32)]
            elif isinstance(f, RoundedBoxes):
                groups.append(("rounded_boxes", 3))
                flat += [np.asarray(f.centers, np.float32),
                         np.asarray(f.half_sizes, np.float32),
                         np.asarray(f.round_radii, np.float32)]
            elif isinstance(f, SharpBoxes):
                groups.append(("sharp_boxes", 2))
                flat += [np.asarray(f.centers, np.float32),
                         np.asarray(f.half_sizes, np.float32)]
            else:
                return None
        spec.append((tuple(tuple(float(Rm[i, j]) for j in range(3))
                           for i in range(3)),
                     tuple(float(p) for p in pos), obj.dim, groups))
    return spec, flat, grids


def _rebuild_scene(spec, vals):
    """(spec, in-kernel array values) -> [(Rm, pos, dim, [group objects])]
    with the group tables as VMEM-resident jnp arrays."""
    from ..geom.sdf import RoundedBoxes, SharpBoxes, Spheres
    out, k = [], 0
    for Rm, pos, dim, groups in spec:
        gs = []
        for kind, n in groups:
            a = vals[k:k + n]
            k += n
            if kind == "spheres":
                gs.append(Spheres(centers=a[0], radii=a[1]))
            elif kind == "rounded_boxes":
                gs.append(RoundedBoxes(centers=a[0], half_sizes=a[1],
                                       round_radii=a[2]))
            else:
                gs.append(SharpBoxes(centers=a[0], half_sizes=a[1]))
        out.append((Rm, pos, dim, gs))
    return out


def _static_scene_sdf(scene, pts3):
    """min-over-objects SDF of one lane-vector point (x, y, z)."""
    out = None
    for Rm, pos, dim, groups in scene:
        x3 = list(pts3) + [jnp.zeros_like(pts3[0])] * (3 - len(pts3))
        dxyz = [x3[k] - pos[k] for k in range(3)]
        x_obj = tuple(sum(Rm[k][i] * dxyz[k] for k in range(3))
                      for i in range(3))[:dim]
        s = None
        for g in groups:
            sg = _group_sdf_lanes(g, x_obj)
            s = sg if s is None else jnp.minimum(s, sg)
        out = s if out is None else jnp.minimum(out, s)
    return out


def _point_val_grad(scene, extras, mi, x, ws_dim):
    """Combined scene (SDF value, gradient) at object point ``mi``.

    Analytic objects: one vjp through the in-kernel min-SDF chain.  Grid
    fields: rows ``mi*(1+ws_dim) .. +ws_dim`` of the XLA-gathered packed
    (val, grad) inputs in ``extras`` (one (P*(1+ws_dim), TN) array per
    grid).  Per-element strict-less selection across fields like the XLA
    path (``lanes_fk.sdf_and_grad_lanes``); within the analytic group the
    single vjp-of-min resolves ties by jnp.minimum's subgradient — tie
    semantics across interleaved analytic/grid orderings may differ on
    exactly-equal SDF values (measure-zero)."""
    best_v, best_g = None, None
    if scene:
        val, vjp = jax.vjp(lambda xy: _static_scene_sdf(scene, xy), x)
        best_v, best_g = val, list(vjp(jnp.ones_like(val))[0])
    base = mi * (1 + ws_dim)
    for gv in extras:
        v = gv[base]
        g = [gv[base + 1 + k] for k in range(ws_dim)]
        if best_v is None:
            best_v, best_g = v, g
        else:
            take = v < best_v
            best_g = [jnp.where(take, gn, go)
                      for gn, go in zip(g, best_g)]
            best_v = jnp.minimum(best_v, v)
    return best_v, tuple(best_g)


def _scalarize_net(net, task):
    """SelfCollisionNet -> (const_arrays, static spec) for in-kernel eval.

    Weights are transposed to (out, in) and biases reshaped (out, 1) so
    every layer is one ``W @ x`` on the (features, TN) lanes activations;
    input normalization and output scaling are baked as python floats
    (numpy scalars lower to MLIR constants)."""
    consts = []
    for W, b in net.weights:
        consts.append(np.asarray(W.T, np.float32))
        consts.append(np.asarray(b, np.float32).reshape(-1, 1))
    mean = tuple(float(v) for v in np.asarray(net.mean_q))
    std = tuple(float(v) for v in np.asarray(net.std_q))
    scale = (float(net.scale_out[0]), float(net.scale_out[1]))
    cutoff = float(getattr(task, "_NET_SELF_CUTOFF", 0.001))
    return consts, (len(net.weights), mean, std, scale, net.activation,
                    cutoff)


def _net_signed_distance(consts, spec, q):
    """In-kernel MLP signed distance on (d, TN) lanes q -> (TN,).

    Same math as ``SelfCollisionNet.signed_distance`` (negated raw output);
    float32 MXU matmuls (the GN systems pin float32 precision, CLAUDE.md
    lesson 3)."""
    n_layers, mean, std, scale, activation, _ = spec
    d = q.shape[0]
    x = jnp.stack([(q[j] - mean[j]) / std[j] for j in range(d)])
    act = jax.nn.relu if activation == "relu" else jnp.tanh
    for li in range(n_layers - 1):
        W, b = consts[2 * li], consts[2 * li + 1]
        x = act(jnp.dot(W, x, precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32) + b)
    W, b = consts[2 * (n_layers - 1)], consts[2 * n_layers - 1]
    out = jnp.dot(W, x, precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32) + b       # (1, TN)
    raw = out[0] * scale[0] + scale[1]
    return -raw


def _grid_extras_fn(grids, obj_pts_fn, ws_dim, values_only=False):
    """XLA pre-stage of the grid split pipeline: q_cols -> one packed
    lanes array per grid field, ready to enter the kernel as an input.

    Each grid contributes (P*(1+ws_dim), N) rows (point-major: val then
    grad components) — or (P, N) values when ``values_only`` (the
    forward-only cost kernel needs no gradients).  The gather itself is
    XLA's: it runs at the measured ~7-11 ns/row floor that Pallas cannot
    beat (CLAUDE.md lesson 12)."""
    from .lanes_fk import _grid_sdf_lanes_multi, _grid_sdf_value_lanes_multi

    def extras_fn(q_cols):
        pts = obj_pts_fn(q_cols)
        arrays = []
        for grid in grids:
            if values_only:
                arrays.append(_grid_sdf_value_lanes_multi(grid, pts))
                continue
            vals, grads = _grid_sdf_lanes_multi(grid, pts)
            packed = jnp.concatenate(
                [vals[:, None], grads[:, :ws_dim]], axis=1)
            arrays.append(packed.reshape(-1, vals.shape[-1]))
        return arrays

    return extras_fn


def obstacle_terms_pallas_factory(task):
    """Fused-kernel GN obstacle terms for a single-kinematic-model robot in
    an analytic primitive scene.  Same contract as
    ``obstacle_terms_lanes_factory`` (q_cols (d, N), lam, h=None ->
    g, Hb, cost); returns None when the task has no fused path.  The
    returned function dispatches per call: Pallas kernel on TPU, the XLA
    lanes graph elsewhere (CPU tests, interpret-free environments).
    """
    robot = task.robot
    from ..robots import RobotPointMass
    from ..robots.multi_robot import MultiRobot
    if isinstance(robot, RobotPointMass):
        return None
    scal = _scalarize_scene(task.df_obj_list)
    if scal is None:
        return None
    scene_spec, scene_arrays, grids = scal
    if isinstance(robot, MultiRobot):
        return _multirobot_terms_pallas_factory(task, robot, scene_spec,
                                                scene_arrays, grids)
    if not hasattr(robot, "model") or robot.object_interpolate:
        return None
    xla_terms = obstacle_terms_lanes_factory(task)
    if xla_terms is None:
        return None

    # learned self-collision net: replaces the pair rows (lanes_fk.py:594)
    # with one MLP residual row per waypoint, evaluated IN-KERNEL as small
    # MXU matmuls on the (features, TN) lanes activations (weights enter as
    # full-block VMEM const inputs; vjp works inside kernel bodies, lesson
    # 12b(c)).  Round-5 A/B at bench shapes (B=1024, H=64, net 7-256-64-1,
    # benchmarks/net_terms_ab.py): terms 1.291 -> 1.128 ms/call (1.14x,
    # rel err 1.8e-7), net-robot MPC 228.3k solves/s — the round-4
    # exclusion comment ("not worth the layout change") was an unmeasured
    # assertion and is retired.
    net = getattr(robot, "self_collision_net", None)
    net_spec = _scalarize_net(net, task) if net is not None else None
    net_consts = net_spec[0] if net_spec is not None else []

    sm = StaticModel(robot.model)
    d = robot.q_dim
    m = 2 * d
    obj_idxs = list(robot.object_coll_idxs)
    self_idxs = list(robot.self_coll_idxs or [])
    used_links = sorted(set(obj_idxs + self_idxs))
    link_to_pos = {li: i for i, li in enumerate(used_links)}
    cutoff = float(task.obstacle_cutoff_margin)
    ws_min = np.asarray(task.ws_min, np.float64)
    ws_max = np.asarray(task.ws_max, np.float64)
    ws_dim = ws_min.shape[0]
    obj_margins = np.asarray(robot.object_margins, np.float64)
    self_margins = (np.asarray(robot.self_margins, np.float64)
                    if getattr(robot, "self_margins", None) is not None
                    else None)
    # net replaces the pair rows (lanes_fk.py:594-596 semantics)
    pair_idxs = (np.asarray(robot.self_pair_idxs)
                 if robot.self_pair_idxs is not None and net is None
                 else None)
    grasped_n = int(getattr(robot, "grasped_n_points", 0))
    grasped_pts = (np.asarray(robot.grasped_points)
                   if grasped_n > 0 else None)
    n_used = len(used_links)
    obj_pos_list = [link_to_pos[li] for li in obj_idxs] + list(
        range(n_used, n_used + grasped_n))
    self_pos_list = ([link_to_pos[li] for li in self_idxs] + list(
        range(n_used, n_used + grasped_n))) if self_idxs else None

    extras_fn = None
    if grids:
        model = robot.model

        def obj_pts_fn(q_cols):
            """XLA lanes FK -> object collision points, same order as the
            kernel's obj_pos_list (object links, then grasped points)."""
            R_w, t_w = fk_lanes(model, q_cols)
            pts = [t_w[li] for li in obj_idxs]
            if grasped_n > 0:
                gi = model.link_index(robot.link_name_grasped_object)
                for gidx in range(grasped_n):
                    gp = tuple(float(grasped_pts[gidx, k]) for k in range(3))
                    w = _matvec3(R_w[gi], gp)
                    pts.append(tuple(w[k] + t_w[gi][k] for k in range(3)))
            return pts

        extras_fn = _grid_extras_fn(grids, obj_pts_fn, ws_dim)

    def _tile_body(q, scene, extras, consts):
        """(d, TN) q tile -> (g_q (d, TN), Hqq (d, d, TN), cost (TN,)),
        UNSCALED by lam (g_q = sum r Jr, Hqq = Jr^T Jr, cost = 0.5 sum r^2).
        Pure scalar-chain form: every intermediate is a (TN,) vector."""
        dtype = q.dtype
        R_w, t_w = fk_lanes(sm, q)
        pts = [t_w[li] for li in used_links]
        ids = list(used_links)
        if grasped_n > 0:
            gi = sm.link_index(robot.link_name_grasped_object)
            for gidx in range(grasped_n):
                gp = tuple(float(grasped_pts[gidx, k]) for k in range(3))
                world = _matvec3(R_w[gi], gp)
                pts.append(tuple(world[k] + t_w[gi][k] for k in range(3)))
                ids.append(gi)
        J = point_jacobians_lanes(sm, R_w, t_w, pts, ids, q_cols=q)
        zeros = jnp.zeros_like(q[0])

        rows_r: List = []         # each (TN,)
        rows_J: List = []         # each: list of d (TN,) (or None) columns

        def add_hinge(margin, val, grad, Jp):
            """grad: ws_dim-tuple of (TN,); Jp: J[p] (d columns of
            3-tuples)."""
            r = jax.nn.relu(margin + cutoff - val)
            act = (r > 0).astype(dtype)
            cols = []
            for j in range(d):
                if Jp[j] is None:
                    cols.append(None)
                    continue
                s = grad[0] * Jp[j][0]
                for k in range(1, ws_dim):
                    s = s + grad[k] * Jp[j][k]
                cols.append(-act * s)
            rows_r.append(r)
            rows_J.append(cols)

        # --- objects: per-point min-SDF value + gradient (analytic vjp
        # chains in-kernel; grid fields from the XLA-gathered extras) ---
        for mi, p in enumerate(obj_pos_list):
            x = pts[p][:ws_dim]
            val, grad = _point_val_grad(scene, extras, mi, x, ws_dim)
            add_hinge(float(obj_margins[mi]), val, grad, J[p])

        # --- workspace bounds: min-face distance + sign gradient ---
        for mi, p in enumerate(obj_pos_list):
            x = pts[p][:ws_dim]
            faces = [x[k] - float(ws_min[k]) for k in range(ws_dim)] + \
                    [float(ws_max[k]) - x[k] for k in range(ws_dim)]
            val = faces[0]
            for f in faces[1:]:
                val = jnp.minimum(val, f)
            # exact argmin semantics (first minimal face wins, matching the
            # XLA path's jnp.argmin over [lows..., highs...])
            is_min = [None] * (2 * ws_dim)
            taken = jnp.zeros_like(val)
            for fi in range(2 * ws_dim):
                hit = ((faces[fi] <= val).astype(dtype)) * (1.0 - taken)
                is_min[fi] = hit
                taken = jnp.maximum(taken, hit)
            grad = [is_min[k] - is_min[ws_dim + k] for k in range(ws_dim)]
            add_hinge(float(obj_margins[mi]), val, grad, J[p])

        # --- self-collision pairs ---
        if self_pos_list is not None and pair_idxs is not None \
                and len(pair_idxs) > 0:
            for ki, (ia, ib) in enumerate(pair_idxs):
                pa, pb = self_pos_list[ia], self_pos_list[ib]
                diff = tuple(pts[pa][k] - pts[pb][k] for k in range(3))
                d2 = diff[0] * diff[0] + diff[1] * diff[1] \
                    + diff[2] * diff[2]
                nz = d2 > 0
                dist = jnp.where(nz, jnp.sqrt(jnp.where(nz, d2, 1.0)), 0.0)
                inv = jnp.where(nz, 1.0 / jnp.maximum(dist, 1e-9), 0.0)
                u = tuple(diff[k] * inv for k in range(3))
                r = jax.nn.relu(float(self_margins[ki]) - dist)
                act = (r > 0).astype(dtype)
                cols = []
                for j in range(d):
                    Ja, Jb = J[pa][j], J[pb][j]
                    if Ja is None and Jb is None:
                        cols.append(None)
                        continue
                    s = None
                    for k in range(3):
                        a = Ja[k] if Ja is not None else zeros
                        b = Jb[k] if Jb is not None else zeros
                        t = u[k] * (a - b)
                        s = t if s is None else s + t
                    cols.append(-act * s)
                rows_r.append(r)
                rows_J.append(cols)

        # --- learned self-collision net: one MLP row per waypoint ---
        if net_spec is not None:
            sd, vjp_n = jax.vjp(
                lambda qq: _net_signed_distance(consts, net_spec[1], qq), q)
            g_net = vjp_n(jnp.ones_like(sd))[0]                # (d, TN)
            r_n = jax.nn.relu(net_spec[1][5] - sd)
            act_n = (r_n > 0).astype(dtype)
            rows_r.append(r_n)
            rows_J.append([-act_n * g_net[j] for j in range(d)])

        # --- dense assembly on VMEM-resident rows ---
        cost = None
        for r in rows_r:
            t = r * r
            cost = t if cost is None else cost + t
        cost = 0.5 * cost

        g_cols = []
        for j in range(d):
            acc = None
            for r, cols in zip(rows_r, rows_J):
                if cols[j] is None:
                    continue
                t = r * cols[j]
                acc = t if acc is None else acc + t
            g_cols.append(zeros if acc is None else acc)

        H_rows = [[None] * d for _ in range(d)]
        for i in range(d):
            for j in range(i, d):
                acc = None
                for cols in rows_J:
                    if cols[i] is None or cols[j] is None:
                        continue
                    t = cols[i] * cols[j]
                    acc = t if acc is None else acc + t
                ent = zeros if acc is None else acc
                H_rows[i][j] = ent
                H_rows[j][i] = ent
        return g_cols, H_rows, cost

    return _build_terms(d, scene_spec, scene_arrays, _tile_body, xla_terms,
                        extras_fn=extras_fn, const_arrays=tuple(net_consts))


from .pallas_common import out_struct as _out_struct


def _build_terms(d, scene_spec, scene_arrays, _tile_body, xla_terms,
                 extras_fn=None, const_arrays=()):
    """Wrap a tile body ((d, TN) q, scene, extras, consts -> g_cols,
    H_rows, cost) into the pallas_call + terms-contract dispatcher shared
    by the single-robot and MultiRobot factories.  ``extras_fn`` (grid
    scenes): q_cols -> list of (rows, N) lanes arrays computed in XLA
    (gathered grid SDF rows) and tiled into the kernel alongside q.
    ``const_arrays``: whole arrays (e.g. MLP weights) entering every tile
    as full-block VMEM inputs, handed to the body as ``consts``."""
    m = 2 * d
    n_scene = len(scene_arrays)
    n_const = len(const_arrays)

    def _kernel(n_extra, q_ref, *refs):
        extra_refs = refs[:n_extra]
        scene_refs = refs[n_extra:n_extra + n_scene]
        const_refs = refs[n_extra + n_scene:n_extra + n_scene + n_const]
        g_ref, h_ref, c_ref = refs[n_extra + n_scene + n_const:]
        q = q_ref[...]
        scene = _rebuild_scene(scene_spec, [r[...] for r in scene_refs])
        g_cols, H_rows, cost = _tile_body(q, scene,
                                          [r[...] for r in extra_refs],
                                          [r[...] for r in const_refs])
        g_ref[...] = jnp.stack(g_cols)
        h_ref[...] = jnp.stack([jnp.stack(row) for row in H_rows])
        c_ref[...] = cost[None]

    @partial(jax.jit, static_argnames=("interpret",))
    def _run_kernel(q_cols, interpret=False):
        N = q_cols.shape[-1]
        tn = min(_TILE_N, N) if N % _TILE_N else _TILE_N
        N_pad = ((N + tn - 1) // tn) * tn
        if N_pad != N:
            q_cols = jnp.pad(q_cols, ((0, 0), (0, N_pad - N)))
        extras = extras_fn(q_cols) if extras_fn is not None else []
        extra_specs = [
            pl.BlockSpec((a.shape[0], tn), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
            for a in extras]
        scene_specs = [
            pl.BlockSpec(a.shape, (lambda i, nd=a.ndim: (0,) * nd),
                         memory_space=pltpu.VMEM)
            for a in list(scene_arrays) + list(const_arrays)]
        g, Hqq, cost = pl.pallas_call(
            partial(_kernel, len(extras)),
            out_shape=(
                _out_struct((d, N_pad), q_cols.dtype, q_cols),
                _out_struct((d, d, N_pad), q_cols.dtype, q_cols),
                _out_struct((1, N_pad), q_cols.dtype, q_cols),
            ),
            grid=(N_pad // tn,),
            in_specs=[pl.BlockSpec((d, tn), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)]
            + extra_specs + scene_specs,
            out_specs=(
                pl.BlockSpec((d, tn), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, d, tn), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tn), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ),
            compiler_params=pltpu.CompilerParams(
                # the chain body keeps many (TN,) values live; the default
                # 16 MB scoped-VMEM stack OOMs at tile 1024 on larger
                # point sets
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(q_cols, *extras,
          *[jnp.asarray(a) for a in scene_arrays],
          *[jnp.asarray(a) for a in const_arrays])
        return g[:, :N], Hqq[:, :, :N], cost[0, :N]

    def terms(q_cols, lam, h=None, interpret=False):
        if jax.default_backend() != "tpu" and not interpret:
            return xla_terms(q_cols, lam, h=h)
        N = q_cols.shape[-1]
        dtype = q_cols.dtype
        g_q, Hqq, cost = _run_kernel(q_cols, interpret=interpret)
        g_q = lam * g_q
        Hqq = lam * Hqq
        cost = lam * cost
        if h is not None:
            Bl = N // h
            g_h = jnp.moveaxis(g_q.reshape(d, h, Bl), 0, 1)   # (h, d, B)
            H_h = jnp.moveaxis(Hqq.reshape(d, d, h, Bl), 2, 0)
            g = jnp.concatenate(
                [g_h, jnp.zeros((h, m - d, Bl), dtype)], axis=1)
            top = jnp.concatenate(
                [H_h, jnp.zeros((h, d, m - d, Bl), dtype)], axis=2)
            bot = jnp.zeros((h, m - d, m, Bl), dtype)
            return g, jnp.concatenate([top, bot], axis=1), \
                cost.reshape(h, Bl)
        g = jnp.concatenate([g_q, jnp.zeros((m - d, N), dtype)], axis=0)
        top = jnp.concatenate(
            [Hqq, jnp.zeros((d, m - d, N), dtype)], axis=1)
        bot = jnp.zeros((m - d, m, N), dtype)
        return g, jnp.concatenate([top, bot], axis=0), cost

    return terms


def _multirobot_terms_pallas_factory(task, robot, scene_spec, scene_arrays,
                                     grids):
    """Fused terms kernel for a ``MultiRobot``: per-member FK + Jacobians
    in-kernel, then GROUP-STACKED assembly — rows are grouped by their
    column support (each member's object/ws/own-pair rows span only that
    member's columns; each mutual-pair group spans two members'), stacked
    into (rows, TN) arrays, and every g/H entry is ONE leading-axis
    multiply-reduce.  The per-entry-per-row chains of the single-robot
    body would be ~60k ops at q_dim=20 x 143 rows (Mosaic cannot digest
    that); grouping gets the same dense math in ~500 wide ops.  Residual
    set identical to the XLA paths (structured or generic — the outputs
    are symmetric reductions over rows, so row order is irrelevant).
    """
    members = robot.robots
    if not all(hasattr(r, "model") for r in members):
        return None
    if any(getattr(r, "object_interpolate", False) for r in members):
        return None
    if any(getattr(r, "self_collision_net", None) is not None
           for r in members):
        return None
    xla_terms = obstacle_terms_lanes_factory(task)
    if xla_terms is None:
        return None

    sms = [StaticModel(r.model) for r in members]
    base_R = np.asarray(robot.base_rots, np.float64)
    base_t = np.asarray(robot.base_trans, np.float64)
    d_list = [r.q_dim for r in members]
    d_off = np.cumsum([0] + d_list)
    d = robot.q_dim
    n_mem = len(members)
    obj_counts = list(robot.obj_counts)
    self_counts = list(robot.self_counts)
    n_obj_total = sum(obj_counts)
    cutoff = float(task.obstacle_cutoff_margin)
    ws_min = np.asarray(task.ws_min, np.float64)
    ws_max = np.asarray(task.ws_max, np.float64)
    ws_dim = int(ws_min.shape[0])
    obj_margins = np.asarray(robot.object_margins, np.float64)
    self_margins = (np.asarray(robot.self_margins, np.float64)
                    if getattr(robot, "self_margins", None) is not None
                    else None)
    pair_idxs = (np.asarray(robot.self_pair_idxs)
                 if robot.self_pair_idxs else None)
    # member owning each layout position (obj sections then self sections)
    pos_member = []
    for k, c in enumerate(obj_counts):
        pos_member += [k] * c
    for k, c in enumerate(self_counts):
        pos_member += [k] * c

    extras_fn = None
    if grids:
        from .lanes_fk import _member_lanes_points, _scalar_mat3

        def obj_pts_fn(q_cols):
            """XLA per-member lanes FK -> world object points, member-major
            obj sections (the kernel's pos_member obj layout)."""
            pts = []
            for mi, r in enumerate(members):
                q_i = q_cols[int(d_off[mi]):int(d_off[mi + 1])]
                Rb = _scalar_mat3(robot.base_rots[mi])
                tb = tuple(robot.base_trans[mi, k] for k in range(3))
                _, _, m_obj, _, _, _ = _member_lanes_points(r, q_i, Rb, tb)
                pts += m_obj
            return pts

        extras_fn = _grid_extras_fn(grids, obj_pts_fn, ws_dim)

    def _tile_body(q, scene, extras, consts):
        dtype = q.dtype
        zeros = jnp.zeros_like(q[0])

        # --- per-member FK -> world points + member-width Jacobians ---
        obj_pts, self_pts = [], []
        obj_J, self_J = [], []         # member-width column lists
        for mi, r in enumerate(members):
            sm = sms[mi]
            lo, hi = int(d_off[mi]), int(d_off[mi + 1])
            q_i = q[lo:hi]
            Rb = tuple(tuple(float(base_R[mi, a, c2]) for c2 in range(3))
                       for a in range(3))
            tb = tuple(float(base_t[mi, k]) for k in range(3))
            R_w, t_w = fk_lanes(sm, q_i)
            R_wW = [_matmul3(Rb, R) for R in R_w]
            t_wW = []
            for t in t_w:
                tw = _matvec3(Rb, t)
                t_wW.append(tuple(tw[k] + tb[k] for k in range(3)))

            m_obj = [t_wW[li] for li in r.object_coll_idxs]
            m_obj_ids = list(r.object_coll_idxs)
            m_self, m_self_ids = [], []
            if r.self_coll_idxs:
                m_self = [t_wW[li] for li in r.self_coll_idxs]
                m_self_ids = list(r.self_coll_idxs)
            gn = int(getattr(r, "grasped_n_points", 0))
            if gn > 0:
                gi = sm.link_index(r.link_name_grasped_object)
                gp_np = np.asarray(r.grasped_points)
                g_pts = []
                for gidx in range(gn):
                    gp = tuple(float(gp_np[gidx, k]) for k in range(3))
                    w = _matvec3(R_wW[gi], gp)
                    g_pts.append(tuple(w[k] + t_wW[gi][k] for k in range(3)))
                m_obj += g_pts
                m_obj_ids += [gi] * gn
                if r.self_coll_idxs:
                    m_self += g_pts
                    m_self_ids += [gi] * gn
            all_pts = m_obj + m_self
            J_i = point_jacobians_lanes(sm, R_wW, t_wW, all_pts,
                                        m_obj_ids + m_self_ids, q_cols=q_i)
            obj_pts += m_obj
            self_pts += m_self
            obj_J += J_i[:len(m_obj)]
            self_J += J_i[len(m_obj):]
        pts = obj_pts + self_pts
        J = obj_J + self_J            # member-width lists (use pos_member)

        def col3(Jp, j):
            """3-tuple of (TN,) for member-width column j (None -> zeros)."""
            if Jp[j] is None:
                return (zeros, zeros, zeros)
            return Jp[j]

        # --- groups: key = tuple of involved members, value = list of
        # (r_row, {global_col: (TN,) Jr entry}) ---
        groups = {}

        def add_row(key, r_row, coldict):
            groups.setdefault(key, []).append((r_row, coldict))

        def hinge_cols(mi, Jp, grad, act):
            lo = int(d_off[mi])
            out = {}
            for j in range(d_list[mi]):
                cj = col3(Jp, j)
                s = grad[0] * cj[0]
                for k in range(1, ws_dim):
                    s = s + grad[k] * cj[k]
                out[lo + j] = -act * s
            return out

        # objects + workspace bounds (per object point)
        for p in range(n_obj_total):
            mi = pos_member[p]
            x = pts[p][:ws_dim]
            val, grad = _point_val_grad(scene, extras, p, x, ws_dim)
            r = jax.nn.relu(float(obj_margins[p]) + cutoff - val)
            act = (r > 0).astype(dtype)
            add_row((mi,), r, hinge_cols(mi, J[p], grad, act))

            faces = [x[k] - float(ws_min[k]) for k in range(ws_dim)] + \
                    [float(ws_max[k]) - x[k] for k in range(ws_dim)]
            val_w = faces[0]
            for f in faces[1:]:
                val_w = jnp.minimum(val_w, f)
            is_min = [None] * (2 * ws_dim)
            taken = jnp.zeros_like(val_w)
            for fi in range(2 * ws_dim):
                hit = ((faces[fi] <= val_w).astype(dtype)) * (1.0 - taken)
                is_min[fi] = hit
                taken = jnp.maximum(taken, hit)
            grad_w = [is_min[k] - is_min[ws_dim + k] for k in range(ws_dim)]
            r_w = jax.nn.relu(float(obj_margins[p]) + cutoff - val_w)
            act_w = (r_w > 0).astype(dtype)
            add_row((mi,), r_w, hinge_cols(mi, J[p], grad_w, act_w))

        # self-collision pairs (own-member AND mutual, uniform handling)
        if pair_idxs is not None:
            for ki, (pa, pb) in enumerate(pair_idxs):
                pa, pb = int(pa), int(pb)
                ma, mb = pos_member[pa], pos_member[pb]
                diff = tuple(pts[pa][k] - pts[pb][k] for k in range(3))
                d2 = diff[0] * diff[0] + diff[1] * diff[1] \
                    + diff[2] * diff[2]
                nz = d2 > 0
                dist = jnp.where(nz, jnp.sqrt(jnp.where(nz, d2, 1.0)), 0.0)
                inv = jnp.where(nz, 1.0 / jnp.maximum(dist, 1e-9), 0.0)
                u = tuple(diff[k] * inv for k in range(3))
                r = jax.nn.relu(float(self_margins[ki]) - dist)
                act = (r > 0).astype(dtype)
                coldict = {}
                for mi, p_i, sign in ((ma, pa, 1.0), (mb, pb, -1.0)):
                    lo = int(d_off[mi])
                    for j in range(d_list[mi]):
                        cj = col3(J[p_i], j)
                        s = u[0] * cj[0] + u[1] * cj[1] + u[2] * cj[2]
                        ent = -act * (sign * s)
                        c = lo + j
                        coldict[c] = (coldict[c] + ent if c in coldict
                                      else ent)
                key = (ma,) if ma == mb else tuple(sorted((ma, mb)))
                add_row(key, r, coldict)

        # --- group-stacked assembly ---
        g_cols = [None] * d
        H_rows = [[None] * d for _ in range(d)]
        cost = None
        for key, rows in groups.items():
            support = []
            for mi in key:
                support += list(range(int(d_off[mi]), int(d_off[mi + 1])))
            r_stack = jnp.stack([r for r, _ in rows])        # (K, TN)
            col_stacks = {
                c: jnp.stack([cd.get(c, zeros) for _, cd in rows])
                for c in support}
            t = jnp.sum(r_stack * r_stack, axis=0)
            cost = t if cost is None else cost + t
            for c in support:
                t = jnp.sum(r_stack * col_stacks[c], axis=0)
                g_cols[c] = t if g_cols[c] is None else g_cols[c] + t
            for ai in range(len(support)):
                for bi in range(ai, len(support)):
                    i, j = support[ai], support[bi]
                    t = jnp.sum(col_stacks[i] * col_stacks[j], axis=0)
                    H_rows[i][j] = (t if H_rows[i][j] is None
                                    else H_rows[i][j] + t)
        for i in range(d):
            g_cols[i] = zeros if g_cols[i] is None else g_cols[i]
            for j in range(i, d):
                ent = H_rows[i][j]
                ent = zeros if ent is None else ent
                H_rows[i][j] = ent
                H_rows[j][i] = ent
        return g_cols, H_rows, 0.5 * cost

    return _build_terms(d, scene_spec, scene_arrays, _tile_body, xla_terms,
                        extras_fn=extras_fn)


def collision_cost_pallas_factory(task):
    """Fused per-waypoint collision-COST kernel: q_cols (d, N) ->
    0.5 * sum_p r_p(q)^2 (N,), UNSCALED by the collision weight.

    The value-only body skips Jacobians and gradients entirely (no vjp, no
    assembly), so it is much leaner than the terms kernel — built for the
    forward-only cost evaluations that dominate the sampling/line-search
    solvers (sGPMP scores K samples per iteration, iLQR evaluates every
    line-search step; both use the cost value, never its derivative).
    FORWARD-EVAL ONLY: pallas_call has no autodiff rule — solvers that
    need gradients use ``obstacle_terms_lanes``'s g instead.  Off-TPU the
    returned fn falls back to the XLA terms graph's cost output.

    Supports the same tasks as ``obstacle_terms_pallas_factory``: single
    kinematic robots and MultiRobot; analytic scenes in-kernel and grid-SDF
    scenes via the split pipeline (XLA packed-row gather -> values-only
    extras consumed by the kernel); the learned self-collision net runs
    in-kernel as MXU matmul rows.  Returns None otherwise (e.g. PointMass).
    """
    robot = task.robot
    from ..robots import RobotPointMass
    from ..robots.multi_robot import MultiRobot
    if isinstance(robot, RobotPointMass):
        return None
    scal = _scalarize_scene(task.df_obj_list)
    if scal is None:
        return None
    scene_spec, scene_arrays, grids = scal
    xla_terms = obstacle_terms_lanes_factory(task)
    if xla_terms is None:
        return None

    # unified member list (single robot = one member with identity base)
    if isinstance(robot, MultiRobot):
        members = robot.robots
        if not all(hasattr(r, "model") for r in members):
            return None
        if any(getattr(r, "object_interpolate", False) for r in members):
            return None
        if any(getattr(r, "self_collision_net", None) is not None
               for r in members):
            return None
        base_R = np.asarray(robot.base_rots, np.float64)
        base_t = np.asarray(robot.base_trans, np.float64)
        d_list = [r.q_dim for r in members]
        pair_pos = (np.asarray(robot.self_pair_idxs)
                    if robot.self_pair_idxs else None)
    else:
        if not hasattr(robot, "model") or robot.object_interpolate:
            return None
        members = [robot]
        base_R = np.eye(3, dtype=np.float64)[None]
        base_t = np.zeros((1, 3), np.float64)
        d_list = [robot.q_dim]
        pair_pos = None        # filled below against the unified layout

    # learned net (single robot): value-only MLP row in-kernel, replacing
    # the pair rows (same semantics as the terms kernel / lanes_fk.py:594)
    net = (getattr(robot, "self_collision_net", None)
           if not isinstance(robot, MultiRobot) else None)
    net_spec = _scalarize_net(net, task) if net is not None else None
    net_consts = net_spec[0] if net_spec is not None else []

    sms = [StaticModel(r.model) for r in members]
    d_off = np.cumsum([0] + d_list)
    d = robot.q_dim
    cutoff = float(task.obstacle_cutoff_margin)
    ws_min = np.asarray(task.ws_min, np.float64)
    ws_max = np.asarray(task.ws_max, np.float64)
    ws_dim = int(ws_min.shape[0])
    obj_margins = np.asarray(robot.object_margins, np.float64)
    self_margins = (np.asarray(robot.self_margins, np.float64)
                    if getattr(robot, "self_margins", None) is not None
                    else None)
    # unified layout: member-major obj sections, then member-major self
    # sections; count sections to place single-robot pair indices
    obj_count = 0
    self_count = 0
    for r in members:
        obj_count += len(r.object_coll_idxs) + int(
            getattr(r, "grasped_n_points", 0))
        if r.self_coll_idxs:
            self_count += len(r.self_coll_idxs) + int(
                getattr(r, "grasped_n_points", 0))
    if not isinstance(robot, MultiRobot) and net is None:
        if robot.self_pair_idxs is not None and len(robot.self_pair_idxs):
            p = np.asarray(robot.self_pair_idxs)
            pair_pos = p + obj_count      # self section follows obj section
    n_obj_total = obj_count

    extras_fn = None
    if grids:
        from .lanes_fk import _member_lanes_points

        def obj_pts_fn(q_cols):
            pts = []
            for mi, r in enumerate(members):
                q_i = q_cols[int(d_off[mi]):int(d_off[mi + 1])]
                Rb = tuple(tuple(float(base_R[mi, a, c]) for c in range(3))
                           for a in range(3))
                tb = tuple(float(base_t[mi, k]) for k in range(3))
                _, _, m_obj, _, _, _ = _member_lanes_points(r, q_i, Rb, tb)
                pts += m_obj
            return pts

        extras_fn = _grid_extras_fn(grids, obj_pts_fn, ws_dim,
                                    values_only=True)

    def _tile_cost(q, scene, extras, consts):
        dtype = q.dtype
        obj_pts, self_pts = [], []
        for mi, r in enumerate(members):
            sm = sms[mi]
            q_i = q[int(d_off[mi]):int(d_off[mi + 1])]
            Rb = tuple(tuple(float(base_R[mi, a, c2]) for c2 in range(3))
                       for a in range(3))
            tb = tuple(float(base_t[mi, k]) for k in range(3))
            R_w, t_w = fk_lanes(sm, q_i)
            R_wW = [_matmul3(Rb, R) for R in R_w]
            t_wW = []
            for t in t_w:
                tw = _matvec3(Rb, t)
                t_wW.append(tuple(tw[k] + tb[k] for k in range(3)))
            m_obj = [t_wW[li] for li in r.object_coll_idxs]
            m_self = ([t_wW[li] for li in r.self_coll_idxs]
                      if r.self_coll_idxs else [])
            gn = int(getattr(r, "grasped_n_points", 0))
            if gn > 0:
                gi = sm.link_index(r.link_name_grasped_object)
                gp_np = np.asarray(r.grasped_points)
                for gidx in range(gn):
                    gp = tuple(float(gp_np[gidx, k]) for k in range(3))
                    w = _matvec3(R_wW[gi], gp)
                    pt = tuple(w[k] + t_wW[gi][k] for k in range(3))
                    m_obj.append(pt)
                    if r.self_coll_idxs:
                        m_self.append(pt)
            obj_pts += m_obj
            self_pts += m_self
        pts = obj_pts + self_pts

        cost = None

        def acc(r):
            nonlocal cost
            t = r * r
            cost = t if cost is None else cost + t

        for p in range(n_obj_total):
            x = pts[p][:ws_dim]
            val = _static_scene_sdf(scene, x) if scene else None
            for gv in extras:          # grid fields: XLA-gathered values
                val = gv[p] if val is None else jnp.minimum(val, gv[p])
            acc(jax.nn.relu(float(obj_margins[p]) + cutoff - val))
            faces = [x[k] - float(ws_min[k]) for k in range(ws_dim)] + \
                    [float(ws_max[k]) - x[k] for k in range(ws_dim)]
            val_w = faces[0]
            for f in faces[1:]:
                val_w = jnp.minimum(val_w, f)
            acc(jax.nn.relu(float(obj_margins[p]) + cutoff - val_w))

        if pair_pos is not None:
            for ki, (pa, pb) in enumerate(pair_pos):
                pa, pb = int(pa), int(pb)
                diff = tuple(pts[pa][k] - pts[pb][k] for k in range(3))
                d2 = diff[0] * diff[0] + diff[1] * diff[1] \
                    + diff[2] * diff[2]
                nz = d2 > 0
                dist = jnp.where(nz, jnp.sqrt(jnp.where(nz, d2, 1.0)), 0.0)
                acc(jax.nn.relu(float(self_margins[ki]) - dist))
        if net_spec is not None:
            sd = _net_signed_distance(consts, net_spec[1], q)
            acc(jax.nn.relu(net_spec[1][5] - sd))
        return 0.5 * cost

    n_scene = len(scene_arrays)
    n_const = len(net_consts)

    def _kernel(n_extra, q_ref, *refs):
        extra_refs = refs[:n_extra]
        scene_refs = refs[n_extra:n_extra + n_scene]
        const_refs = refs[n_extra + n_scene:n_extra + n_scene + n_const]
        c_ref = refs[n_extra + n_scene + n_const]
        scene = _rebuild_scene(scene_spec, [r[...] for r in scene_refs])
        c_ref[...] = _tile_cost(q_ref[...], scene,
                                [r[...] for r in extra_refs],
                                [r[...] for r in const_refs])[None]

    @partial(jax.jit, static_argnames=("interpret",))
    def _run_kernel(q_cols, interpret=False):
        N = q_cols.shape[-1]
        tn = min(_TILE_N, N) if N % _TILE_N else _TILE_N
        N_pad = ((N + tn - 1) // tn) * tn
        if N_pad != N:
            q_cols = jnp.pad(q_cols, ((0, 0), (0, N_pad - N)))
        extras = extras_fn(q_cols) if extras_fn is not None else []
        extra_specs = [
            pl.BlockSpec((a.shape[0], tn), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
            for a in extras]
        scene_specs = [
            pl.BlockSpec(a.shape, (lambda i, nd=a.ndim: (0,) * nd),
                         memory_space=pltpu.VMEM)
            for a in list(scene_arrays) + list(net_consts)]
        cost = pl.pallas_call(
            partial(_kernel, len(extras)),
            out_shape=_out_struct((1, N_pad), q_cols.dtype, q_cols),
            grid=(N_pad // tn,),
            in_specs=[pl.BlockSpec((d, tn), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)]
            + extra_specs + scene_specs,
            out_specs=pl.BlockSpec((1, tn), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(q_cols, *extras,
          *[jnp.asarray(a) for a in scene_arrays],
          *[jnp.asarray(a) for a in net_consts])
        return cost[0, :N]

    def cost_fn(q_cols, interpret=False):
        if jax.default_backend() != "tpu" and not interpret:
            return xla_terms(q_cols, 1.0)[2]
        return _run_kernel(q_cols, interpret=interpret)

    return cost_fn
