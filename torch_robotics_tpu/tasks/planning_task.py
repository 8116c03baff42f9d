"""PlanningTask: robot + environment -> batched collision / cost evaluation.

TPU-native re-design of the reference ``PlanningTask``
(/root/reference/torch_robotics/tasks/tasks.py:22-328).  The task composes the
collision fields (self / objects / extra objects / workspace bounds) and
exposes pure, jit-compiled evaluators over state batches of any leading shape
``(..., d)`` — the reference's shape-dispatch ladder (tasks.py:139-157)
disappears under broadcasting.

Parity notes:
- 'sdf' cost = self + objects + ws-bounds costs summed (tasks.py:227-230);
- 'occupancy' collision = logical OR of the three checks;
- rejection sampling of collision-free configurations is a fixed-budget
  masked computation (the reference loops with sys.exit on failure,
  tasks.py:103-129 — data-dependent control flow does not jit);
- trajectory splitting checks collisions on a linearly interpolated
  trajectory with margin 0 and joint limits on the support points
  (tasks.py:234-308).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..costs.fields import (object_collision_any, object_collision_cost,
                            object_collision_rbf, self_collision_any,
                            self_collision_cost, self_collision_rbf,
                            workspace_bounds_any, workspace_bounds_cost)
from ..trajectory.utils import interpolate_traj_via_points

__all__ = ["PlanningTask"]


class PlanningTask:
    def __init__(self, env=None, robot=None, ws_limits=None,
                 use_occupancy_map: bool = False, cell_size: float = 0.01,
                 obstacle_cutoff_margin: float = 0.01,
                 clamp_sdf_cost: bool = False):
        self.env = env
        self.robot = robot
        self.ws_limits = env.limits if ws_limits is None else jnp.asarray(ws_limits)
        self.ws_min = self.ws_limits[0]
        self.ws_max = self.ws_limits[1]
        self.obstacle_cutoff_margin = obstacle_cutoff_margin
        self.clamp_sdf_cost = clamp_sdf_cost

        self.use_occupancy_map = use_occupancy_map
        if use_occupancy_map:
            env.build_occupancy_map(cell_size=cell_size)

        self.df_obj_list = env.get_df_obj_list()
        self.df_extra_list = (env.get_df_obj_list(return_extra_objects_only=True)
                              if env.obj_extra_list is not None else [])

        self._cost_fn = jax.jit(self._compute_cost)
        self._coll_fn = jax.jit(self._compute_collision, static_argnames=("margin_override",))
        self._occ_fn = (jax.jit(self._compute_collision_occupancy)
                        if use_occupancy_map else None)
        self.collision_residuals = self._build_residual_fn()

    # ------------------------------------------------------------------
    # Core evaluators
    # ------------------------------------------------------------------
    def _collision_points(self, q):
        link_pos = self.robot.fk_map_collision(q)
        return (self.robot.object_collision_points(link_pos),
                self.robot.self_collision_points(link_pos))

    # the reference's self-collision fields use their own cutoff margin
    # (EmbodimentDistanceFieldBase cutoff_margin default,
    # distance_fields.py:92) — the STORM net field is built with it
    _NET_SELF_CUTOFF = 0.001
    # occupancy threshold of the learned net (trained at 0.02;
    # distance_fields.py:265)
    _NET_SELF_COLL_THRESHOLD = -0.05

    @property
    def self_collision_net(self):
        return getattr(self.robot, "self_collision_net", None)

    def _compute_cost(self, q):
        """'sdf' field-type cost per configuration: q (..., d) -> (...)."""
        obj_pts, self_pts = self._collision_points(q)
        cost = 0.0
        net = self.self_collision_net
        if net is not None:
            # learned self-collision field replaces the pair-distance field
            # (reference robot_panda.py:131-136 + distance_fields.py:231-266)
            c = self._NET_SELF_CUTOFF - net.signed_distance(q)
            cost = cost + (jax.nn.relu(c) if self.clamp_sdf_cost else c)
        elif self_pts is not None:
            cost = cost + self_collision_cost(
                self_pts, np.asarray(self.robot.self_pair_idxs),
                self.robot.self_margins, clamp=self.clamp_sdf_cost)
        if self.df_obj_list:
            cost = cost + object_collision_cost(
                self.df_obj_list, obj_pts, self.robot.object_margins,
                cutoff_margin=self.obstacle_cutoff_margin,
                clamp=self.clamp_sdf_cost)
        cost = cost + workspace_bounds_cost(
            obj_pts, self.ws_min, self.ws_max, self.robot.object_margins,
            cutoff_margin=self.obstacle_cutoff_margin,
            clamp=self.clamp_sdf_cost)
        return cost

    def _compute_collision(self, q, margin_override: Optional[float] = None):
        """'occupancy' field-type check: q (..., d) -> bool (...)."""
        obj_pts, self_pts = self._collision_points(q)
        if margin_override is None:
            obj_margins = self.robot.object_margins
            cutoff = self.obstacle_cutoff_margin
            self_margins = (self.robot.self_margins
                            if self_pts is not None else None)
        else:
            obj_margins = margin_override
            cutoff = 0.0
            self_margins = margin_override
        coll = jnp.zeros(q.shape[:-1], bool)
        net = self.self_collision_net
        if net is not None:
            # fixed threshold like the reference net check
            # (distance_fields.py:263-265), independent of margin overrides
            coll = coll | (net.signed_distance(q)
                           < self._NET_SELF_COLL_THRESHOLD)
        elif self_pts is not None:
            coll = coll | self_collision_any(
                self_pts, np.asarray(self.robot.self_pair_idxs), self_margins)
        if self.df_obj_list:
            coll = coll | object_collision_any(
                self.df_obj_list, obj_pts, obj_margins, cutoff_margin=cutoff)
        coll = coll | workspace_bounds_any(
            obj_pts, self.ws_min, self.ws_max, obj_margins,
            cutoff_margin=cutoff)
        return coll

    def _build_residual_fn(self):
        """Per-waypoint hinge collision residuals for Gauss-Newton solvers.

        Returns a stable function q (d,) -> (P,) stacking
        relu(margin + cutoff - min-object-sdf) per object-collision point,
        relu(margin - pair distance) per self-collision pair, and
        relu(margin + cutoff - min-face distance) per point for workspace
        bounds.  These are the residual-ized versions of the task's 'sdf'
        costs (tasks.py:227-230), suitable for J^T J Hessian assembly.
        """
        robot = self.robot
        df_obj_list = self.df_obj_list
        cutoff = self.obstacle_cutoff_margin
        ws_min, ws_max = self.ws_min, self.ws_max
        pair_idxs = (np.asarray(robot.self_pair_idxs)
                     if robot.self_pair_idxs is not None else None)

        net = getattr(robot, "self_collision_net", None)
        net_cutoff = self._NET_SELF_CUTOFF

        def residuals(q):
            link_pos = robot.fk_map_collision(q)
            obj_pts = robot.object_collision_points(link_pos)
            parts = []
            if df_obj_list:
                sdf = None
                for df in df_obj_list:
                    s = df.signed_distance(obj_pts)
                    sdf = s if sdf is None else jnp.minimum(sdf, s)
                parts.append(jax.nn.relu(robot.object_margins + cutoff - sdf))
            ws_d = jnp.min(jnp.concatenate(
                [obj_pts - ws_min, ws_max - obj_pts], axis=-1), axis=-1)
            parts.append(jax.nn.relu(robot.object_margins + cutoff - ws_d))
            if net is not None:
                parts.append(jax.nn.relu(
                    net_cutoff - net.signed_distance(q))[..., None])
            else:
                self_pts = robot.self_collision_points(link_pos)
                if self_pts is not None and len(pair_idxs) > 0:
                    from ..geom.sdf import safe_norm
                    a = self_pts[..., pair_idxs[:, 0], :]
                    b = self_pts[..., pair_idxs[:, 1], :]
                    parts.append(jax.nn.relu(robot.self_margins
                                             - safe_norm(a - b, axis=-1)))
            return jnp.concatenate(parts, axis=-1)

        # fast path: analytic residual Jacobians from point Jacobians (one FK
        # pass + cheap reverse sweeps instead of jacfwd through the FK chain)
        try:
            robot.fk_map_collision_with_jac(
                jnp.zeros((robot.q_dim,), jnp.float32))
            has_jac = True
        except NotImplementedError:
            has_jac = False

        if has_jac:
            from ..geom.sdf import safe_norm as _safe_norm

            def point_min_sdf(p):
                sdf = None
                for df in df_obj_list:
                    s = df.signed_distance(p)
                    sdf = s if sdf is None else jnp.minimum(sdf, s)
                return sdf

            def ws_min_dist(p):
                return jnp.min(jnp.concatenate([p - ws_min, ws_max - p]))

            def residuals_and_jacobian(q):
                """q (..., d) -> (r (..., P), J (..., P, d)); same residual
                ordering as ``residuals``: [objects, ws-bounds, self-pairs].
                Batch-polymorphic: batched calls route the FK + analytic
                point Jacobians through the lanes chain (~20x the vmapped
                per-sample form; solvers should call it on the whole
                flattened batch, not under jax.vmap)."""
                pts_full, J_full = robot.fk_map_collision_with_jac(q)
                obj_pts = robot.object_collision_points(pts_full)
                J_obj = robot.select_collision_jacobians(
                    J_full, robot.object_coll_idxs, robot.object_interpolate,
                    robot.object_num_interp)
                pshape = obj_pts.shape[:-1]
                flat_pts = obj_pts.reshape((-1, obj_pts.shape[-1]))
                rs, Js = [], []
                if df_obj_list:
                    sdf, g_p = jax.vmap(jax.value_and_grad(point_min_sdf))(
                        flat_pts)
                    sdf = sdf.reshape(pshape)
                    g_p = g_p.reshape(obj_pts.shape)
                    r = jax.nn.relu(robot.object_margins + cutoff - sdf)
                    act = (r > 0).astype(q.dtype)
                    rs.append(r)
                    Js.append(-act[..., None]
                              * jnp.einsum("...pi,...pij->...pj", g_p, J_obj))
                dval, g_w = jax.vmap(jax.value_and_grad(ws_min_dist))(flat_pts)
                dval = dval.reshape(pshape)
                g_w = g_w.reshape(obj_pts.shape)
                r_ws = jax.nn.relu(robot.object_margins + cutoff - dval)
                act_ws = (r_ws > 0).astype(q.dtype)
                rs.append(r_ws)
                Js.append(-act_ws[..., None]
                          * jnp.einsum("...pi,...pij->...pj", g_w, J_obj))
                if net is not None:
                    sd, vjp = jax.vjp(net.signed_distance, q)
                    g_net = vjp(jnp.ones_like(sd))[0]
                    r_n = jax.nn.relu(net_cutoff - sd)
                    act_n = (r_n > 0).astype(q.dtype)
                    rs.append(r_n[..., None])
                    Js.append((-act_n[..., None] * g_net)[..., None, :])
                elif pair_idxs is not None and len(pair_idxs) > 0:
                    self_pts = robot.self_collision_points(pts_full)
                    J_self = robot.select_collision_jacobians(
                        J_full, robot.self_coll_idxs)
                    diff = (self_pts[..., pair_idxs[:, 0], :]
                            - self_pts[..., pair_idxs[:, 1], :])
                    dist = _safe_norm(diff, axis=-1)
                    u = diff / jnp.maximum(dist, 1e-9)[..., None]
                    r_s = jax.nn.relu(robot.self_margins - dist)
                    act_s = (r_s > 0).astype(q.dtype)
                    dJ = (J_self[..., pair_idxs[:, 0], :, :]
                          - J_self[..., pair_idxs[:, 1], :, :])
                    Js.append(-act_s[..., None]
                              * jnp.einsum("...ki,...kij->...kj", u, dJ))
                    rs.append(r_s)
                return jnp.concatenate(rs, axis=-1), jnp.concatenate(Js, axis=-2)

            residuals_and_jacobian.supports_batch = True
            residuals.residuals_and_jacobian = residuals_and_jacobian

            # fully lane-vectorized GN terms (analytic scenes only); on TPU
            # the fused Pallas terms kernel (FK -> Jacobians -> SDF ->
            # hinge -> assembly in one VMEM pass, ~13x the XLA graph at
            # bench shapes) takes precedence where it applies — its terms
            # fn dispatches back to the XLA graph per call off-TPU
            from ..ops.lanes_fk import (lanes_supported_scene,
                                        obstacle_terms_lanes_factory)
            from ..ops.pallas_terms import (collision_cost_pallas_factory,
                                            obstacle_terms_pallas_factory)
            if lanes_supported_scene(self.df_obj_list):
                lanes_terms = (obstacle_terms_pallas_factory(self)
                               or obstacle_terms_lanes_factory(self))
                # forward-only per-waypoint cost kernel (no Jacobians):
                # the sampling/line-search solvers score candidates with
                # cost VALUES only — q_cols (d, N) -> 0.5 sum r^2 (N,),
                # unscaled.  NOT differentiable (pallas); solvers needing
                # gradients use obstacle_terms_lanes.
                cost_lanes = collision_cost_pallas_factory(self)
                if cost_lanes is not None:
                    residuals.collision_cost_lanes = cost_lanes
                if lanes_terms is not None:
                    residuals.obstacle_terms_lanes = lanes_terms

        # the function is batch-polymorphic (q (..., d) -> (..., P)):
        # solvers that only need residual VALUES call it on the whole
        # flattened batch — the batched lanes FK path is ~20x the vmapped
        # per-sample form on TPU (see robots/panda.py fk_map_collision)
        residuals.supports_batch = True
        return residuals

    def compute_collision_cost(self, x, field_type: str = "sdf"):
        """x: (..., d_state) states -> per-waypoint cost (...).

        ``field_type`` selects the reference cost framework's three modes
        (distance_fields.py:110-130): 'sdf' (the hinge distance cost the
        solvers use), 'rbf' (smooth Gaussian-of-distance surrogate used by
        downstream sampling/diffusion planners), or 'occupancy' (binary,
        cast to float).
        """
        if field_type == "sdf":
            return self._cost_fn(self.robot.get_position(x))
        if field_type == "rbf":
            return self.compute_collision_cost_rbf(x)
        if field_type == "occupancy":
            return self.compute_collision(x).astype(x.dtype)
        raise NotImplementedError(f"field_type {field_type}")

    def compute_collision_cost_rbf(self, x, margin: Optional[float] = None):
        """'rbf' field-type cost (reference distance_fields.py:187-192 +
        274-278 formulas, dispatched per :110-112): Gaussian RBF of the
        object SDFs summed over objects and points, plus the full pairwise
        point RBF matrix when the robot self-collides.  ``margin`` defaults
        to the task's cutoff margin like the reference kwargs."""
        m = self.obstacle_cutoff_margin if margin is None else margin
        q = self.robot.get_position(x)
        obj_pts, self_pts = self._collision_points(q)
        cost = jnp.zeros(q.shape[:-1], q.dtype)
        if self.df_obj_list:
            cost = cost + object_collision_rbf(self.df_obj_list, obj_pts, m)
        if self_pts is not None:
            cost = cost + self_collision_rbf(self_pts, m)
        return cost

    def compute_collision_cost_extra_objects(self, x):
        """Cost against the extra (movable) objects only — the separate field
        the reference builds for planners that treat dynamic obstacles
        independently (tasks.py:60-72)."""
        if not self.df_extra_list:
            return jnp.zeros(x.shape[:-1], x.dtype)
        q = self.robot.get_position(x)
        obj_pts, _ = self._collision_points(q)
        return object_collision_cost(
            self.df_extra_list, obj_pts, self.robot.object_margins,
            cutoff_margin=self.obstacle_cutoff_margin,
            clamp=self.clamp_sdf_cost)

    def get_collision_fields(self):
        """Reference-compatible accessor (tasks.py:88-92): the distance-field
        object lists backing the task's cost terms."""
        return {"self": (np.asarray(self.robot.self_pair_idxs)
                         if self.robot.self_pair_idxs is not None else None),
                "objects": self.df_obj_list,
                "ws_bounds": (self.ws_min, self.ws_max)}

    def get_collision_fields_extra_objects(self):
        return self.df_extra_list

    def compute_collision(self, x, margin=None):
        """x: (..., d_state) states -> per-waypoint collision flags (...)."""
        q = self.robot.get_position(x)
        if self.use_occupancy_map:
            return self._occ_fn(q)
        return self._coll_fn(q, margin_override=margin)

    def _compute_collision_occupancy(self, q):
        """Occupancy-grid collision check (the reference's occupancy branch,
        tasks.py:159-199, is dead code there; implemented properly here):
        a configuration collides iff q is outside the joint limits, any
        task-space point leaves the workspace, or any point's occupancy cell
        is occupied."""
        out_of_limits = jnp.any((q < self.robot.q_min)
                                | (q > self.robot.q_max), axis=-1)
        pts = self.robot.object_collision_points(
            self.robot.fk_map_collision(q))
        out_of_ws = jnp.any(jnp.any(
            (pts < self.ws_min) | (pts > self.ws_max), axis=-1), axis=-1)
        occ = self.env.occupancy_map.get_collisions(pts)
        hit = jnp.any(occ > 0, axis=-1)
        return out_of_limits | out_of_ws | hit

    # ------------------------------------------------------------------
    # Sampling (tasks.py:97-129)
    # ------------------------------------------------------------------
    def sample_q(self, key, without_collision: bool = True, **kwargs):
        if without_collision:
            return self.random_coll_free_q(key, **kwargs)
        return self.robot.random_q(key, **kwargs)

    def random_coll_free_q(self, key, n_samples: int = 1,
                           max_samples: int = 1000):
        """Fixed-budget rejection sampling.

        Draws ``max_samples`` candidates, returns the first ``n_samples``
        collision-free ones plus the number found (mask-based; callers should
        check ``n_valid`` — the reference sys.exit's instead, tasks.py:126-127).
        """
        qs = self.robot.random_q(key, max_samples)
        in_coll = self._coll_fn(qs, margin_override=None)
        free_idx = jnp.nonzero(~in_coll, size=n_samples, fill_value=0)[0]
        n_valid = jnp.minimum(jnp.sum(~in_coll), n_samples)
        samples = qs[free_idx]
        if n_samples == 1:
            samples = samples[0]
        return samples, n_valid

    # ------------------------------------------------------------------
    # Trajectory splitting + metrics (tasks.py:234-328)
    # ------------------------------------------------------------------
    def trajs_collision_masks(self, trajs, num_interpolation: int = 5):
        """Pure: per-trajectory collision flag and per-waypoint flags.

        trajs: (..., H, D) -> (traj_in_collision (...), waypoint_colls
        (..., H_interp)).  A trajectory is free iff no interpolated waypoint
        collides AND all support positions are inside the joint limits.
        """
        trajs_pos = self.robot.get_position(trajs)
        interp = interpolate_traj_via_points(trajs_pos, num_interpolation)
        waypoint_colls = self._coll_fn(interp, margin_override=0.0)
        any_coll = jnp.any(waypoint_colls, axis=-1)
        in_limits = jnp.all((trajs_pos >= self.robot.q_min)
                            & (trajs_pos <= self.robot.q_max), axis=(-1, -2))
        return any_coll | ~in_limits, waypoint_colls

    def get_trajs_collision_and_free(self, trajs, return_indices=False,
                                     num_interpolation: int = 5):
        """Host-side split into colliding / free trajectories."""
        trajs = jnp.asarray(trajs)
        coll_mask, waypoint_colls = self.trajs_collision_masks(
            trajs, num_interpolation)
        coll_mask_np = np.asarray(coll_mask).reshape(-1)
        flat = np.asarray(trajs).reshape((-1,) + trajs.shape[-2:])
        coll_idxs = np.nonzero(coll_mask_np)[0]
        free_idxs = np.nonzero(~coll_mask_np)[0]
        trajs_coll = flat[coll_idxs] if len(coll_idxs) else None
        trajs_free = flat[free_idxs] if len(free_idxs) else None
        if return_indices:
            return trajs_coll, coll_idxs, trajs_free, free_idxs, waypoint_colls
        return trajs_coll, trajs_free

    def compute_fraction_free_trajs(self, trajs, **kwargs):
        coll_mask, _ = self.trajs_collision_masks(trajs, **kwargs)
        return float(jnp.mean(~coll_mask))

    def compute_collision_intensity_trajs(self, trajs, **kwargs):
        _, waypoint_colls = self.trajs_collision_masks(trajs, **kwargs)
        return float(jnp.mean(waypoint_colls))

    def compute_success_free_trajs(self, trajs, **kwargs):
        coll_mask, _ = self.trajs_collision_masks(trajs, **kwargs)
        return int(jnp.any(~coll_mask))

    def distance_q(self, q1, q2):
        return self.robot.distance_q(q1, q2)
