"""MPOT: batched trajectory optimization via Sinkhorn steps.

Implements the optimal-transport planner family the reference ships
hyperparameters for (``get_mpot_params``,
/root/reference/torch_robotics/environments/env_grid_circles_2d.py:87-119;
planner itself lives in the sibling MPOT repo — "Accelerating Motion Planning
via Optimal Transport", Le et al., NeurIPS 2023).

Per iteration (the Sinkhorn Step):
1. a polytope direction set D (orthoplex +-e_i, or cube vertices for small
   state dims) is scaled by ``step_radius``;
2. every waypoint probes the cost at ``num_probe`` points along each
   direction out to ``probe_radius``;
3. an entropic OT plan P between waypoints (uniform mass) and directions
   (uniform mass) is solved with Sinkhorn iterations at regularization
   ``reg``;
4. waypoints move by the barycentric displacement x += step_radius * (P/a) D,
   with ``eps_annealing`` shrinking the step over iterations.

The GP prior and start/goal factors enter through the probe cost, so the
update stays smooth and pinned.  Everything is a fixed-iteration lax.scan,
batched over problems.
"""
from __future__ import annotations

import dataclasses
import itertools
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MPOTParams", "MPOTResult", "mpot_solve", "polytope_vertices"]


@dataclasses.dataclass(frozen=True)
class MPOTParams:
    n_support_points: int = 64
    dt: float = 0.04
    opt_iters: int = 100
    reg: float = 0.01               # entropic regularization
    num_probe: int = 5
    num_sinkhorn_iters: int = 5
    step_radius: float = 0.038
    probe_radius: float = 0.05
    polytope: str = "cube"          # 'cube' | 'orthoplex'
    eps_annealing: float = 0.02
    # collision-guarded Laplacian smoothing iterations after the Sinkhorn
    # scan (the OT update has a jitter floor set by the annealed step
    # radius; the guarded smoother converges the path without letting any
    # waypoint trade into a higher-than-zero collision cost)
    smooth_iters: int = 50
    smooth_alpha: float = 0.3
    w_smooth: float = 1e-7
    w_coll: float = 1.7e-3
    sigma_gp: float = 0.08
    sigma_start: float = 1e-4
    sigma_goal: float = 1e-4
    # 'full': one OT problem over ALL waypoints of the whole trajectory
    # ensemble (the paper's Sinkhorn Step operates on the flattened point
    # set — vertex marginals couple every waypoint of every sample);
    # 'trajectory': one OT problem per trajectory (H x V)
    coupling: str = "full"

    @classmethod
    def from_preset(cls, preset: dict) -> "MPOTParams":
        solver = preset.get("solver_params", {}) or {}
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in preset.items() if k in known}
        if "reg" in solver:
            kwargs["reg"] = solver["reg"]
        if "numInnerItermax" in solver:
            kwargs["num_sinkhorn_iters"] = int(solver["numInnerItermax"])
        kwargs = {k: (int(v) if k in ("n_support_points", "opt_iters",
                                      "num_probe") else v)
                  for k, v in kwargs.items()}
        return cls(**kwargs)


class MPOTResult(NamedTuple):
    trajs: jnp.ndarray
    cost_trace: jnp.ndarray


def polytope_vertices(dim: int, kind: str = "cube") -> np.ndarray:
    """Unit direction set: cube vertices (2^dim, normalized) or orthoplex
    (+-e_i, 2*dim).  Cube falls back to orthoplex beyond 2^10 vertices."""
    if kind == "cube" and dim <= 10:
        verts = np.array(list(itertools.product([-1.0, 1.0], repeat=dim)))
        return verts / np.sqrt(dim)
    eye = np.eye(dim)
    return np.concatenate([eye, -eye], axis=0)


def _sinkhorn(C, reg, iters):
    """Entropic OT between uniform marginals: C (..., n, m) -> plan P.

    The cost matrix is normalized to [0, 1] per OT problem before the Gibbs
    kernel — the coupling then depends only on RELATIVE costs, making the
    preset ``reg`` meaningful regardless of the absolute scale of the
    cost weights (raw probe-cost differences here are ~1e-4, which against
    reg=0.01 would make the plan near-uniform and the step a no-op).
    """
    n, m = C.shape[-2], C.shape[-1]
    lo = jnp.min(C, axis=(-2, -1), keepdims=True)
    hi = jnp.max(C, axis=(-2, -1), keepdims=True)
    C = (C - lo) / jnp.maximum(hi - lo, 1e-30)
    K = jnp.exp(-(C - jnp.min(C, axis=-1, keepdims=True)) / reg)
    u = jnp.ones_like(C[..., :, 0]) / n

    def body(u_c, _):
        v = (1.0 / m) / jnp.maximum(
            jnp.einsum("...nm,...n->...m", K, u_c), 1e-30)
        u_n = (1.0 / n) / jnp.maximum(
            jnp.einsum("...nm,...m->...n", K, v), 1e-30)
        return u_n, None

    u, _ = jax.lax.scan(body, u, None, length=iters)
    v = (1.0 / m) / jnp.maximum(jnp.einsum("...nm,...n->...m", K, u), 1e-30)
    return u[..., :, None] * K * v[..., None, :]


@partial(jax.jit, static_argnames=("state_cost_fn", "params",
                                   "hinge_cost_fn"))
def mpot_solve(state_cost_fn: Callable, theta0, start_state, goal_state,
               params: MPOTParams, key=None,
               hinge_cost_fn: Callable = None) -> MPOTResult:
    """Optimize trajectories with Sinkhorn steps.

    state_cost_fn: x (..., 2d) -> (...) per-waypoint state cost (e.g. the
    task's collision cost on the position part); theta0: (..., H, 2d).

    Design notes (differences from a literal transcription of the MPOT
    sibling repo, chosen after measurement):
    - the Sinkhorn Step moves the waypoint POSITIONS; velocities are the
      central finite differences of the optimized positions (the
      constant-velocity GP's maximum-a-posteriori velocity given the
      positions).  Letting the polytope move velocities independently left
      them unanchored — smoothness ~56 vs GPMP2's ~7 on GridCircles2D.
    - start/goal waypoints are pinned exactly (masked displacement) instead
      of competing with the OT update through a soft pin cost.
    - the smoothness probe cost is the local acceleration factor
      ||x_{t+1} - 2 y + x_{t-1}||^2 at the GP-prior scale
      w_smooth / (sigma_gp^2 dt^3), evaluated with the neighbors fixed —
      the waypoint-local restriction of the GP prior used for probing.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    H = theta0.shape[-2]
    m_state = theta0.shape[-1]
    d = m_state // 2
    dtype = theta0.dtype
    X0 = theta0[..., :d]
    # exact endpoint pins
    X0 = jnp.concatenate([
        jnp.broadcast_to(start_state[..., None, :d], X0[..., :1, :].shape),
        X0[..., 1:-1, :],
        jnp.broadcast_to(goal_state[..., None, :d], X0[..., -1:, :].shape),
    ], axis=-2)
    D = jnp.asarray(polytope_vertices(d, params.polytope), dtype)  # (V, d)
    # The waypoint-local acceleration factor acts as a spring toward the
    # straight line between the (fixed) neighbors, so it systematically
    # overestimates the smoothness cost of COORDINATED moves (all waypoints
    # shifting together adds no curvature) and measurably vetoes collision
    # avoidance at any scale tied to the GP precision (29% of waypoints
    # stuck inside obstacles at w_smooth/(sigma_gp^2 dt)).  The OT stage
    # therefore probes COLLISION ONLY, and the GP smoothness objective is
    # realized by the collision-guarded smoothing pass below, which cannot
    # trade clearance away.  w_smooth scales the smoothing pass length.
    w_acc = 0.0
    smooth_iters = params.smooth_iters if params.w_smooth > 0 else 0
    move_mask = jnp.concatenate([
        jnp.zeros((1, 1), dtype), jnp.ones((H - 2, 1), dtype),
        jnp.zeros((1, 1), dtype)])                        # (H, 1)

    def raw_cost(pts):
        zeros_vel = jnp.zeros_like(pts)
        return state_cost_fn(jnp.concatenate([pts, zeros_vel], -1))

    def hinge_cost(pts):
        """Non-negative clearance-violation cost: zero iff clear of the
        margin.  Used for the smoother guard and the clearance descent.
        Callers should pass ``hinge_cost_fn`` built from per-term CLAMPED
        costs (e.g. a PlanningTask with clamp_sdf_cost=True) — relu of the
        raw SUMMED cost is vacuous because its workspace-bounds term is
        negative almost everywhere and swallows obstacle violations."""
        if hinge_cost_fn is not None:
            zeros_vel = jnp.zeros_like(pts)
            return hinge_cost_fn(jnp.concatenate([pts, zeros_vel], -1))
        return jax.nn.relu(raw_cost(pts))

    def _with_midpoints(fn, cand, x_prev, x_next):
        """fn evaluated at a candidate waypoint AND its two segment
        midpoints (neighbors fixed) — penalizes segments that cross
        obstacles between clear waypoints."""
        return (fn(cand) + 0.5 * fn(0.5 * (cand + x_prev))
                + 0.5 * fn(0.5 * (cand + x_next)))

    def waypoint_cost(cand, x_prev, x_next):
        """OT probe cost: UNCLAMPED, so free-space waypoints still see a
        long-range gradient (with a hinged cost their probe rows are
        constant and the uniform vertex marginal forces them to random-walk
        at full step size — measured ~25% of waypoints driven INTO
        obstacles at equilibrium)."""
        return _with_midpoints(raw_cost, cand, x_prev, x_next)

    def guard_cost(cand, x_prev, x_next):
        return _with_midpoints(hinge_cost, cand, x_prev, x_next)

    def neighbors(X):
        x_prev = jnp.concatenate([X[..., :1, :], X[..., :-1, :]], -2)
        x_next = jnp.concatenate([X[..., 1:, :], X[..., -1:, :]], -2)
        return x_prev, x_next

    def probe_costs(X, frac, D):
        """Cost of moving each waypoint alone by frac * D: (..., H, V)."""
        cand = X[..., :, None, :] + frac * D              # (..., H, V, d)
        x_prev, x_next = neighbors(X)
        coll = waypoint_cost(cand, x_prev[..., :, None, :],
                             x_next[..., :, None, :])
        acc = (x_next[..., :, None, :] - 2.0 * cand
               + x_prev[..., :, None, :])
        smooth = w_acc * jnp.sum(jnp.square(acc), -1)
        return params.w_coll * coll + smooth

    def traj_cost(X):
        x_prev, x_next = neighbors(X)
        coll = waypoint_cost(X, x_prev, x_next)
        acc = X[..., 2:, :] - 2.0 * X[..., 1:-1, :] + X[..., :-2, :]
        smooth = w_acc * jnp.sum(jnp.square(acc), -1)
        return (params.w_coll * jnp.sum(coll, -1)
                + jnp.sum(smooth, -1))

    def step(carry, it):
        X, = carry
        anneal = 1.0 / (1.0 + params.eps_annealing * it.astype(dtype))
        step_r = params.step_radius * anneal
        probe_r = params.probe_radius * anneal

        # random polytope rotation per iteration (the paper's unbiasedness
        # trick): a fixed vertex set can only ever move waypoints along the
        # same 2^d diagonals, which skims obstacles instead of threading
        # gaps; rotating the direction set densifies the reachable
        # directions over iterations
        k_it = jax.random.fold_in(key, it)
        A = jax.random.normal(k_it, (d, d), dtype)
        Q, _ = jnp.linalg.qr(A)
        D_it = D @ Q

        # average over probe fractions (static python loop)
        C = 0.0
        fracs = np.linspace(1.0 / params.num_probe, 1.0, params.num_probe)
        for f in fracs:
            C = C + probe_costs(X, probe_r * float(f), D_it)
        C = C / params.num_probe

        if params.coupling == "full":
            # paper-faithful Sinkhorn Step: flatten the whole ensemble into
            # one point set — the uniform vertex marginal (1/V mass per
            # direction) couples all waypoints of all samples, forcing
            # direction diversity across the ensemble
            batch = C.shape[:-2]
            n_pts = 1
            for s in batch:
                n_pts *= s
            n_pts *= H
            C_flat = C.reshape((n_pts, C.shape[-1]))
            P = _sinkhorn(C_flat, params.reg,
                          params.num_sinkhorn_iters).reshape(C.shape)
            scale = float(n_pts)
        else:
            P = _sinkhorn(C, params.reg, params.num_sinkhorn_iters)
            scale = float(H)
        # barycentric displacement: x += step * (P / a) D, a = 1/n
        disp = jnp.einsum("...hv,vd->...hd", P * scale, D_it) * step_r
        X_next = X + move_mask * disp
        return (X_next,), traj_cost(X_next)

    (X,), cost_trace = jax.lax.scan(
        step, (X0,), jnp.arange(params.opt_iters))

    # collision-guarded Laplacian smoothing: pull each interior waypoint
    # toward its neighbors' midpoint, accepting per waypoint only when the
    # collision cost does not become positive (within margin+cutoff of an
    # obstacle) unless it already was — removes the OT jitter floor while
    # never smoothing a free path back into an obstacle
    def total_hinge(Xh):
        xp, xn = neighbors(Xh)
        return jnp.sum(guard_cost(Xh, xp, xn))

    def clearance_step(X, _):
        # the OT stage converges onto obstacle boundaries (tangent wraps at
        # sdf ~ 0, which interpolated collision checks flag); unit gradient
        # descent on the hinged cost pushes in-margin waypoints out and is
        # exactly zero elsewhere
        g = jax.grad(total_hinge)(X)
        g_norm = jnp.linalg.norm(g, axis=-1, keepdims=True)
        unit = g / jnp.maximum(g_norm, 1e-12)
        return X - 0.01 * move_mask * unit * (g_norm > 0), None

    def smooth_step(X, _):
        # guarded Laplacian smoothing: hinge cost with segment midpoints is
        # zero iff waypoint AND its two half-segments are clear, so the
        # smoother can never undo the clearance phase
        x_prev, x_next = neighbors(X)
        mid = 0.5 * (x_prev + x_next)
        cand = X + params.smooth_alpha * move_mask * (mid - X)
        c_old = guard_cost(X, x_prev, x_next)
        c_new = guard_cost(cand, x_prev, x_next)
        ok = (c_new <= 0.0) | (c_new <= c_old)
        X_next = jnp.where(ok[..., None], cand, X)
        return X_next, None

    if smooth_iters > 0:
        X, _ = jax.lax.scan(clearance_step, X, None, length=smooth_iters)
        X, _ = jax.lax.scan(smooth_step, X, None, length=smooth_iters)

    # velocities: central finite differences of the optimized positions
    # (one-sided at the ends); start/goal velocities from the given states
    v_mid = (X[..., 2:, :] - X[..., :-2, :]) / (2.0 * params.dt)
    v = jnp.concatenate([
        jnp.broadcast_to(start_state[..., None, d:], X[..., :1, :].shape),
        v_mid,
        jnp.broadcast_to(goal_state[..., None, d:], X[..., -1:, :].shape),
    ], axis=-2)
    theta = jnp.concatenate([X, v], axis=-1)
    return MPOTResult(trajs=theta, cost_trace=cost_trace)
