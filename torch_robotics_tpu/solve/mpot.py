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

from .gp_prior import gp_Q_inv, gp_transition

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
    """Entropic OT between uniform marginals: C (..., n, m) -> plan P."""
    n, m = C.shape[-2], C.shape[-1]
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


@partial(jax.jit, static_argnames=("state_cost_fn", "params"))
def mpot_solve(state_cost_fn: Callable, theta0, start_state, goal_state,
               params: MPOTParams, key=None) -> MPOTResult:
    """Optimize trajectories with Sinkhorn steps.

    state_cost_fn: x (..., 2d) -> (...) per-waypoint state cost (e.g. the
    task's collision cost on the position part); theta0: (..., H, 2d).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    H = theta0.shape[-2]
    m_state = theta0.shape[-1]
    d = m_state // 2
    D = jnp.asarray(polytope_vertices(m_state, params.polytope),
                    theta0.dtype)                        # (V, 2d)
    Phi = gp_transition(d, params.dt, theta0.dtype)
    Qi = gp_Q_inv(d, params.dt, params.sigma_gp, theta0.dtype)

    def waypoint_cost(theta):
        """Per-waypoint cost used for probing: collision + the local GP
        coupling to both neighbors + start/goal pins (scatter-free)."""
        coll = state_cost_fn(theta)
        e_fwd = theta[..., 1:, :] - jnp.einsum(
            "ij,...j->...i", Phi, theta[..., :-1, :])
        gp_fwd = jnp.einsum("...ti,ij,...tj->...t", e_fwd, Qi, e_fwd)
        gp_cost = (jnp.pad(gp_fwd, [(0, 0)] * (gp_fwd.ndim - 1) + [(0, 1)])
                   + jnp.pad(gp_fwd, [(0, 0)] * (gp_fwd.ndim - 1) + [(1, 0)]))
        pin_start = (jnp.sum(jnp.square(theta[..., 0, :] - start_state), -1)
                     / params.sigma_start ** 2)
        pin_goal = (jnp.sum(jnp.square(theta[..., -1, :] - goal_state), -1)
                    / params.sigma_goal ** 2)
        pin = jnp.concatenate(
            [pin_start[..., None], jnp.zeros(theta.shape[:-2] + (H - 2,),
                                             theta.dtype),
             pin_goal[..., None]], axis=-1)
        return params.w_coll * coll + params.w_smooth * gp_cost + pin

    def step(carry, it):
        theta, = carry
        anneal = 1.0 / (1.0 + params.eps_annealing * it.astype(theta.dtype))
        step_r = params.step_radius * anneal
        probe_r = params.probe_radius * anneal

        # probe costs: (..., H, V) averaged over probe points
        def probe_cost(frac):
            cand = theta[..., None, :] + frac * D        # (..., H, V, 2d)
            cand_flat = jnp.moveaxis(cand, -2, 0)        # (V, ..., H, 2d)
            c = jax.vmap(waypoint_cost)(cand_flat)       # (V, ..., H)
            return jnp.moveaxis(c, 0, -1)                # (..., H, V)

        # average over probe fractions (static python loop)
        C = 0.0
        fracs = np.linspace(1.0 / params.num_probe, 1.0, params.num_probe)
        for f in fracs:
            C = C + probe_cost(probe_r * float(f))
        C = C / params.num_probe

        if params.coupling == "full":
            # paper-faithful Sinkhorn Step: flatten the whole ensemble into
            # one point set — the uniform vertex marginal (1/V mass per
            # direction) then couples all waypoints of all samples, forcing
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
        disp = jnp.einsum("...hv,vd->...hd", P * scale, D) * step_r
        theta_next = theta + disp
        cost_now = jnp.sum(waypoint_cost(theta_next), axis=-1)
        return (theta_next,), cost_now

    (theta,), cost_trace = jax.lax.scan(
        step, (theta0,), jnp.arange(params.opt_iters))
    return MPOTResult(trajs=theta, cost_trace=cost_trace)
