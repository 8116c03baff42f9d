"""Sampling-based trajectory optimizers: MPPI-style stochastic GPMP (S-GPMP).

Implements the stochastic planner the reference ships presets for
(``get_sgpmp_params``, /root/reference/torch_robotics/environments/
env_grid_circles_2d.py:64-85): per iteration, sample K smooth perturbations
from the GP prior around the current mean trajectory, score them by
(collision + GP-prior) energy, and update the mean with exponentially
weighted averaging at the configured temperature.  Everything is a
fixed-iteration lax.scan, batched over independent problems.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .gp_prior import gp_Q_inv, gp_bridge_sampler_matrix, gp_transition

__all__ = ["SGPMPParams", "SGPMPResult", "sgpmp_solve"]


@dataclasses.dataclass(frozen=True)
class SGPMPParams:
    n_support_points: int = 64
    dt: float = 0.04
    opt_iters: int = 100
    num_samples: int = 64
    sigma_start: float = 1e-5
    sigma_gp: float = 1e-2
    sigma_goal_prior: float = 1e-5
    sigma_coll: float = 1e-5
    #: Scale-FREE softmax temperature.  Sample weights are computed on
    #: spread-normalized costs — ``softmax(-(c - min c) / (temperature *
    #: std(c)))`` over the K samples — so ``temperature`` is measured in
    #: units of the per-iteration cost standard deviation, NOT in absolute
    #: cost units (absolute costs here span 1e5-1e9 with the collision
    #: weight, which would saturate a fixed-temperature softmax to
    #: winner-take-all).  Values tuned for an absolute-cost softmax
    #: (e.g. the reference presets' ``temperature``) do not transfer;
    #: 1.0 means "weight decays over one cost-std".
    temperature: float = 1.0
    sigma_gp_sample: float = 0.2
    # per-iteration multiplier on the perturbation scale (annealing:
    # explore with large smooth moves early, refine with small ones late);
    # 1.0 = constant scale
    anneal: float = 1.0
    step_size: float = 0.5

    @classmethod
    def from_preset(cls, preset: dict) -> "SGPMPParams":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in preset.items() if k in known}
        kwargs = {k: (int(v) if k in ("n_support_points", "opt_iters",
                                      "num_samples") else v)
                  for k, v in kwargs.items()}
        return cls(**kwargs)


class SGPMPResult(NamedTuple):
    trajs: jnp.ndarray          # (..., H, 2d) final mean trajectories
    cost_trace: jnp.ndarray     # (opt_iters, ...) mean-trajectory costs


def _gp_energy(theta, start_state, goal_state, params):
    d = theta.shape[-1] // 2
    Phi = gp_transition(d, params.dt, theta.dtype)
    Qi = gp_Q_inv(d, params.dt, params.sigma_gp, theta.dtype)
    e = theta[..., 1:, :] - jnp.einsum("ij,...j->...i", Phi, theta[..., :-1, :])
    E = 0.5 * jnp.einsum("...ti,ij,...tj->...", e, Qi, e)
    E = E + 0.5 / params.sigma_start ** 2 * jnp.sum(
        jnp.square(theta[..., 0, :] - start_state), axis=-1)
    E = E + 0.5 / params.sigma_goal_prior ** 2 * jnp.sum(
        jnp.square(theta[..., -1, :] - goal_state), axis=-1)
    return E


@partial(jax.jit, static_argnames=("residual_fn", "params"))
def sgpmp_solve(residual_fn: Callable, theta0, start_state, goal_state,
                params: SGPMPParams, key=None) -> SGPMPResult:
    """theta0: (..., H, 2d) initial mean trajectories."""
    if key is None:
        key = jax.random.PRNGKey(0)
    m = theta0.shape[-1]
    d = m // 2
    lam = 1.0 / (params.sigma_coll ** 2)
    K = params.num_samples

    # batch-polymorphic residuals (PlanningTask) take the batched lanes FK
    # path (~20x the vmapped per-sample form); plain per-sample fns vmap.
    # When the task exposes the fused forward-only cost kernel
    # (collision_cost_lanes, ops/pallas_terms.py), candidate scoring —
    # the dominant work here: K samples per iteration — uses it directly
    # (cost VALUES only; this solver never differentiates the cost).
    batched = getattr(residual_fn, "supports_batch", False)
    cost_lanes = getattr(residual_fn, "collision_cost_lanes", None)

    def total_cost(theta):
        q_flat = theta[..., :d].reshape((-1, d))
        if cost_lanes is not None:
            c = cost_lanes(q_flat.T)
            coll = lam * jnp.sum(
                c.reshape(theta.shape[:-2] + (-1,)), axis=-1)
        else:
            r = (residual_fn(q_flat) if batched
                 else jax.vmap(residual_fn)(q_flat))
            coll = 0.5 * lam * jnp.sum(
                jnp.square(r).reshape(theta.shape[:-2] + (-1,)), axis=-1)
        return coll + _gp_energy(theta, start_state, goal_state, params)

    H = theta0.shape[-2]
    # exact endpoint-conditioned GP bridge sampler (one MXU matmul per
    # iteration); sigma_gp_sample is the process-noise scale of the
    # PERTURBATION prior, independent of the cost's sigma_gp
    M_sample = gp_bridge_sampler_matrix(
        d, H, params.dt, params.sigma_gp_sample, dtype=theta0.dtype)

    def step(carry, inp):
        key_t, scale = inp
        theta, cost = carry
        xi = jax.random.normal(key_t, (K,) + theta.shape[:-2] + (H * m,),
                               theta.dtype)
        noise = scale * (xi @ M_sample.T).reshape((K,) + theta.shape)
        cand = theta[None] + noise                 # (K, ..., H, 2d)
        costs = total_cost(cand)                   # (K, ...)
        # temperature acts on the RELATIVE spread of the K sample costs
        # (scale-free): absolute costs here are O(1e5-1e9) depending on the
        # collision weight, which saturates a fixed-temperature softmax to
        # winner-take-all for any usable temperature value
        spread = costs.std(axis=0, keepdims=True) + 1e-12
        w = jax.nn.softmax(-(costs - costs.min(axis=0, keepdims=True))
                           / (params.temperature * spread), axis=0)
        delta = jnp.einsum("k...,k...hm->...hm", w, noise)
        prop = theta + params.step_size * delta
        cost_prop = total_cost(prop)
        # monotone acceptance per problem: the hinge-cost landscape is
        # highly nonlinear at the sampling scale, so the MPPI-weighted
        # average can point uphill — without this guard the mean diverges
        # (cost trace 1.8e8 -> 1.4e9 over 50 iters, fraction-free 1.0 ->
        # 0.56 on Panda/EnvSpheres3D)
        accept = cost_prop < cost
        theta = jnp.where(accept[..., None, None], prop, theta)
        cost = jnp.where(accept, cost_prop, cost)
        return (theta, cost), cost

    keys = jax.random.split(key, params.opt_iters)
    scales = (params.anneal ** jnp.arange(params.opt_iters)).astype(
        theta0.dtype)
    (theta, _), cost_trace = jax.lax.scan(
        step, (theta0, total_cost(theta0)), (keys, scales))
    return SGPMPResult(trajs=theta, cost_trace=cost_trace)
