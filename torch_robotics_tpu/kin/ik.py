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

__all__ = ["IKResult", "ik_loss_per_q", "ik_valid_mask", "inverse_kinematics"]


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


@partial(jax.jit, static_argnames=("link_name", "max_iters", "lr"))
def _ik_run(model, H_target, link_name, q0, lower, upper,
            max_iters, lr, se3_eps, q_rest):
    opt = optax.adam(lr)

    def loss_fn(q):
        return jnp.sum(ik_loss_per_q(model, q, H_target, link_name,
                                     lower=lower, upper=upper, q_rest=q_rest))

    def step(carry, i):
        q, opt_state, valid, iters_to_valid = carry
        new_valid, _ = ik_valid_mask(model, q, H_target, link_name,
                                     lower=lower, upper=upper, se3_eps=se3_eps)
        iters_to_valid = jnp.where(new_valid & ~valid, i, iters_to_valid)
        valid = valid | new_valid
        g = jax.grad(loss_fn)(q)
        updates, opt_state = opt.update(g, opt_state, q)
        q = optax.apply_updates(q, updates)
        return (q, opt_state, valid, iters_to_valid), None

    valid0 = jnp.zeros(q0.shape[0], bool)
    iters0 = jnp.full(q0.shape[0], max_iters, jnp.int32)
    (q, _, valid, iters), _ = jax.lax.scan(
        step, (q0, opt.init(q0), valid0, iters0), jnp.arange(max_iters))
    final_valid, err = ik_valid_mask(model, q, H_target, link_name,
                                     lower=lower, upper=upper, se3_eps=se3_eps)
    return IKResult(q=q, valid=valid | final_valid, err_se3=err,
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
                   max_iters, lr, se3_eps, q_rest)
