"""Kinematic execution harness: PD-tracked trajectory rollout + contact check.

TPU-native replacement for the role of the reference's Isaac Gym harness
(/root/reference/torch_robotics/isaac_gym_envs/motion_planning_envs.py):
execute planned joint trajectories on N parallel simulated robots with PD
position/velocity control on double-integrator joint dynamics, detect
collisions ("contacts") with the task's collision checker each step, and
freeze robots once they collide (motion_planning_envs.py:656-741).  Pure
lax.scan — thousands of robots execute in parallel on-device.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["PDControllerParams", "ExecutionResult", "execute_trajectories"]


@dataclasses.dataclass(frozen=True)
class PDControllerParams:
    kp: float = 50.0
    kd: float = 10.0
    dt: float = 0.04
    substeps: int = 4
    max_acc: float = 100.0


class ExecutionResult(NamedTuple):
    q: jnp.ndarray               # (..., H, d) executed positions
    qd: jnp.ndarray              # (..., H, d) executed velocities
    contact: jnp.ndarray         # (..., H) bool contact at each step
    frozen: jnp.ndarray          # (...,) robot froze due to contact
    tracking_error: jnp.ndarray  # (...,) mean |q - q_ref|


@partial(jax.jit, static_argnames=("collision_fn", "params"))
def execute_trajectories(collision_fn, trajs_pos, trajs_vel,
                         params: PDControllerParams = PDControllerParams()):
    """Track reference trajectories with a PD controller.

    collision_fn: q (..., d) -> bool (...) contact check (e.g.
    ``task._compute_collision`` via a wrapper).
    trajs_pos/vel: (..., H, d) reference waypoints.
    """
    H = trajs_pos.shape[-2]
    q0 = trajs_pos[..., 0, :]
    qd0 = jnp.zeros_like(q0)
    sub_dt = params.dt / params.substeps

    def step(carry, ref):
        q, qd, frozen = carry
        q_ref, qd_ref = ref

        def substep(state, _):
            q_s, qd_s = state
            acc = params.kp * (q_ref - q_s) + params.kd * (qd_ref - qd_s)
            acc = jnp.clip(acc, -params.max_acc, params.max_acc)
            qd_n = qd_s + acc * sub_dt
            q_n = q_s + qd_n * sub_dt
            return (q_n, qd_n), None

        (q_new, qd_new), _ = jax.lax.scan(substep, (q, qd), None,
                                          length=params.substeps)
        contact = collision_fn(q_new)
        # frozen robots stop moving (motion_planning_envs.py:714-726)
        q_next = jnp.where(frozen[..., None], q, q_new)
        qd_next = jnp.where(frozen[..., None], jnp.zeros_like(qd), qd_new)
        frozen_next = frozen | contact
        return (q_next, qd_next, frozen_next), (q_next, qd_next, contact)

    refs = (jnp.moveaxis(trajs_pos, -2, 0), jnp.moveaxis(trajs_vel, -2, 0))
    frozen0 = jnp.zeros(q0.shape[:-1], bool)
    (_, _, frozen), (qs, qds, contacts) = jax.lax.scan(
        step, (q0, qd0, frozen0), refs)
    qs = jnp.moveaxis(qs, 0, -2)
    qds = jnp.moveaxis(qds, 0, -2)
    contacts = jnp.moveaxis(contacts, 0, -1)
    err = jnp.mean(jnp.abs(qs - trajs_pos), axis=(-1, -2))
    return ExecutionResult(q=qs, qd=qds, contact=contacts, frozen=frozen,
                           tracking_error=err)
