"""MotionPlanningController: execute planned trajectories and score them.

Mirrors the controller role of the reference Isaac harness
(/root/reference/torch_robotics/isaac_gym_envs/motion_planning_envs.py:651-741):
runs B planned trajectories through the PD execution harness and reports how
many executed without contact, tracking errors, and the executed states.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .rollout import ExecutionResult, PDControllerParams, execute_trajectories

__all__ = ["MotionPlanningController"]


class MotionPlanningController:
    def __init__(self, task, params: Optional[PDControllerParams] = None):
        self.task = task
        self.params = params or PDControllerParams()
        robot = task.robot

        def collision_fn(q):
            return task._compute_collision(q, margin_override=None)

        self._collision_fn = collision_fn
        self._robot = robot

    def run_trajectories(self, trajs, start_states_join=None,
                         goal_states_join=None):
        """trajs: (B, H, d_state) planned trajectories.

        Returns (ExecutionResult, n_contact_free) — the reference prints the
        free-trajectory count (motion_planning_envs.py:738).
        """
        trajs = jnp.asarray(trajs)
        pos = self._robot.get_position(trajs)
        vel = self._robot.get_velocity(trajs)
        result = execute_trajectories(self._collision_fn, pos, vel,
                                      self.params)
        n_free = int(jnp.sum(~result.frozen))
        return result, n_free
