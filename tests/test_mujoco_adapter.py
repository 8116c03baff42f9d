"""MuJoCo execution adapter: independent physics validation of planned
trajectories (the reference Isaac-harness role, motion_planning_envs.py).
"""
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax.numpy as jnp

from torch_robotics_tpu.envs import EnvSpheres3D
from torch_robotics_tpu.geom.sdf import ObjectField, Spheres
from torch_robotics_tpu.robots import RobotPanda
from torch_robotics_tpu.sim.mujoco_adapter import MujocoExecutionEnv
from torch_robotics_tpu.tasks import PlanningTask


class _SingleSphereEnv:
    """Minimal env: one obstacle sphere placed in the Panda's workspace."""

    obj_extra_list = None

    def __init__(self, center=(0.55, 0.0, 0.55), radius=0.16):
        self.obj = ObjectField.create(
            [Spheres(centers=jnp.asarray([center]),
                     radii=jnp.asarray([radius]))])

    def get_df_obj_list(self):
        return [self.obj]


@pytest.fixture(scope="module")
def panda():
    return RobotPanda.create()


def test_model_builds(panda):
    env = EnvSpheres3D(precompute_sdf_obj_fixed=False)
    mj = MujocoExecutionEnv(panda, env)
    assert mj.mj_model.nq == 7
    assert mj.mj_model.nu == 7
    # robot spheres + obstacle geoms present
    assert mj.mj_model.ngeom > 30


def test_hold_neutral_is_contact_free(panda):
    mj = MujocoExecutionEnv(panda, _SingleSphereEnv(center=(0.9, 0.9, 0.9)))
    traj = np.zeros((1, 6, 7))
    res = mj.run_trajectories(traj, dt_plan=0.04)
    assert not bool(res.contact[0])
    assert res.tracking_err[0] < 0.08


def test_sweep_through_obstacle_reports_contact(panda):
    """A joint sweep that the task's SDF flags as colliding must also make
    physical contact in MuJoCo — the independent cross-check."""
    env = _SingleSphereEnv()
    task = PlanningTask(env=env, robot=panda, ws_limits=[[-2, -2, -2],
                                                        [2, 2, 2]],
                        obstacle_cutoff_margin=0.0)
    # sweep shoulder joint from left to right through the obstacle's azimuth
    H = 24
    traj = np.zeros((1, H, 7))
    traj[0, :, 0] = np.linspace(-0.9, 0.9, H)
    traj[0, :, 1] = 0.5           # reach forward
    traj[0, :, 3] = -1.2

    # 1) the task SDF must flag some waypoint as in collision
    x = jnp.concatenate([jnp.asarray(traj[0], jnp.float32),
                         jnp.zeros((H, 7), jnp.float32)], axis=-1)
    sdf_flags = np.asarray(task.compute_collision(x))
    assert sdf_flags.any(), "test setup: SDF should flag this sweep"

    # 2) MuJoCo's own contact detection agrees
    mj = MujocoExecutionEnv(panda, env)
    res = mj.run_trajectories(traj, dt_plan=0.08)
    assert bool(res.contact[0])
    assert res.contact_step[0] >= 0


def test_contact_freezes_robot(panda):
    """After first contact the servo target stops advancing (the reference
    freezes contacted robots, motion_planning_envs.py:700-720)."""
    env = _SingleSphereEnv()
    mj = MujocoExecutionEnv(panda, env)
    H = 24
    traj = np.zeros((1, H, 7))
    traj[0, :, 0] = np.linspace(-0.9, 0.9, H)
    traj[0, :, 1] = 0.5
    traj[0, :, 3] = -1.2
    res = mj.run_trajectories(traj, dt_plan=0.08)
    assert bool(res.contact[0])
    k = int(res.contact_step[0])
    # executed joint 0 must stay near the frozen target, far from the final
    # commanded value
    final_q0 = res.qpos_executed[0, -1, 0]
    assert abs(final_q0 - traj[0, -1, 0]) > 0.3
    assert abs(final_q0 - traj[0, k, 0]) < 0.3
