import jax
import jax.numpy as jnp
import numpy as np

from torch_robotics_tpu.envs import EnvCircle2D, EnvDense2D
from torch_robotics_tpu.robots import RobotPointMass
from torch_robotics_tpu.sim import (MotionPlanningController,
                                    PDControllerParams, execute_trajectories)
from torch_robotics_tpu.tasks import PlanningTask


def make_task(env_ctor=EnvDense2D):
    env = env_ctor(precompute_sdf_obj_fixed=False)
    robot = RobotPointMass.create()
    return PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.01)


def test_pd_tracks_free_trajectory():
    # single central circle: the left edge is free
    task = make_task(EnvCircle2D)
    # straight line along the free left edge
    H = 32
    pos = jnp.stack([jnp.full((H,), -0.95),
                     jnp.linspace(-0.9, 0.9, H)], axis=-1)[None]
    vel = jnp.gradient(pos, axis=-2) / 0.04
    params = PDControllerParams(kp=100.0, kd=20.0, dt=0.04, substeps=4)

    def collision_fn(q):
        return task._compute_collision(q, margin_override=None)

    res = execute_trajectories(collision_fn, pos, vel, params)
    assert res.q.shape == (1, H, 2)
    assert not bool(res.frozen[0])
    assert float(res.tracking_error[0]) < 0.05


def test_controller_freezes_on_contact():
    task = make_task()
    # drive straight through the middle of the dense env -> contact
    H = 32
    pos = jnp.stack([jnp.linspace(-0.9, 0.9, H),
                     jnp.linspace(-0.9, 0.9, H)], axis=-1)[None]
    state = jnp.concatenate([pos, jnp.gradient(pos, axis=-2) / 0.04], axis=-1)
    ctrl = MotionPlanningController(task)
    result, n_free = ctrl.run_trajectories(state)
    assert n_free == 0
    assert bool(result.contact.any())
    # once frozen, position stays constant
    first_contact = int(np.argmax(np.asarray(result.contact[0])))
    q_np = np.asarray(result.q[0])
    for t in range(first_contact + 1, H):
        np.testing.assert_allclose(q_np[t], q_np[first_contact], atol=1e-6)
