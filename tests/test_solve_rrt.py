import jax.numpy as jnp
import numpy as np
import pytest

from torch_robotics_tpu.envs import EnvDense2D
from torch_robotics_tpu.robots import RobotPointMass
from torch_robotics_tpu.solve import RRTConnectParams, rrt_connect
from torch_robotics_tpu.tasks import PlanningTask


def test_rrt_connect_finds_path():
    env = EnvDense2D(precompute_sdf_obj_fixed=False)
    robot = RobotPointMass.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.005)
    params = RRTConnectParams(n_iters=2000, n_radius=0.3, n_pre_samples=4096,
                              max_time=60.0)
    start = np.array([-0.9, -0.9], np.float32)
    goal = np.array([0.9, 0.9], np.float32)
    path = rrt_connect(task, start, goal, params)
    assert path is not None, "RRT-Connect failed to find a path"
    np.testing.assert_allclose(path[0], start, atol=1e-5)
    np.testing.assert_allclose(path[-1], goal, atol=1e-5)
    # every waypoint collision-free
    coll = task.compute_collision(jnp.asarray(path))
    assert not bool(np.asarray(coll).any())
    # consecutive waypoints within the steer radius
    seg = np.linalg.norm(np.diff(path, axis=0), axis=-1)
    assert float(seg.max()) <= params.n_radius + 1e-5
