import jax.numpy as jnp
import numpy as np

from torch_robotics_tpu.envs import EnvCircle2D, EnvDense2D
from torch_robotics_tpu.geom import precompute_sdf_grid
from torch_robotics_tpu.kin import fk_all_links, robot_zoo
from torch_robotics_tpu.robots import RobotPointMass
from torch_robotics_tpu.tasks import PlanningTask
from torch_robotics_tpu.utils.serialization import (
    load_grid_sdf, load_kinematic_model, save_grid_sdf, save_kinematic_model)


def test_grid_sdf_round_trip(tmp_path):
    env = EnvDense2D()
    grid = precompute_sdf_grid(env.limits, 0.02, env.obj_fixed_list)
    path = tmp_path / "grid.npz"
    save_grid_sdf(path, grid)
    grid2 = load_grid_sdf(path)
    x = jnp.array([[0.3, -0.2], [0.0, 0.0], [-0.7, 0.7]])
    np.testing.assert_allclose(grid2.signed_distance(x),
                               grid.signed_distance(x))
    assert grid2.cmap_dim == grid.cmap_dim


def test_kinematic_model_round_trip(tmp_path):
    model = robot_zoo.franka_panda()
    path = tmp_path / "panda.npz"
    save_kinematic_model(path, model)
    model2 = load_kinematic_model(path)
    assert model2.link_names == model.link_names
    assert model2.n_dofs == model.n_dofs
    q = jnp.full((2, 7), 0.3)
    np.testing.assert_allclose(fk_all_links(model2, q),
                               fk_all_links(model, q), atol=1e-7)


def test_occupancy_map_collision_path():
    env = EnvCircle2D()
    robot = RobotPointMass.create()
    task = PlanningTask(env=env, robot=robot, use_occupancy_map=True,
                        cell_size=0.01)
    x = jnp.array([[0.0, 0.0],      # inside the circle -> collision
                   [0.8, 0.8],      # free corner
                   [1.5, 0.0]])     # out of workspace
    coll = task.compute_collision(x)
    np.testing.assert_array_equal(np.asarray(coll), [True, False, True])
