import jax
import jax.numpy as jnp
import numpy as np
import pytest

from golden_utils import load_golden
from torch_robotics_tpu.envs import EnvDense2D, EnvSpheres3D
from torch_robotics_tpu.robots import RobotPanda, RobotPointMass
from torch_robotics_tpu.tasks import PlanningTask


@pytest.fixture(scope="module")
def task_pm():
    env = EnvDense2D(precompute_sdf_obj_fixed=False)
    robot = RobotPointMass.create()
    return PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.01)


@pytest.fixture(scope="module")
def task_panda():
    env = EnvSpheres3D(precompute_sdf_obj_fixed=False)
    robot = RobotPanda.create()
    return PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.03)


def test_env_dense2d_sdf_parity():
    g = load_golden("env_dense2d_sdf")
    x = jnp.asarray(g["x"])
    env = EnvDense2D(precompute_sdf_obj_fixed=False)
    np.testing.assert_allclose(env.compute_sdf(x), g["sdf_analytic"], atol=1e-5)
    env_grid = EnvDense2D(precompute_sdf_obj_fixed=True, sdf_cell_size=0.01)
    np.testing.assert_allclose(env_grid.grid_map_sdf_obj_fixed(x),
                               g["sdf_grid_cell001"], atol=1e-4)


def test_env_spheres3d_sdf_parity():
    g = load_golden("env_spheres3d_sdf")
    env = EnvSpheres3D(precompute_sdf_obj_fixed=False)
    np.testing.assert_allclose(env.compute_sdf(jnp.asarray(g["x"])),
                               g["sdf_analytic"], atol=1e-5)


def test_pointmass_task_cost_parity(task_pm):
    g = load_golden("task_pointmass_dense2d")
    trajs = jnp.asarray(g["trajs"])
    cost = task_pm.compute_collision_cost(trajs)
    np.testing.assert_allclose(cost, g["collision_cost"], atol=1e-4)
    coll = task_pm.compute_collision(trajs)
    np.testing.assert_allclose(np.asarray(coll, np.float32), g["collision"])


def test_panda_fk_collision_points_parity(task_panda):
    g = load_golden("task_panda_spheres3d")
    q = jnp.asarray(g["q"])
    fk_pos = task_panda.robot.fk_map_collision(q)
    np.testing.assert_allclose(fk_pos, g["fk_collision_pos"], atol=2e-5)


def test_panda_collision_model_construction_parity(task_panda):
    g = load_golden("task_panda_spheres3d")
    robot = task_panda.robot
    assert list(robot.object_coll_idxs) == [int(i) for i in
                                            g["link_idxs_object_coll"]]
    assert list(robot.self_coll_idxs) == [int(i) for i in
                                          g["link_idxs_self_coll"]]
    np.testing.assert_array_equal(np.asarray(robot.self_pair_idxs),
                                  g["self_pair_idxs"].astype(np.int64))
    np.testing.assert_allclose(robot.self_margins, g["self_margin"], atol=1e-7)
    np.testing.assert_allclose(robot.object_margins, g["object_margins"],
                               atol=1e-7)


def test_panda_task_cost_parity(task_panda):
    g = load_golden("task_panda_spheres3d")
    q = jnp.asarray(g["q"])
    cost = task_panda.compute_collision_cost(q)
    np.testing.assert_allclose(cost, g["collision_cost"], rtol=1e-4, atol=1e-4)
    coll = task_panda.compute_collision(q)
    np.testing.assert_allclose(np.asarray(coll, np.float32), g["collision"])


def test_random_coll_free_q(task_pm):
    samples, n_valid = task_pm.random_coll_free_q(
        jax.random.PRNGKey(0), n_samples=16, max_samples=512)
    assert int(n_valid) == 16
    assert not bool(jnp.any(task_pm.compute_collision(samples)))


def test_trajs_split(task_pm):
    key = jax.random.PRNGKey(1)
    trajs = jax.random.uniform(key, (16, 8, 2), minval=-0.9, maxval=0.9)
    coll, free = task_pm.get_trajs_collision_and_free(trajs)
    n_coll = 0 if coll is None else len(coll)
    n_free = 0 if free is None else len(free)
    assert n_coll + n_free == 16
    frac = task_pm.compute_fraction_free_trajs(trajs)
    assert abs(frac - n_free / 16) < 1e-6
    intensity = task_pm.compute_collision_intensity_trajs(trajs)
    assert 0.0 <= intensity <= 1.0
    assert task_pm.compute_success_free_trajs(trajs) in (0, 1)


def test_extra_objects_cost():
    from torch_robotics_tpu.envs import EnvDense2DExtraObjects
    env = EnvDense2DExtraObjects()
    robot = RobotPointMass.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.01)
    assert len(task.get_collision_fields_extra_objects()) == 1
    x = jnp.array([[-0.4, 0.1], [0.9, 0.9]])  # first is inside an extra sphere
    cost = task.compute_collision_cost_extra_objects(x)
    assert float(cost[0]) > float(cost[1])
    # total cost includes the extra objects (df list has fixed + extra)
    assert len(task.df_obj_list) == 2


def test_rbf_field_type(task_panda):
    """'rbf' field-type cost: exact recomputation of the reference formulas
    (distance_fields.py:187-192 object rbf exp(-sdf^2/(2 m^2)) summed over
    objects+points; :274-278 pairwise-point matrix; dispatched per
    :110-112) against an independent numpy evaluation."""
    import numpy as np

    from torch_robotics_tpu.costs import (object_collision_rbf,
                                          object_signed_distances,
                                          self_collision_rbf)

    robot = task_panda.robot
    q = jnp.stack([0.3 * (robot.q_min + robot.q_max),
                   0.5 * (robot.q_min + robot.q_max)])
    x = jnp.concatenate([q, jnp.zeros_like(q)], axis=-1)
    m = float(task_panda.obstacle_cutoff_margin)

    cost = task_panda.compute_collision_cost(x, field_type="rbf")
    assert cost.shape == (2,)
    assert bool(jnp.all(cost > 0))          # diagonal terms alone are >= P

    obj_pts, self_pts = task_panda._collision_points(q)
    sd = np.asarray(object_signed_distances(task_panda.df_obj_list, obj_pts))
    ref_obj = np.exp(np.square(sd) / (-2.0 * m * m)).sum(axis=(-1, -2))
    np.testing.assert_allclose(
        np.asarray(object_collision_rbf(task_panda.df_obj_list, obj_pts, m)),
        ref_obj, rtol=1e-6)
    p = np.asarray(self_pts)
    d2 = np.square(p[:, :, None, :] - p[:, None, :, :]).sum(-1)
    ref_self = np.exp(d2 / (-2.0 * m * m)).sum(axis=(-1, -2))
    np.testing.assert_allclose(np.asarray(self_collision_rbf(self_pts, m)),
                               ref_self, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cost), ref_obj + ref_self,
                               rtol=1e-6)
    # occupancy dispatch parity with compute_collision
    occ = task_panda.compute_collision_cost(x, field_type="occupancy")
    np.testing.assert_array_equal(np.asarray(occ) > 0.5,
                                  np.asarray(task_panda.compute_collision(x)))
