import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_robotics_tpu.envs import EnvDense2D, EnvSpheres3D
from torch_robotics_tpu.robots import (RobotPanda, RobotPlanar2Link,
                                       RobotPointMass)
from torch_robotics_tpu.tasks import PlanningTask


def _check_point_jacobians(robot, q):
    pts, J = robot.fk_map_collision_with_jac(q)
    pts_ref = robot.fk_map_collision(q)
    np.testing.assert_allclose(pts, pts_ref, atol=1e-6)
    J_auto = jax.jacfwd(lambda qi: robot.fk_map_collision(qi))(q)
    np.testing.assert_allclose(J, J_auto, atol=1e-4)


def test_point_jacobians_point_mass():
    robot = RobotPointMass.create()
    _check_point_jacobians(robot, jnp.array([0.3, -0.5]))


def test_point_jacobians_planar2link():
    robot = RobotPlanar2Link.create()
    _check_point_jacobians(robot, jnp.array([0.7, -1.1]))


def test_point_jacobians_panda():
    robot = RobotPanda.create()
    q = jnp.array([0.1, -0.4, 0.3, -1.2, 0.5, 1.0, 0.2])
    _check_point_jacobians(robot, q)


def test_point_jacobians_panda_grasped():
    from torch_robotics_tpu.geom import GraspedObjectPandaBox
    robot = RobotPanda.create(grasped_object=GraspedObjectPandaBox())
    q = jnp.array([0.1, -0.4, 0.3, -1.2, 0.5, 1.0, 0.2])
    _check_point_jacobians(robot, q)


@pytest.mark.parametrize("make", [
    lambda: (EnvDense2D(), RobotPointMass.create(), 0.01),
    lambda: (EnvSpheres3D(), RobotPanda.create(), 0.03),
])
def test_residual_jacobian_matches_jacfwd(make):
    env, robot, cutoff = make()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=cutoff)
    raj = task.collision_residuals.residuals_and_jacobian
    key = jax.random.PRNGKey(0)
    qs = robot.random_q(key, 32)
    for i in range(0, 32, 8):
        q = qs[i]
        r_fast, J_fast = raj(q)
        r_ref = task.collision_residuals(q)
        J_ref = jax.jacfwd(task.collision_residuals)(q)
        np.testing.assert_allclose(r_fast, r_ref, atol=1e-5)
        np.testing.assert_allclose(J_fast, J_ref, atol=1e-3)


def test_gpmp2_uses_fast_path_same_result():
    env = EnvDense2D()
    robot = RobotPointMass.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.01)
    from torch_robotics_tpu.solve import GPMP2Params, gpmp2_init_trajs, gpmp2_solve
    params = GPMP2Params(n_support_points=16, opt_iters=10, sigma_coll=1e-3,
                         sigma_start=1e-4, sigma_goal_prior=1e-4,
                         step_size=0.5)
    start = jnp.array([-0.9, -0.9, 0.0, 0.0])
    goal = jnp.array([0.9, 0.9, 0.0, 0.0])
    theta0 = gpmp2_init_trajs(jax.random.PRNGKey(0), params, start, goal,
                              num_samples=4)
    res_fast = gpmp2_solve(task.collision_residuals, theta0, start, goal,
                           params)

    # strip the attribute -> jacfwd fallback
    def residuals_plain(q, _fn=task.collision_residuals):
        return _fn(q)

    res_ref = gpmp2_solve(residuals_plain, theta0, start, goal, params)
    np.testing.assert_allclose(res_fast.trajs, res_ref.trajs, rtol=1e-4,
                               atol=1e-4)


def test_residuals_and_jacobian_batch_polymorphic():
    """Batched raj (lanes FK path) == vmapped per-sample raj, with and
    without the learned self-collision net (the batched form is what the
    batch-first solvers call on the whole flattened state batch)."""
    import jax
    import numpy as np
    from torch_robotics_tpu.envs import EnvSpheres3D
    from torch_robotics_tpu.robots import RobotPanda
    from torch_robotics_tpu.tasks import PlanningTask

    q = RobotPanda.create().random_q(jax.random.PRNGKey(0), 12)
    for kwargs in ({}, {"use_learned_self_collision": True}):
        task = PlanningTask(env=EnvSpheres3D(),
                            robot=RobotPanda.create(**kwargs),
                            obstacle_cutoff_margin=0.03)
        raj = task.collision_residuals.residuals_and_jacobian
        assert getattr(raj, "supports_batch", False)
        rb, Jb = raj(q)
        rv, Jv = jax.vmap(raj)(q)
        np.testing.assert_allclose(np.asarray(rb), np.asarray(rv), atol=2e-5)
        np.testing.assert_allclose(np.asarray(Jb), np.asarray(Jv), atol=2e-4)
