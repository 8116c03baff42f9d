import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_robotics_tpu.core import z_rot
from torch_robotics_tpu.envs import EnvSpheres3D
from torch_robotics_tpu.robots import MultiRobot, RobotPanda, RobotUR10
from torch_robotics_tpu.tasks import PlanningTask


@pytest.fixture(scope="module")
def dual_arm():
    panda_l = RobotPanda.create()
    panda_r = RobotPanda.create()
    base_l = (jnp.eye(3), jnp.array([0.0, 0.5, 0.0]))
    base_r = (z_rot(jnp.array(np.pi)), jnp.array([0.0, -0.5, 0.0]))
    return MultiRobot.create([panda_l, panda_r], [base_l, base_r])


def test_ur10_robot_fk():
    robot = RobotUR10()
    assert robot.q_dim == 6
    q = jnp.zeros((2, 6))
    pts = robot.fk_map_collision(q)
    assert pts.shape[-1] == 3
    pts2, J = robot.fk_map_collision_with_jac(q)
    np.testing.assert_allclose(pts, pts2)
    J_auto = jax.jacfwd(lambda qi: robot.fk_map_collision(qi))(q[0])
    np.testing.assert_allclose(J[0], J_auto, atol=1e-4)


def test_dual_arm_structure(dual_arm):
    robot = dual_arm
    assert robot.q_dim == 14
    # object points = 5 + 5; self sections = 8 + 8
    q = jnp.zeros((3, 14))
    pts = robot.fk_map_collision(q)
    assert pts.shape == (3, 10 + 16, 3)
    # own pairs per member (10 for the Panda) + 5*5 mutual cross pairs
    n_own = sum(len(r.self_pair_idxs) for r in robot.robots)
    assert len(robot.self_pair_idxs) == n_own + 25
    # the two arms' points are mirrored about the base offsets
    pts0 = np.asarray(pts[0])
    assert abs(pts0[:5, 1].mean() - 0.5) < 0.6
    assert abs(pts0[5:10, 1].mean() + 0.5) < 0.6


def test_dual_arm_jacobian_matches_autodiff(dual_arm):
    robot = dual_arm
    q = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, 14), jnp.float32)
    pts, J = robot.fk_map_collision_with_jac(q)
    J_auto = jax.jacfwd(lambda qi: robot.fk_map_collision(qi))(q)
    np.testing.assert_allclose(J, J_auto, atol=1e-4)
    # block-diagonal: left-arm points have zero grad w.r.t. right-arm joints
    np.testing.assert_allclose(J[:5, :, 7:], 0.0, atol=1e-6)
    np.testing.assert_allclose(J[5:10, :, :7], 0.0, atol=1e-6)


def test_dual_arm_task_and_mutual_collision(dual_arm):
    robot = dual_arm
    env = EnvSpheres3D()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.02)
    # both arms reaching toward each other -> mutual collision pairs active
    q = jnp.zeros((1, 14))
    cost = task.compute_collision_cost(q)
    assert jnp.isfinite(cost).all()
    r = task.collision_residuals(q[0])
    assert r.shape[0] == (10 + 10 + len(robot.self_pair_idxs))
    # GN solver runs on the dual-arm system
    from torch_robotics_tpu.solve import GPMP2Params, gpmp2_solve
    from torch_robotics_tpu.solve.gp_prior import straight_line_trajs
    start = jnp.concatenate([jnp.zeros(14), jnp.zeros(14)])
    goal = jnp.concatenate([jnp.full(14, 0.4), jnp.zeros(14)])
    params = GPMP2Params(n_support_points=8, opt_iters=5, sigma_coll=1e-2,
                         sigma_start=1e-3, sigma_goal_prior=1e-3,
                         sigma_gp=1e-1, step_size=0.5)
    theta0 = straight_line_trajs(start, goal, 8)[None]
    res = gpmp2_solve(task.collision_residuals, theta0, start, goal, params)
    assert bool(jnp.isfinite(res.trajs).all())
