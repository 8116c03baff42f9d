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


def test_multi_robot_lanes_terms_match_reference_path(dual_arm):
    """Lanes fast path for MultiRobot: GN terms equal the batched
    analytic-Jacobian path (same contract as test_lanes_terms)."""
    from torch_robotics_tpu.solve.gpmp2 import _obstacle_terms

    robot = dual_arm
    env = EnvSpheres3D()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.02)
    lanes = getattr(task.collision_residuals, "obstacle_terms_lanes", None)
    assert lanes is not None

    d = robot.q_dim
    q = robot.random_q(jax.random.PRNGKey(0), 48)
    lam = 1.0
    g_l, H_l, cost_l = lanes(q.T, lam)
    g_ref, H_ref, cost_ref = _obstacle_terms(
        task.collision_residuals, q, 2 * d, lam)
    np.testing.assert_allclose(jnp.moveaxis(g_l, 0, -1), g_ref,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(jnp.moveaxis(H_l, (0, 1), (-2, -1)), H_ref,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(cost_l, cost_ref, rtol=1e-5, atol=1e-6)


def test_multi_robot_lanes_with_ur10_and_grasped():
    """Heterogeneous 3-arm system (the BASELINE config-4 embodiment) with a
    grasped object on one Panda: lanes terms == reference path."""
    from torch_robotics_tpu.geom.objects import GraspedObjectPandaBox
    from torch_robotics_tpu.solve.gpmp2 import _obstacle_terms

    panda_g = RobotPanda.create(
        grasped_object=GraspedObjectPandaBox(size=(0.08, 0.08, 0.08)))
    panda = RobotPanda.create()
    ur10 = RobotUR10()
    base = [(jnp.eye(3), jnp.array([0.0, 0.6, 0.0])),
            (jnp.eye(3), jnp.array([0.0, -0.6, 0.0])),
            (z_rot(jnp.array(np.pi / 2)), jnp.array([0.7, 0.0, 0.0]))]
    robot = MultiRobot.create([panda_g, panda, ur10], base)
    env = EnvSpheres3D()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.02)
    lanes = getattr(task.collision_residuals, "obstacle_terms_lanes", None)
    assert lanes is not None

    q = robot.random_q(jax.random.PRNGKey(1), 24)
    g_l, H_l, cost_l = lanes(q.T, 1.0)
    g_ref, H_ref, cost_ref = _obstacle_terms(
        task.collision_residuals, q, 2 * robot.q_dim, 1.0)
    np.testing.assert_allclose(jnp.moveaxis(g_l, 0, -1), g_ref,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(jnp.moveaxis(H_l, (0, 1), (-2, -1)), H_ref,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(cost_l, cost_ref, rtol=1e-5, atol=1e-6)


def test_multi_robot_lanes_gpmp2_step_matches_generic(dual_arm):
    """Full lanes GN step on the dual-arm system equals the generic step."""
    from torch_robotics_tpu.solve import GPMP2Params, gpmp2_solve
    from torch_robotics_tpu.solve.gp_prior import straight_line_trajs

    robot = dual_arm
    env = EnvSpheres3D()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.02)
    start = jnp.concatenate([jnp.zeros(14), jnp.zeros(14)])
    goal = jnp.concatenate([jnp.full(14, 0.4), jnp.zeros(14)])
    params = GPMP2Params(n_support_points=8, opt_iters=5, sigma_coll=1e-2,
                         sigma_start=1e-3, sigma_goal_prior=1e-3,
                         sigma_gp=1e-1, step_size=0.5)
    theta0 = straight_line_trajs(start, goal, 8)[None]
    res_lanes = gpmp2_solve(task.collision_residuals, theta0, start, goal,
                            params)

    def residuals_plain(q, _fn=task.collision_residuals):
        return _fn(q)
    residuals_plain.residuals_and_jacobian = \
        task.collision_residuals.residuals_and_jacobian

    res_ref = gpmp2_solve(residuals_plain, theta0, start, goal, params)
    np.testing.assert_allclose(res_lanes.trajs, res_ref.trajs,
                               rtol=1e-3, atol=1e-3)
