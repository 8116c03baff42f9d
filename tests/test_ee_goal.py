import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_robotics_tpu.envs import EnvSpheres3D
from torch_robotics_tpu.kin import fk_all_links
from torch_robotics_tpu.robots import RobotPanda
from torch_robotics_tpu.solve import (GPMP2Params, gpmp2_solve,
                                      make_ee_goal_terms)
from torch_robotics_tpu.solve.gp_prior import straight_line_trajs
from torch_robotics_tpu.tasks import PlanningTask


@pytest.fixture(scope="module")
def setup():
    env = EnvSpheres3D()
    robot = RobotPanda.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.02)
    return robot, task


def test_ee_goal_terms_match_autodiff(setup):
    robot, _ = setup
    q_goal = jnp.array([0.0, -0.3, 0.0, -1.8, 0.0, 1.5, 0.0])
    H_target = fk_all_links(robot.model, q_goal, link_list=["ee_link"])[0]
    terms = make_ee_goal_terms(robot, H_target, sigma_ee=1.0)

    def energy(q):
        H = fk_all_links(robot.model, q, link_list=["ee_link"])[0]
        r_pos = H[:3, 3] - H_target[:3, 3]
        r_rot = (H[:3, :3] - H_target[:3, :3]).T.reshape(-1)
        return 0.5 * (jnp.sum(jnp.square(r_pos)) + jnp.sum(jnp.square(r_rot)))

    q = jnp.array([0.2, -0.5, 0.1, -1.5, 0.3, 1.2, -0.2])
    g, Hb, err = terms(q)
    g_auto = jax.grad(energy)(q)
    np.testing.assert_allclose(g[:7], g_auto, atol=1e-3)
    assert float(err) > 0
    # at the goal configuration the residual vanishes
    g0, _, err0 = terms(q_goal)
    np.testing.assert_allclose(err0, 0.0, atol=1e-5)
    np.testing.assert_allclose(g0, np.zeros(14), atol=1e-4)


def test_gpmp2_reaches_cartesian_target(setup):
    """Position-only task-space goal: the GN solver reaches the Cartesian
    target exactly.  (Full-pose goals from a far straight-line init can stall
    in orientation local minima — standard practice is an IK warm start or
    multiple samples.)"""
    robot, task = setup
    q_goal = jnp.array([0.3, -0.4, 0.2, -1.6, 0.1, 1.3, 0.0])
    H_target = fk_all_links(robot.model, q_goal, link_list=["ee_link"])[0]
    terms = make_ee_goal_terms(robot, H_target, sigma_ee=2e-4, w_rot=0.0)

    q_start = jnp.zeros(7)
    start = jnp.concatenate([q_start, jnp.zeros(7)])
    goal = start  # config-space goal prior is weak; the EE factor drives
    params = GPMP2Params(n_support_points=16, dt=0.05, opt_iters=200,
                         sigma_start=1e-3, sigma_gp=2e-1,
                         sigma_goal_prior=1e3, sigma_coll=1e0,
                         step_size=0.7, solver_delta=1e-2)
    theta0 = straight_line_trajs(start, goal, 16)[None]
    res = gpmp2_solve(task.collision_residuals, theta0, start, goal, params,
                      ee_goal_terms=terms)
    assert bool(jnp.isfinite(res.trajs).all())
    q_final = res.trajs[0, -1, :7]
    H_final = fk_all_links(robot.model, q_final, link_list=["ee_link"])[0]
    pos_err = float(jnp.linalg.norm(H_final[:3, 3] - H_target[:3, 3]))
    assert pos_err < 0.02, f"EE position error {pos_err:.3f}"

    # full-pose goal still makes progress from the same init
    terms_pose = make_ee_goal_terms(robot, H_target, sigma_ee=2e-4, w_rot=1.0)
    res_pose = gpmp2_solve(task.collision_residuals, theta0, start, goal,
                           params, ee_goal_terms=terms_pose)
    _, _, err0 = terms_pose(theta0[0, -1, :7])
    _, _, errF = terms_pose(res_pose.trajs[0, -1, :7])
    assert float(errF) < 0.5 * float(err0)


def test_mpc_with_ee_goal(setup):
    """Cartesian-goal receding-horizon MPC: the EE converges to the target
    position without a config-space goal."""
    robot, task = setup
    from torch_robotics_tpu.solve import GPMP2Params
    from torch_robotics_tpu.solve.mpc import MPCParams, mpc_rollout
    q_goal = jnp.array([0.3, -0.4, 0.2, -1.6, 0.1, 1.3, 0.0])
    H_target = fk_all_links(robot.model, q_goal, link_list=["ee_link"])[0]
    terms = make_ee_goal_terms(robot, H_target, sigma_ee=2e-4, w_rot=0.0)
    B = 4
    start = jnp.tile(jnp.concatenate([jnp.zeros(7), jnp.zeros(7)]), (B, 1))
    goal = start  # config goal unused (weak prior)
    gp = GPMP2Params(n_support_points=16, dt=0.05, sigma_start=1e-3,
                     sigma_gp=2e-1, sigma_goal_prior=1e3, sigma_coll=1e0,
                     step_size=0.7, solver_delta=1e-2)
    params = MPCParams(gpmp2=gp, iters_per_step=3)
    xs, info = mpc_rollout(task.collision_residuals, start, goal, params,
                           n_steps=25, ee_goal_terms=terms)
    q_final = xs[:, -1, :7]
    H_final = fk_all_links(robot.model, q_final, link_list=["ee_link"])
    pos_err = jnp.linalg.norm(H_final[:, 0, :3, 3] - H_target[:3, 3], axis=-1)
    assert float(pos_err.max()) < 0.1, f"EE errors {np.asarray(pos_err)}"
