import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_robotics_tpu.envs import EnvDense2D, EnvSpheres3D
from torch_robotics_tpu.robots import RobotPanda, RobotPointMass, RobotUR10
from torch_robotics_tpu.solve import GPMP2Params, gpmp2_init_trajs, gpmp2_solve
from torch_robotics_tpu.solve.gpmp2 import _obstacle_terms
from torch_robotics_tpu.tasks import PlanningTask


@pytest.mark.parametrize("make", [
    lambda: (EnvDense2D(), RobotPointMass.create(), 0.01),
    lambda: (EnvSpheres3D(), RobotPanda.create(), 0.03),
    # generic KinematicRobot (not RobotPanda) takes the same lanes path
    lambda: (EnvSpheres3D(), RobotUR10(), 0.03),
])
def test_lanes_terms_match_reference_path(make):
    env, robot, cutoff = make()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=cutoff)
    lanes = getattr(task.collision_residuals, "obstacle_terms_lanes", None)
    assert lanes is not None
    d = robot.q_dim
    m = 2 * d
    key = jax.random.PRNGKey(0)
    q = robot.random_q(key, 96)                      # N = 96 waypoints
    lam = 1.0   # terms are linear in lam; unit keeps f32 tie-noise unamplified

    q_cols = q.T                                     # (d, N)
    g_l, H_l, cost_l = lanes(q_cols, lam)

    g_ref, H_ref, cost_ref = _obstacle_terms(
        task.collision_residuals, q, m, lam)
    np.testing.assert_allclose(jnp.moveaxis(g_l, 0, -1), g_ref,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(jnp.moveaxis(H_l, (0, 1), (-2, -1)), H_ref,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(cost_l, cost_ref, rtol=1e-5, atol=1e-6)


def test_gpmp2_lanes_step_matches_generic():
    env = EnvDense2D()
    robot = RobotPointMass.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.01)
    params = GPMP2Params(n_support_points=16, opt_iters=15, sigma_coll=1e-3,
                         sigma_start=1e-4, sigma_goal_prior=1e-4,
                         step_size=0.5)
    start = jnp.array([-0.9, -0.9, 0.0, 0.0])
    goal = jnp.array([0.9, 0.9, 0.0, 0.0])
    theta0 = gpmp2_init_trajs(jax.random.PRNGKey(0), params, start, goal,
                              num_samples=4)
    res_lanes = gpmp2_solve(task.collision_residuals, theta0, start, goal,
                            params)

    def residuals_plain(q, _fn=task.collision_residuals):
        return _fn(q)
    residuals_plain.residuals_and_jacobian = \
        task.collision_residuals.residuals_and_jacobian

    res_ref = gpmp2_solve(residuals_plain, theta0, start, goal, params)
    np.testing.assert_allclose(res_lanes.trajs, res_ref.trajs,
                               rtol=1e-3, atol=1e-3)


def test_lanes_terms_grid_scene_matches_reference_path():
    env = EnvDense2D(precompute_sdf_obj_fixed=True, sdf_cell_size=0.01)
    robot = RobotPointMass.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.01)
    lanes = getattr(task.collision_residuals, "obstacle_terms_lanes", None)
    assert lanes is not None
    q = robot.random_q(jax.random.PRNGKey(3), 64)
    lam = 1.0
    g_l, H_l, cost_l = lanes(q.T, lam)
    g_ref, H_ref, cost_ref = _obstacle_terms(
        task.collision_residuals, q, 4, lam)
    np.testing.assert_allclose(jnp.moveaxis(g_l, 0, -1), g_ref,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(jnp.moveaxis(H_l, (0, 1), (-2, -1)), H_ref,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(cost_l, cost_ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("zoo_name", ["shadow_hand", "allegro_hand",
                                      "tiago_dual_holo"])
def test_fk_positions_lanes_matches_aos_branching_trees(zoo_name):
    # branching kinematic trees (hands, dual-arm torso): the lanes chain
    # follows parent pointers, not a serial chain — verify against the AoS
    # path on the tree robots
    from torch_robotics_tpu.kin import robot_zoo
    from torch_robotics_tpu.kin.fk import fk_rot_trans
    from torch_robotics_tpu.ops.lanes_fk import fk_positions_lanes
    model = getattr(robot_zoo, zoo_name)()
    q = jax.random.uniform(jax.random.PRNGKey(11), (4, model.n_dofs),
                           minval=-2.0, maxval=2.0)
    t_lanes = fk_positions_lanes(model, q)
    _, t_ref = fk_rot_trans(model, q)
    np.testing.assert_allclose(np.asarray(t_lanes), np.asarray(t_ref),
                               rtol=1e-5, atol=1e-6)


def test_fk_positions_lanes_matches_aos():
    from torch_robotics_tpu.ops.lanes_fk import fk_positions_lanes
    from torch_robotics_tpu.kin.fk import fk_rot_trans
    robot = RobotPanda.create()
    model = robot.model
    key = jax.random.PRNGKey(7)
    # include out-of-limit values to exercise identical clamping
    q = jax.random.uniform(key, (3, 5, model.n_dofs), minval=-4.0, maxval=4.0)
    t_lanes = fk_positions_lanes(model, q)
    _, t_ref = fk_rot_trans(model, q)
    np.testing.assert_allclose(np.asarray(t_lanes), np.asarray(t_ref),
                               rtol=1e-5, atol=1e-6)
    sub = fk_positions_lanes(model, q, link_idxs=[0, 3, model.n_links - 1])
    np.testing.assert_allclose(
        np.asarray(sub),
        np.asarray(t_ref[..., jnp.asarray([0, 3, model.n_links - 1]), :]),
        rtol=1e-5, atol=1e-6)


def test_multirobot_same_member_mutual_pair_rejected():
    """The structured MultiRobot assembly assumes every mutual pair spans
    TWO members (its 'elif b == i' gradient branch and cross-block stitch
    are wrong for i == j); a pair list indexing two object points of the
    SAME member must be rejected loudly, not silently mis-assembled.
    MultiRobot.create never emits such pairs — this guards custom lists."""
    import dataclasses

    from torch_robotics_tpu.core import z_rot
    from torch_robotics_tpu.ops import lanes_fk
    from torch_robotics_tpu.robots import MultiRobot

    robots = [RobotPanda.create(), RobotUR10()]
    poses = [(jnp.eye(3), jnp.array([0.2, 0.55, 0.0])),
             (z_rot(jnp.array(jnp.pi)), jnp.array([0.2, -0.55, 0.0]))]
    robot = MultiRobot.create(robots, poses)
    # (0, 1): two object-section points of member 0
    bad_pairs = tuple(robot.self_pair_idxs) + ((0, 1),)
    robot_bad = dataclasses.replace(
        robot, self_pair_idxs=bad_pairs,
        self_margins=jnp.concatenate(
            [robot.self_margins, jnp.array([0.05], jnp.float32)]))
    with pytest.raises(ValueError, match="same"):
        task = PlanningTask(env=EnvSpheres3D(), robot=robot_bad,
                            obstacle_cutoff_margin=0.02)
        lanes_fk.obstacle_terms_lanes_multirobot_factory(task)


def test_multirobot_structured_terms_match_generic():
    """Block-structured MultiRobot terms == padded generic path, both layouts.

    The structured path (ops/lanes_fk.obstacle_terms_lanes_multirobot_factory)
    keeps member rows at member width and reduces each Hessian block only
    over the rows that touch it (config 4: 2.6x end-to-end); the generic
    branch is kept behind _MULTIROBOT_STRUCTURED for this A/B.
    """
    from torch_robotics_tpu.core import z_rot
    from torch_robotics_tpu.ops import lanes_fk
    from torch_robotics_tpu.robots import MultiRobot

    robots = [RobotPanda.create(), RobotUR10()]
    poses = [(jnp.eye(3), jnp.array([0.2, 0.55, 0.0])),
             (z_rot(jnp.array(jnp.pi)), jnp.array([0.2, -0.55, 0.0]))]
    robot = MultiRobot.create(robots, poses)
    task = PlanningTask(env=EnvSpheres3D(), robot=robot,
                        obstacle_cutoff_margin=0.02)
    d = robot.q_dim
    q = jax.random.uniform(
        jax.random.PRNGKey(3), (d, 16),
        minval=jnp.tile(robot.q_min[:, None], (1, 16)),
        maxval=jnp.tile(robot.q_max[:, None], (1, 16)))
    t_new = lanes_fk.obstacle_terms_lanes_multirobot_factory(task)
    lanes_fk._MULTIROBOT_STRUCTURED = False
    try:
        t_old = lanes_fk.obstacle_terms_lanes_factory(task)
    finally:
        lanes_fk._MULTIROBOT_STRUCTURED = True
    for kwargs in ({}, {"h": 4}):
        out_new = t_new(q, 50.0, **kwargs)
        out_old = t_old(q, 50.0, **kwargs)
        for a, b in zip(out_new, out_old):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-3, rtol=1e-4)
