"""Learned self-collision field wired into RobotPanda (the reference's STORM
override, robot_panda.py:131-136): bundled checkpoint loads, task semantics
switch to the net, and all solver paths (residuals / analytic Jacobian /
lanes terms) stay mutually consistent.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_robotics_tpu.costs.fields import self_collision_distances
from torch_robotics_tpu.envs import EnvSpheres3D
from torch_robotics_tpu.robots import RobotPanda
from torch_robotics_tpu.tasks import PlanningTask


@pytest.fixture(scope="module")
def setup():
    robot = RobotPanda.create(use_learned_self_collision=True)
    env = EnvSpheres3D(precompute_sdf_obj_fixed=False)
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.03)
    return robot, env, task


def test_bundled_net_accuracy(setup):
    """The bundled checkpoint regresses the min self-pair distance tightly
    (it replaces the pair field, so it must agree with it)."""
    robot, _, _ = setup
    ref = RobotPanda.create()          # pair-field robot for ground truth
    q = ref.random_q(jax.random.PRNGKey(0), 2048)
    pts = ref.self_collision_points(ref.fk_map_collision(q))
    d_true = jnp.min(self_collision_distances(
        pts, np.asarray(ref.self_pair_idxs)), axis=-1)
    d_pred = -robot.self_collision_net.raw_distance(q)
    err = jnp.abs(d_pred - d_true)
    assert float(err.mean()) < 0.01
    agree = jnp.mean(((d_pred < 0.05) == (d_true < 0.05)).astype(jnp.float32))
    assert float(agree) > 0.98


def test_task_uses_net_for_self_collision(setup):
    robot, env, task = setup
    q = robot.random_q(jax.random.PRNGKey(1), 16)
    x = jnp.concatenate([q, jnp.zeros_like(q)], axis=-1)
    cost = task.compute_collision_cost(x)
    assert cost.shape == (16,)
    assert bool(jnp.isfinite(cost).all())
    coll = task.compute_collision(x)
    assert coll.shape == (16,) and coll.dtype == jnp.bool_

    # the net contributes: costs differ from the pair-field task
    task_pairs = PlanningTask(env=env, robot=RobotPanda.create(),
                              obstacle_cutoff_margin=0.03)
    cost_pairs = task_pairs.compute_collision_cost(x)
    assert not np.allclose(np.asarray(cost), np.asarray(cost_pairs))


def test_residual_paths_consistent(setup):
    """residuals == residuals_and_jacobian r; J matches autodiff; lanes
    terms equal the batched path with the net row included."""
    from torch_robotics_tpu.solve.gpmp2 import _obstacle_terms

    robot, env, task = setup
    rfn = task.collision_residuals
    q = robot.random_q(jax.random.PRNGKey(2), 32)

    r = jax.vmap(rfn)(q)
    r2, J2 = jax.vmap(rfn.residuals_and_jacobian)(q)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r2),
                               rtol=1e-5, atol=1e-6)
    J_auto = jax.vmap(jax.jacfwd(rfn))(q)
    np.testing.assert_allclose(np.asarray(J2), np.asarray(J_auto),
                               rtol=1e-3, atol=1e-4)

    lanes = getattr(rfn, "obstacle_terms_lanes", None)
    assert lanes is not None
    g_l, H_l, cost_l = lanes(q.T, 1.0)
    g_ref, H_ref, cost_ref = _obstacle_terms(rfn, q, 2 * robot.q_dim, 1.0)
    np.testing.assert_allclose(jnp.moveaxis(g_l, 0, -1), g_ref,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(jnp.moveaxis(H_l, (0, 1), (-2, -1)), H_ref,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(cost_l, cost_ref, rtol=1e-5, atol=1e-6)


def test_grasped_object_rejected():
    from torch_robotics_tpu.geom import GraspedObjectPandaBox
    with pytest.raises(AssertionError):
        RobotPanda.create(grasped_object=GraspedObjectPandaBox(),
                          use_learned_self_collision=True)


def test_gpmp2_solves_with_net(setup):
    robot, env, task = setup
    from torch_robotics_tpu.solve import GPMP2Params, gpmp2_solve
    from torch_robotics_tpu.solve.gp_prior import straight_line_trajs
    q0 = jnp.zeros(7)
    qg = jnp.full(7, 0.5)
    start = jnp.concatenate([q0, jnp.zeros(7)])
    goal = jnp.concatenate([qg, jnp.zeros(7)])
    params = GPMP2Params(n_support_points=8, opt_iters=5, sigma_coll=1e-2,
                         sigma_start=1e-3, sigma_goal_prior=1e-3,
                         sigma_gp=1e-1, step_size=0.5)
    theta0 = straight_line_trajs(start, goal, 8)[None]
    res = gpmp2_solve(task.collision_residuals, theta0, start, goal, params)
    assert bool(jnp.isfinite(res.trajs).all())
