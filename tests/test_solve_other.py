import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_robotics_tpu.envs import EnvDense2D
from torch_robotics_tpu.robots import RobotPointMass
from torch_robotics_tpu.solve import (
    CHOMPParams, SGPMPParams, chomp_solve, gpmp2_init_trajs, sgpmp_solve,
)
from torch_robotics_tpu.solve.gp_prior import straight_line_trajs
from torch_robotics_tpu.tasks import PlanningTask


@pytest.fixture(scope="module")
def setup():
    env = EnvDense2D(precompute_sdf_obj_fixed=False)
    robot = RobotPointMass.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.01)
    return task


def endpoints():
    start = jnp.array([-0.9, -0.9, 0.0, 0.0])
    goal = jnp.array([0.9, 0.9, 0.0, 0.0])
    return start, goal


def test_chomp_from_preset(setup):
    task = setup
    preset = task.env.get_chomp_params(task.robot)
    params = CHOMPParams.from_preset(preset)
    assert params.n_support_points == 64
    assert params.step_size == pytest.approx(0.05)
    assert params.weight_prior_cost == pytest.approx(1e-4)


def test_chomp_reduces_collision_cost(setup):
    task = setup
    start, goal = endpoints()
    params = CHOMPParams(n_support_points=32, dt=0.04, opt_iters=100,
                         step_size=0.2, grad_clip=0.1, sigma_coll=1e-2,
                         weight_prior_cost=1e-4)
    theta0 = jnp.tile(straight_line_trajs(start, goal, 32), (4, 1, 1))
    res = chomp_solve(task.collision_residuals, theta0, start, goal, params)
    assert bool(jnp.all(jnp.isfinite(res.trajs)))
    assert float(res.cost_trace[-1].mean()) < float(res.cost_trace[0].mean())
    # endpoints preserved (prior metric keeps them; start/goal sigmas tight)
    np.testing.assert_allclose(res.trajs[:, 0, :2],
                               jnp.tile(start[:2], (4, 1)), atol=0.05)


def test_sgpmp_solves_dense2d(setup):
    task = setup
    start, goal = endpoints()
    params = SGPMPParams(n_support_points=32, dt=0.04, opt_iters=50,
                         num_samples=32, sigma_coll=1e-3, temperature=1.0,
                         sigma_gp_sample=0.1, step_size=0.5,
                         sigma_start=1e-4, sigma_goal_prior=1e-4)
    theta0 = gpmp2_init_trajs(
        jax.random.PRNGKey(0),
        type("P", (), {"n_support_points": 32, "dt": 0.04,
                       "num_samples": 4, "sigma_gp_init": 0.1})(),
        start, goal)
    res = sgpmp_solve(task.collision_residuals, theta0, start, goal, params,
                      key=jax.random.PRNGKey(1))
    assert res.trajs.shape == theta0.shape
    assert bool(jnp.all(jnp.isfinite(res.trajs)))
    assert float(res.cost_trace[-1].mean()) < float(res.cost_trace[0].mean())


def test_sgpmp_cost_trace_monotone(setup):
    """The per-problem monotone acceptance guard: the carried cost can
    never increase (without it the MPPI-weighted average walked uphill on
    the hinge landscape and diverged)."""
    task = setup
    start, goal = endpoints()
    params = SGPMPParams(n_support_points=32, dt=0.04, opt_iters=30,
                         num_samples=16, sigma_coll=1e-3, temperature=1.0,
                         sigma_gp_sample=0.1, sigma_start=1e-4,
                         sigma_goal_prior=1e-4)
    theta0 = gpmp2_init_trajs(
        jax.random.PRNGKey(2),
        type("P", (), {"n_support_points": 32, "dt": 0.04,
                       "num_samples": 4, "sigma_gp_init": 0.3})(),
        start, goal)
    res = sgpmp_solve(task.collision_residuals, theta0, start, goal, params,
                      key=jax.random.PRNGKey(3))
    tr = np.asarray(res.cost_trace)        # (iters, B)
    assert (np.diff(tr, axis=0) <= 1e-3).all()
