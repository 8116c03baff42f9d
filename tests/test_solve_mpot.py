import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_robotics_tpu.envs import EnvGridCircles2D
from torch_robotics_tpu.robots import RobotPointMass
from torch_robotics_tpu.solve.gp_prior import straight_line_trajs
from torch_robotics_tpu.solve.mpot import (MPOTParams, mpot_solve,
                                           polytope_vertices)
from torch_robotics_tpu.tasks import PlanningTask


def test_polytope_vertices():
    cube = polytope_vertices(2, "cube")
    assert cube.shape == (4, 2)
    np.testing.assert_allclose(np.linalg.norm(cube, axis=-1), 1.0, atol=1e-6)
    ortho = polytope_vertices(14, "cube")  # falls back to orthoplex
    assert ortho.shape == (28, 14)


def test_mpot_params_from_preset():
    env = EnvGridCircles2D()
    robot = RobotPointMass.create()
    preset = env.get_mpot_params(robot)
    params = MPOTParams.from_preset(preset)
    assert params.step_radius == pytest.approx(0.038)
    assert params.polytope == "cube"
    assert params.reg == pytest.approx(0.01)
    assert params.num_probe == 5


def test_mpot_improves_trajectories():
    env = EnvGridCircles2D()
    robot = RobotPointMass.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.01)
    preset = env.get_mpot_params(robot)
    params = MPOTParams.from_preset({**preset, "opt_iters": 60,
                                     "sigma_start": 1e-3,
                                     "sigma_goal": 1e-3})

    d = robot.q_dim

    def state_cost(theta):
        return task._compute_cost(theta[..., :d])

    start = jnp.array([-0.9, -0.9, 0.0, 0.0])
    goal = jnp.array([0.9, 0.9, 0.0, 0.0])
    theta0 = jnp.tile(straight_line_trajs(start, goal, 64)[None], (4, 1, 1))
    res = mpot_solve(state_cost, theta0, start, goal, params)
    assert res.trajs.shape == theta0.shape
    assert bool(jnp.isfinite(res.trajs).all())
    # endpoints stay pinned
    np.testing.assert_allclose(res.trajs[:, 0, :2],
                               np.tile([-0.9, -0.9], (4, 1)), atol=0.05)
    np.testing.assert_allclose(res.trajs[:, -1, :2],
                               np.tile([0.9, 0.9], (4, 1)), atol=0.05)
    # the collision cost of the trajectory decreased vs the straight line
    c0 = float(state_cost(theta0).sum())
    cF = float(state_cost(res.trajs).sum())
    assert cF < c0


def test_mpot_gpmp2_pipeline_quality():
    """The production MPOT pipeline (Sinkhorn exploration + GN polish)
    produces mostly collision-free, smooth trajectories on GridCircles2D
    (the env whose presets target MPOT)."""
    from torch_robotics_tpu.solve import GPMP2Params, gpmp2_init_trajs
    from torch_robotics_tpu.solve.hybrid import plan_mpot_gpmp2
    from torch_robotics_tpu.trajectory.metrics import compute_smoothness

    env = EnvGridCircles2D(precompute_sdf_obj_fixed=False)
    robot = RobotPointMass.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.01)
    start = jnp.array([-0.75, -0.75, 0.0, 0.0])
    goal = jnp.array([0.75, 0.75, 0.0, 0.0])
    theta0 = gpmp2_init_trajs(
        jax.random.PRNGKey(0),
        GPMP2Params(num_samples=16, sigma_gp_init=0.2), start, goal)

    res, res_mpot = plan_mpot_gpmp2(task, theta0, start, goal,
                                    polish_iters=30)
    assert res.trajs.shape == theta0.shape
    frac_free = task.compute_fraction_free_trajs(res.trajs)
    assert frac_free >= 0.4, frac_free
    sm = float(compute_smoothness(res.trajs, robot).mean())
    assert sm < 12.0, sm
    # endpoints pinned through both stages
    np.testing.assert_allclose(res.trajs[:, 0, :2],
                               np.tile([-0.75, -0.75], (16, 1)), atol=2e-2)
    np.testing.assert_allclose(res.trajs[:, -1, :2],
                               np.tile([0.75, 0.75], (16, 1)), atol=2e-2)


def test_dense2d_tuned_mpot_preset():
    """EnvDense2D ships a TUNED mpot preset beyond the reference (zoo.py
    _TUNED_PLANNER_PARAMS; sweep benchmarks/mpot_dense2d_sweep.py took
    pipeline fraction-free 0.594 -> 0.906): the winning knobs must survive
    the preset -> MPOTParams.from_preset round trip."""
    from torch_robotics_tpu.envs import EnvDense2D
    from torch_robotics_tpu.robots import RobotPointMass
    from torch_robotics_tpu.solve.mpot import MPOTParams

    env = EnvDense2D()
    p = MPOTParams.from_preset(env.get_mpot_params(RobotPointMass.create()))
    assert p.opt_iters == 300
    assert p.step_radius == pytest.approx(0.07)
    assert p.probe_radius == pytest.approx(0.09)
    assert p.num_probe == 9
