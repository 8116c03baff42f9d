import jax
import jax.numpy as jnp
import numpy as np

from torch_robotics_tpu.envs import EnvNarrowPassageDense2D
from torch_robotics_tpu.robots import RobotPointMass
from torch_robotics_tpu.solve import GPMP2Params, RRTConnectParams, plan_hybrid
from torch_robotics_tpu.tasks import PlanningTask


def test_plan_hybrid_narrow_passage():
    """Narrow-passage env: RRT finds the passage, GPMP2 smooths through it."""
    env = EnvNarrowPassageDense2D()
    robot = RobotPointMass.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.005)
    gp = GPMP2Params(n_support_points=48, dt=0.04, opt_iters=200,
                     sigma_coll=1e-4, sigma_start=1e-4, sigma_goal_prior=1e-4,
                     sigma_gp=2e-2, step_size=0.2)
    rrt = RRTConnectParams(n_iters=4000, n_radius=0.25, n_pre_samples=4096,
                           max_time=60.0)
    start = jnp.array([-0.9, 0.0])
    goal = jnp.array([0.9, 0.0])
    result, path = plan_hybrid(task, start, goal, gpmp2_params=gp,
                               rrt_params=rrt, num_samples=4,
                               key=jax.random.PRNGKey(0))
    assert path is not None, "RRT failed in the narrow passage"
    assert bool(jnp.isfinite(result.trajs).all())
    frac_free = task.compute_fraction_free_trajs(result.trajs)
    assert frac_free >= 0.5, f"hybrid refinement lost the passage ({frac_free})"
    np.testing.assert_allclose(result.trajs[:, 0, :2],
                               np.tile(start, (4, 1)), atol=2e-2)
    np.testing.assert_allclose(result.trajs[:, -1, :2],
                               np.tile(goal, (4, 1)), atol=2e-2)


def test_mpot_pipeline_fallback_polish_not_below_plain_gpmp2():
    """In dense scenes the OT stage can hand the polish a WORSE init than
    the GP prior; the per-trajectory fallback polish must keep the pipeline
    at-or-above plain GPMP2 at the same polish budget (measured on
    EnvDense2D: 0.20 free without the fallback vs 0.55 plain)."""
    from torch_robotics_tpu.envs import EnvDense2D
    from torch_robotics_tpu.solve import gpmp2_init_trajs, gpmp2_solve
    from torch_robotics_tpu.solve.hybrid import plan_mpot_gpmp2
    from torch_robotics_tpu.solve.mpot import MPOTParams

    env = EnvDense2D()
    robot = RobotPointMass.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.01)
    start = jnp.array([-0.9, -0.9, 0.0, 0.0])
    goal = jnp.array([0.9, 0.9, 0.0, 0.0])
    gp = GPMP2Params.from_preset(env.get_gpmp2_params(robot))
    gp = GPMP2Params(**{**gp.__dict__, "num_samples": 16})
    theta0 = gpmp2_init_trajs(jax.random.PRNGKey(0), gp, start, goal)
    m = MPOTParams(sigma_start=1e-3, sigma_goal=1e-3, w_coll=7e-3,
                   opt_iters=30, smooth_iters=10)
    res_p, _ = plan_mpot_gpmp2(task, theta0, start, goal, mpot_params=m,
                               gpmp2_params=gp, polish_iters=50)
    res_g = gpmp2_solve(task.collision_residuals, theta0, start, goal,
                        GPMP2Params(**{**gp.__dict__, "opt_iters": 50}))
    free_p = task.compute_fraction_free_trajs(res_p.trajs[..., :2])
    free_g = task.compute_fraction_free_trajs(res_g.trajs[..., :2])
    assert free_p >= free_g - 1e-6, (free_p, free_g)
