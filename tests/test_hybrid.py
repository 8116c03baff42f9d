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
