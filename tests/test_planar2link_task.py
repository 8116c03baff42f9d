import jax
import jax.numpy as jnp
import numpy as np

from torch_robotics_tpu.envs import EnvPlanar2Link
from torch_robotics_tpu.robots import RobotPlanar2Link
from torch_robotics_tpu.tasks import PlanningTask


def test_planar2link_task():
    env = EnvPlanar2Link()
    robot = RobotPlanar2Link.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.01)

    # collision points: 12 interpolated along the arm, margins match
    q = jnp.zeros((3, 2))
    link_pos = robot.fk_map_collision(q)
    pts = robot.object_collision_points(link_pos)
    assert pts.shape == (3, 12, 2)
    assert robot.object_margins.shape == (12,)

    # arm pointing at the sphere at (0.2, 0.5) r=0.3: q=(pi/2, 0) puts the
    # arm along +y through the obstacle
    q_hit = jnp.array([[jnp.pi / 2, 0.0]])
    q_free = jnp.array([[-jnp.pi / 2, 0.0]])  # along -y, no obstacle at reach
    assert bool(task.compute_collision(q_hit)[0])
    cost_hit = task.compute_collision_cost(q_hit)[0]
    cost_free = task.compute_collision_cost(q_free)[0]
    assert float(cost_hit) > float(cost_free)

    # residual jacobian fast path agrees with autodiff
    raj = task.collision_residuals.residuals_and_jacobian
    qs = robot.random_q(jax.random.PRNGKey(0), 8)
    for i in range(0, 8, 4):
        r_fast, J_fast = raj(qs[i])
        np.testing.assert_allclose(r_fast, task.collision_residuals(qs[i]),
                                   atol=1e-5)
        J_ref = jax.jacfwd(task.collision_residuals)(qs[i])
        np.testing.assert_allclose(J_fast, J_ref, atol=1e-3)


def test_planar2link_gpmp2_solves():
    env = EnvPlanar2Link()
    robot = RobotPlanar2Link.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.01)
    from torch_robotics_tpu.solve import GPMP2Params, gpmp2_init_trajs, gpmp2_solve
    params = GPMP2Params(n_support_points=32, dt=0.04, opt_iters=60,
                         sigma_coll=1e-3, sigma_start=1e-4,
                         sigma_goal_prior=1e-4, sigma_gp=2e-2, step_size=0.5,
                         num_samples=8, sigma_gp_init=0.1)
    start = jnp.array([-jnp.pi / 2, 0.0, 0.0, 0.0])
    goal = jnp.array([jnp.pi / 2 + 0.8, -0.4, 0.0, 0.0])
    theta0 = gpmp2_init_trajs(jax.random.PRNGKey(1), params, start, goal)
    res = gpmp2_solve(task.collision_residuals, theta0, start, goal, params)
    assert bool(jnp.isfinite(res.trajs).all())
    assert float(res.cost_trace[-1].mean()) <= float(res.cost_trace[0].mean())
