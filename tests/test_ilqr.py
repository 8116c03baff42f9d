"""iLQR solver: convergence, dynamics feasibility, collision avoidance."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_robotics_tpu.solve import ILQRParams, ilqr_solve
from torch_robotics_tpu.solve.ilqr import _dynamics_mats


@pytest.fixture(scope="module")
def circle_tasks():
    """(solver task with wide margin, evaluation task at standard margin)."""
    from torch_robotics_tpu.envs import EnvCircle2D
    from torch_robotics_tpu.robots import RobotPointMass
    from torch_robotics_tpu.tasks import PlanningTask
    env = EnvCircle2D(precompute_sdf_obj_fixed=False)
    robot = RobotPointMass.create()
    solver_task = PlanningTask(env=env, robot=robot,
                               obstacle_cutoff_margin=0.08)
    eval_task = PlanningTask(env=env, robot=robot,
                             obstacle_cutoff_margin=0.03)
    return solver_task, eval_task


PARAMS = ILQRParams(n_support_points=32, dt=0.08, opt_iters=100,
                    sigma_coll=1e-2, sigma_goal_prior=1e-2, r_control=1e-5)

# crossings whose straight line clips the central circle (r=0.3) OFF-center —
# a symmetric line through the center is a stationary point a local method
# cannot leave
START = jnp.array([[-0.8, -0.1, 0.0, 0.0], [-0.7, 0.35, 0.0, 0.0]],
                  jnp.float32)
GOAL = jnp.array([[0.8, 0.3, 0.0, 0.0], [0.7, -0.05, 0.0, 0.0]], jnp.float32)


@pytest.fixture(scope="module")
def solved(circle_tasks):
    solver_task, _ = circle_tasks
    return ilqr_solve(solver_task.collision_residuals, START, GOAL, PARAMS)


def test_ilqr_converges_to_goal(solved):
    res = solved
    # monotone non-increasing cost trace (line search rejects bad steps)
    trace = np.asarray(res.cost_trace)
    assert np.all(trace[1:] <= trace[:-1] + 1e-5)
    # final waypoint reaches the goal position
    final_pos = np.asarray(res.trajs[:, -1, :2])
    np.testing.assert_allclose(final_pos, np.asarray(GOAL[:, :2]), atol=2e-2)
    # large improvement over the zero-control rollout
    assert np.all(np.asarray(res.costs) < 0.2 * trace[0])


def test_ilqr_dynamics_exact(solved):
    res = solved
    Phi, Bm = _dynamics_mats(2, PARAMS.dt, jnp.float32)
    xs, U = res.trajs, res.controls
    pred = jnp.einsum("ij,bhj->bhi", Phi, xs[:, :-1]) + jnp.einsum(
        "ij,bhj->bhi", Bm, U)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(xs[:, 1:]),
                               atol=1e-5)


def test_ilqr_avoids_collisions(circle_tasks, solved):
    _, eval_task = circle_tasks
    # the straight lines between these endpoints clip the circle; the
    # optimized trajectories must be collision-free at the standard margin
    from torch_robotics_tpu.solve.gp_prior import straight_line_trajs
    sl = straight_line_trajs(START, GOAL, PARAMS.n_support_points)
    assert float(eval_task.compute_fraction_free_trajs(sl)) == 0.0
    frac_free = float(eval_task.compute_fraction_free_trajs(solved.trajs))
    assert frac_free == 1.0, frac_free


def test_ilqr_warm_start_reuses_controls(circle_tasks, solved):
    solver_task, _ = circle_tasks
    # warm-started from the converged controls, 3 iterations must stay at
    # (or below) the converged cost
    p_short = ILQRParams(n_support_points=PARAMS.n_support_points,
                         dt=PARAMS.dt, opt_iters=3,
                         sigma_coll=PARAMS.sigma_coll,
                         sigma_goal_prior=PARAMS.sigma_goal_prior,
                         r_control=PARAMS.r_control)
    res2 = ilqr_solve(solver_task.collision_residuals, START, GOAL, p_short,
                      u_init=solved.controls)
    assert np.all(np.asarray(res2.costs) <= np.asarray(solved.costs) + 1e-4)


def test_ilqr_unbatched_single_problem(circle_tasks):
    solver_task, _ = circle_tasks
    start = jnp.array([-0.8, -0.8, 0.0, 0.0], jnp.float32)
    goal = jnp.array([0.8, 0.8, 0.0, 0.0], jnp.float32)
    res = ilqr_solve(solver_task.collision_residuals, start, goal, PARAMS)
    assert res.trajs.shape == (PARAMS.n_support_points, 4)
    assert res.controls.shape == (PARAMS.n_support_points - 1, 2)
    assert np.isfinite(float(res.costs))


def test_ilqr_extreme_weight_ratio_stays_finite_and_converges():
    """Square-root Riccati regression: kg/r ~ 4e10 NaN'd the dense sweep.

    The plain Cholesky backward pass loses the smallest Schur-complement
    eigenvalues to float32 cancellation at terminal-goal weight 1/sigma^2 =
    4e4 against control cost 1e-6 (Vxx goes indefinite at the second
    backward step and every line-search candidate is NaN, so the solver
    silently returns the initial rollout).  The QR square-root sweep keeps
    the recursion at sqrt dynamic range; it must make real progress here.
    """
    from torch_robotics_tpu.envs import EnvSpheres3D
    from torch_robotics_tpu.robots import RobotPanda
    from torch_robotics_tpu.tasks import PlanningTask

    task = PlanningTask(env=EnvSpheres3D(), robot=RobotPanda.create(),
                        obstacle_cutoff_margin=0.03)
    d = task.robot.q_dim
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    qs, _ = task.random_coll_free_q(k1, n_samples=4, max_samples=256)
    qg = jnp.clip(qs + 0.6 * jax.random.normal(k2, (4, d)),
                  task.robot.q_min, task.robot.q_max)
    start = jnp.concatenate([qs, jnp.zeros_like(qs)], -1)
    goal = jnp.concatenate([qg, jnp.zeros_like(qg)], -1)
    p = ILQRParams(n_support_points=16, dt=0.04, opt_iters=10,
                   sigma_coll=2e-3, sigma_goal_prior=5e-3, r_control=1e-6)
    res = ilqr_solve(task.collision_residuals, start, goal, p)
    assert bool(jnp.isfinite(res.trajs).all())
    assert bool(jnp.isfinite(res.cost_trace).all())
    dist0 = jnp.linalg.norm(start[:, :d] - goal[:, :d], axis=-1)
    distF = jnp.linalg.norm(res.trajs[:, -1, :d] - goal[:, :d], axis=-1)
    # every problem must at least halve its goal distance (the dense sweep
    # left distF == dist0 exactly); most reach ~1e-4
    assert bool((distF < 0.5 * dist0).all()), (dist0, distF)


def test_ilqr_riccati_lanes_matches_qr(circle_tasks):
    """The lanes two-phase Householder backward pass (riccati="lanes", the
    TPU fast path) computes the same square-root Riccati recursion as the
    batched jnp.linalg.qr reference form; at well-conditioned weights the
    optimized trajectories must agree to float32 tolerance.  (At extreme
    kg/r ratios ~1e10 the feedforward through the barely-penalized control
    subspace is noise-dominated for BOTH forms and individual problems may
    pick different line-search steps; quality stays equal — benchmarked in
    benchmarks/ilqr_riccati_ab.py.)"""
    solver_task, _ = circle_tasks
    p_qr = ILQRParams(n_support_points=32, dt=0.08, opt_iters=25,
                      sigma_coll=1e-2, sigma_goal_prior=1e-2,
                      r_control=1e-3, riccati="qr")
    p_ln = ILQRParams(**{**p_qr.__dict__, "riccati": "lanes"})
    r_qr = ilqr_solve(solver_task.collision_residuals, START, GOAL, p_qr)
    r_ln = ilqr_solve(solver_task.collision_residuals, START, GOAL, p_ln)
    # float32 rounding differences between the two factorizations drift
    # ~1e-3 over 25 closed-loop iterations
    np.testing.assert_allclose(np.asarray(r_ln.trajs), np.asarray(r_qr.trajs),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(r_ln.costs), np.asarray(r_qr.costs),
                               rtol=1e-3)


def test_ilqr_riccati_lanes_with_limits_and_running(circle_tasks):
    """Mode parity with the optional cost terms active (sigma_limits hinge
    rows and the running goal pull add F rows / l_x terms on both paths)."""
    solver_task, _ = circle_tasks
    lims = (jnp.full((2,), -1.2), jnp.full((2,), 1.2))
    p_qr = ILQRParams(n_support_points=16, dt=0.08, opt_iters=10,
                      sigma_coll=1e-2, sigma_goal_prior=1e-2,
                      sigma_goal_running=0.1, sigma_limits=1e-2,
                      r_control=1e-3, riccati="qr")
    p_ln = ILQRParams(**{**p_qr.__dict__, "riccati": "lanes"})
    r_qr = ilqr_solve(solver_task.collision_residuals, START, GOAL, p_qr,
                      q_limits=lims)
    r_ln = ilqr_solve(solver_task.collision_residuals, START, GOAL, p_ln,
                      q_limits=lims)
    np.testing.assert_allclose(np.asarray(r_ln.trajs), np.asarray(r_qr.trajs),
                               atol=5e-4)


def test_ilqr_tracking_follows_reference(circle_tasks, solved):
    """x_ref tracking mode: a short-horizon controller tracking a converged
    plan's waypoints stays on the plan's detour around the obstacle, where
    point-goal regulation would pull straight through it."""
    solver_task, eval_task = circle_tasks
    plan = solved.trajs                       # (2, 32, 4) converged plans
    H_trk, n_exec = 8, 24
    p_trk = ILQRParams(n_support_points=H_trk, dt=PARAMS.dt, opt_iters=3,
                       sigma_coll=1e-2, sigma_goal_prior=1e-2,
                       sigma_goal_running=0.05, r_control=1e-3)
    pad = jnp.broadcast_to(GOAL[:, None], (2, H_trk + n_exec, 4))
    ref_full = jnp.concatenate([plan, pad], axis=1)
    x = START
    u_warm = jnp.zeros((2, H_trk - 1, 2))
    xs = [x]
    for t in range(n_exec):
        refs = jax.lax.dynamic_slice_in_dim(ref_full, t + 1, H_trk, axis=1)
        res = ilqr_solve(solver_task.collision_residuals, x, GOAL, p_trk,
                         u_init=u_warm, x_ref=refs)
        x = res.trajs[:, 1, :]
        u_warm = jnp.concatenate([res.controls[:, 1:],
                                  res.controls[:, -1:]], 1)
        xs.append(x)
    exec_traj = jnp.stack(xs, axis=1)
    # executed path stays collision-free (the plans are free around the
    # central circle) and tracks the plan closely
    assert eval_task.compute_fraction_free_trajs(exec_traj[..., :2]) == 1.0
    dev = jnp.linalg.norm(
        exec_traj[:, 1:, :2] - plan[:, 1:n_exec + 1, :2], axis=-1)
    assert float(dev.max()) < 0.15, float(dev.max())
