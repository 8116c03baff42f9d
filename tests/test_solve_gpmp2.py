import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_robotics_tpu.envs import EnvDense2D
from torch_robotics_tpu.robots import RobotPointMass
from torch_robotics_tpu.solve import (
    GPMP2Params, gpmp2_init_trajs, gpmp2_solve,
)
from torch_robotics_tpu.tasks import PlanningTask


@pytest.fixture(scope="module")
def setup():
    env = EnvDense2D(precompute_sdf_obj_fixed=False)
    robot = RobotPointMass.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.01)
    params = GPMP2Params.from_preset(task.env.get_gpmp2_params(robot))
    return env, robot, task, params


def test_params_from_preset(setup):
    _, _, _, params = setup
    assert params.n_support_points == 64
    assert params.dt == 0.04
    assert params.sigma_gp == pytest.approx(1e-2)
    assert params.solver_delta == pytest.approx(1e-2)


def test_gpmp2_point_mass_dense2d(setup):
    """Minimum end-to-end slice (SURVEY.md §7): PointMass-2D in EnvDense2D,
    batched GPMP2 solve; trajectories must reach the endpoints smoothly and
    mostly leave collision."""
    env, robot, task, params = setup
    # sigma_gp_init=0.5 restores the initialization diversity the test was
    # tuned for: the exact conditioned-GP sampler (white-noise-on-accel,
    # reference semantics) has a ~2.7x smaller mid-horizon position spread
    # at equal sigma than the earlier Brownian-bridge heuristic
    params = GPMP2Params(**{**params.__dict__, "opt_iters": 100,
                            "num_samples": 16, "sigma_gp_init": 0.5})

    start_q = jnp.array([-0.9, -0.9])
    goal_q = jnp.array([0.9, 0.9])
    start_state = jnp.concatenate([start_q, jnp.zeros(2)])
    goal_state = jnp.concatenate([goal_q, jnp.zeros(2)])

    key = jax.random.PRNGKey(0)
    theta0 = gpmp2_init_trajs(key, params, start_state, goal_state)
    assert theta0.shape == (16, 64, 4)

    result = gpmp2_solve(task.collision_residuals, theta0, start_state,
                         goal_state, params)
    trajs = result.trajs
    assert trajs.shape == (16, 64, 4)
    assert bool(jnp.all(jnp.isfinite(trajs)))

    # endpoints pinned by the tight start/goal priors
    np.testing.assert_allclose(trajs[:, 0, :2],
                               jnp.tile(start_q, (16, 1)), atol=1e-2)
    np.testing.assert_allclose(trajs[:, -1, :2],
                               jnp.tile(goal_q, (16, 1)), atol=1e-2)

    # most trajectories collision-free (straight line through EnvDense2D is
    # in collision, so the solver must have moved them)
    frac_free = task.compute_fraction_free_trajs(trajs)
    assert frac_free >= 0.5, f"only {frac_free:.2f} free"

    # collision cost decreased along the optimization
    assert float(result.cost_trace[-1].mean()) < float(
        result.cost_trace[0].mean())


def test_gpmp2_straight_line_stays_when_free(setup):
    """On a genuinely free segment the GP prior keeps the line.

    The segment x=-0.9, y in [-0.05, 0.65] has 0.135 clearance in
    EnvDense2D — more than the 0.11 the point-mass radius + margin needs
    (the full left edge x=-0.95 used earlier actually clips an obstacle at
    y=-0.41, sdf -0.049, so a detour there was correct behavior).
    """
    env, robot, task, params = setup
    params = GPMP2Params(**{**params.__dict__, "opt_iters": 30,
                            "num_samples": 4, "sigma_gp_init": 1e-3})
    start_state = jnp.array([-0.9, -0.05, 0.0, 0.0])
    goal_state = jnp.array([-0.9, 0.65, 0.0, 0.0])
    theta0 = gpmp2_init_trajs(jax.random.PRNGKey(1), params, start_state,
                              goal_state)
    result = gpmp2_solve(task.collision_residuals, theta0, start_state,
                         goal_state, params)
    # x stays near -0.9 the whole way
    assert float(jnp.abs(result.trajs[..., 0] + 0.9).max()) < 0.05


def test_gpmp2_long_horizon(setup):
    """Horizon scaling: H=256 solves through the same scan machinery."""
    env, robot, task, params = setup
    params = GPMP2Params(**{**params.__dict__, "n_support_points": 256,
                            "opt_iters": 10, "num_samples": 2})
    start = jnp.array([-0.9, -0.9, 0.0, 0.0])
    goal = jnp.array([0.9, 0.9, 0.0, 0.0])
    theta0 = gpmp2_init_trajs(jax.random.PRNGKey(3), params, start, goal)
    assert theta0.shape == (2, 256, 4)
    res = gpmp2_solve(task.collision_residuals, theta0, start, goal, params)
    assert bool(jnp.isfinite(res.trajs).all())
    np.testing.assert_allclose(res.trajs[:, 0, :2],
                               jnp.tile(start[:2], (2, 1)), atol=5e-2)


def test_gpmp2_adaptive_early_stop(setup):
    """gpmp2_solve_adaptive honors stop_criteria: stops before opt_iters on
    an easy problem and matches the fixed-count solve to solver tolerance."""
    from torch_robotics_tpu.solve.gpmp2 import gpmp2_solve_adaptive

    env, robot, task, params = setup
    params = GPMP2Params(**{**params.__dict__, "opt_iters": 200,
                            "num_samples": 8, "stop_criteria": 1e-4,
                            "sigma_gp_init": 1e-3})

    # obstacle-free left edge: collision cost reaches zero quickly, so the
    # relative-improvement check fires long before opt_iters
    start_state = jnp.concatenate([jnp.array([-0.95, -0.95]), jnp.zeros(2)])
    goal_state = jnp.concatenate([jnp.array([-0.95, 0.95]), jnp.zeros(2)])
    theta0 = gpmp2_init_trajs(jax.random.PRNGKey(0), params, start_state,
                              goal_state)

    trajs, costs, n_iters = gpmp2_solve_adaptive(
        task.collision_residuals, theta0, start_state, goal_state, params)
    assert trajs.shape == theta0.shape
    assert bool(jnp.all(jnp.isfinite(trajs)))
    assert int(n_iters) < 200            # actually stopped early
    assert int(n_iters) >= 2

    # endpoints still pinned
    np.testing.assert_allclose(trajs[:, 0, :2],
                               jnp.tile(jnp.array([-0.95, -0.95]), (8, 1)),
                               atol=1e-2)

    # stop_criteria <= 0 falls back to the fixed-count solve
    params_fixed = GPMP2Params(**{**params.__dict__, "stop_criteria": 0.0,
                                  "opt_iters": 50})
    trajs_f, costs_f, n_f = gpmp2_solve_adaptive(
        task.collision_residuals, theta0, start_state, goal_state,
        params_fixed)
    assert int(n_f) == 50
    assert bool(jnp.all(jnp.isfinite(trajs_f)))


def test_gpmp2_solve_restarts(setup):
    """Restart policy: failing trajectories get fresh inits and a re-solve;
    already-free solutions are bit-identical to the plain solve's."""
    from torch_robotics_tpu.solve import gpmp2_solve_restarts

    env, robot, task, params = setup
    params = GPMP2Params(**{**params.__dict__, "opt_iters": 40,
                            "num_samples": 16})
    start_state = jnp.array([-0.9, -0.9, 0.0, 0.0])
    goal_state = jnp.array([0.9, 0.9, 0.0, 0.0])
    theta0 = gpmp2_init_trajs(jax.random.PRNGKey(0), params, start_state,
                              goal_state)

    def free_fn(trajs):
        return ~task.trajs_collision_masks(trajs)[0]

    base = gpmp2_solve(task.collision_residuals, theta0, start_state,
                       goal_state, params)
    res = gpmp2_solve_restarts(task.collision_residuals, theta0, start_state,
                               goal_state, params, free_fn,
                               jax.random.PRNGKey(7), restart_rounds=1,
                               restart_iters=20)
    assert res.trajs.shape == theta0.shape
    assert bool(jnp.all(jnp.isfinite(res.trajs)))
    free0 = np.asarray(free_fn(base.trajs))
    # free solutions are kept untouched
    np.testing.assert_array_equal(np.asarray(res.trajs)[free0],
                                  np.asarray(base.trajs)[free0])
    # restart can only improve (or match) the free fraction
    assert float(jnp.mean(free_fn(res.trajs))) >= free0.mean()


def test_gpmp2_reuse_loop_matches_plain_at_k1(setup):
    """_gpmp2_solve_reuse (GN factorization reuse, round 5) with
    refactor_every=1 must reproduce the plain solve exactly — every
    iteration factors, the substitution branch never executes; at k=2 the
    stale-factor iterations must stay finite and converge to a comparable
    cost (quality parity at production configs is pinned on-device in
    benchmarks/subst_reuse_bench.py / gn_reuse_ab.py)."""
    import dataclasses

    from torch_robotics_tpu.solve.gp_prior import straight_line_trajs
    from torch_robotics_tpu.solve.gpmp2 import _gpmp2_solve_reuse

    env, robot, task, _ = setup
    lt = task.collision_residuals.obstacle_terms_lanes
    assert lt is not None
    B, H = 128, 8
    start = jnp.concatenate([jnp.array([-0.9, -0.9]), jnp.zeros(2)])
    goal = jnp.concatenate([jnp.array([0.9, 0.9]), jnp.zeros(2)])
    theta0 = straight_line_trajs(jnp.tile(start, (B, 1)),
                                 jnp.tile(goal, (B, 1)), H)
    p = GPMP2Params(n_support_points=H, dt=0.1, opt_iters=6,
                    sigma_start=1e-3, sigma_gp=1e-1, sigma_goal_prior=1e-3,
                    sigma_coll=1e-3, step_size=0.5)
    ref = gpmp2_solve(task.collision_residuals, theta0, start, goal, p)
    r1 = _gpmp2_solve_reuse(lt, theta0, start, goal,
                            dataclasses.replace(p, refactor_every=1), None,
                            128, interpret=True)
    np.testing.assert_allclose(np.asarray(r1.trajs), np.asarray(ref.trajs),
                               rtol=1e-5, atol=1e-5)
    r2 = _gpmp2_solve_reuse(lt, theta0, start, goal,
                            dataclasses.replace(p, refactor_every=2), None,
                            128, interpret=True)
    assert bool(jnp.isfinite(r2.trajs).all())
    assert bool(jnp.isfinite(r2.costs).all())
