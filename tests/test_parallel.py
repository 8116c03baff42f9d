import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_robotics_tpu.envs import EnvDense2D
from torch_robotics_tpu.parallel import (chomp_solve_sharded,
                                         ilqr_solve_sharded, make_mesh,
                                         mpc_rollout_sharded,
                                         sgpmp_solve_sharded, shard_batch,
                                         shard_batch_padded, solve_sharded)
from torch_robotics_tpu.robots import RobotPointMass
from torch_robotics_tpu.solve import GPMP2Params, gpmp2_init_trajs, gpmp2_solve
from torch_robotics_tpu.solve.chomp import CHOMPParams, chomp_solve
from torch_robotics_tpu.solve.ilqr import ILQRParams, ilqr_solve
from torch_robotics_tpu.solve.mpc import MPCParams, mpc_rollout
from torch_robotics_tpu.solve.sampling import SGPMPParams
from torch_robotics_tpu.tasks import PlanningTask


@pytest.fixture(scope="module")
def setup():
    env = EnvDense2D(precompute_sdf_obj_fixed=False)
    robot = RobotPointMass.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.01)
    params = GPMP2Params(n_support_points=16, dt=0.04, opt_iters=20,
                         sigma_start=1e-4, sigma_gp=1e-2,
                         sigma_goal_prior=1e-4, sigma_coll=1e-3,
                         step_size=0.5, sigma_gp_init=0.05)
    return task, params


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_solve_sharded_matches_single_device(setup):
    task, params = setup
    mesh = make_mesh()
    start = jnp.array([-0.9, -0.9, 0.0, 0.0])
    goal = jnp.array([0.9, 0.9, 0.0, 0.0])
    theta0 = gpmp2_init_trajs(jax.random.PRNGKey(0), params, start, goal,
                              num_samples=16)
    res_single = gpmp2_solve(task.collision_residuals, theta0, start, goal,
                             params)
    theta0_sharded = shard_batch(theta0, mesh)
    trajs, global_mean = solve_sharded(
        task.collision_residuals, theta0_sharded, start, goal, params, mesh)
    np.testing.assert_allclose(trajs, res_single.trajs, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(global_mean, res_single.costs.mean(),
                               rtol=1e-4, atol=1e-4)


def test_mpc_rollout_reaches_goal(setup):
    task, params = setup
    mpc_params = MPCParams(gpmp2=params, iters_per_step=2)
    start = jnp.tile(jnp.array([-0.9, -0.9, 0.0, 0.0]), (8, 1))
    goal = jnp.tile(jnp.array([0.9, 0.9, 0.0, 0.0]), (8, 1))
    xs, info = mpc_rollout(task.collision_residuals, start, goal, mpc_params,
                           n_steps=40)
    assert xs.shape == (8, 40, 4)
    assert bool(jnp.all(jnp.isfinite(xs)))
    # receding horizon should make progress toward the goal
    assert float(info["dist_to_goal"][-1].mean()) < float(
        info["dist_to_goal"][0].mean())


def test_mpc_rollout_sharded_runs(setup):
    task, params = setup
    mesh = make_mesh()
    mpc_params = MPCParams(gpmp2=params, iters_per_step=1)
    start = shard_batch(jnp.tile(jnp.array([-0.9, -0.9, 0.0, 0.0]), (16, 1)),
                        mesh)
    goal = shard_batch(jnp.tile(jnp.array([0.9, 0.9, 0.0, 0.0]), (16, 1)),
                       mesh)
    xs, frac = mpc_rollout_sharded(task.collision_residuals, start, goal,
                                   mpc_params, 10, mesh)
    assert xs.shape == (16, 10, 4)
    assert jnp.isfinite(frac)


def test_mpc_rollout_sharded_matches_single_device(setup):
    """The jitted shard_map MPC rollout is numerically identical to the
    plain path (8-device mesh, per-problem endpoints)."""
    task, params = setup
    mesh = make_mesh()
    mpc_params = MPCParams(gpmp2=params, iters_per_step=1)
    key = jax.random.PRNGKey(4)
    delta = 0.05 * jax.random.normal(key, (16, 2))
    start_q = jnp.array([-0.9, -0.9]) + delta
    goal_q = jnp.array([0.9, 0.9]) - delta
    start = jnp.concatenate([start_q, jnp.zeros_like(start_q)], -1)
    goal = jnp.concatenate([goal_q, jnp.zeros_like(goal_q)], -1)
    xs_plain, _ = mpc_rollout(task.collision_residuals, start, goal,
                              mpc_params, n_steps=6)
    xs_sh, _ = mpc_rollout_sharded(
        task.collision_residuals, shard_batch(start, mesh),
        shard_batch(goal, mesh), mpc_params, 6, mesh)
    np.testing.assert_allclose(np.asarray(xs_sh), np.asarray(xs_plain),
                               rtol=1e-5, atol=1e-5)


def test_mpc_rollout_sharded_chunked_matches_unchunked(setup):
    """Knee-sized per-device chunking (parallel/mesh.py _POD_CHUNK) is a
    pure execution-schedule change — results must match unchunked."""
    task, params = setup
    mesh = make_mesh()
    mpc_params = MPCParams(gpmp2=params, iters_per_step=1)
    key = jax.random.PRNGKey(5)
    delta = 0.05 * jax.random.normal(key, (32, 2))
    start_q = jnp.array([-0.9, -0.9]) + delta
    goal_q = jnp.array([0.9, 0.9]) - delta
    start = jnp.concatenate([start_q, jnp.zeros_like(start_q)], -1)
    goal = jnp.concatenate([goal_q, jnp.zeros_like(goal_q)], -1)
    xs_un, frac_un = mpc_rollout_sharded(
        task.collision_residuals, shard_batch(start, mesh),
        shard_batch(goal, mesh), mpc_params, 4, mesh, chunk=None)
    xs_ch, frac_ch = mpc_rollout_sharded(
        task.collision_residuals, shard_batch(start, mesh),
        shard_batch(goal, mesh), mpc_params, 4, mesh, chunk=2)
    np.testing.assert_allclose(np.asarray(xs_ch), np.asarray(xs_un),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(frac_ch), float(frac_un), atol=1e-6)


def _endpoint_batch(B, key=jax.random.PRNGKey(7)):
    delta = 0.05 * jax.random.normal(key, (B, 2))
    start_q = jnp.array([-0.9, -0.9]) + delta
    goal_q = jnp.array([0.9, 0.9]) - delta
    start = jnp.concatenate([start_q, jnp.zeros_like(start_q)], -1)
    goal = jnp.concatenate([goal_q, jnp.zeros_like(goal_q)], -1)
    return start, goal


def test_ilqr_sharded_matches_single_device(setup):
    task, _ = setup
    mesh = make_mesh()
    params = ILQRParams(n_support_points=16, dt=0.04, opt_iters=5,
                        sigma_coll=1e-2, sigma_goal_prior=1e-2)
    start, goal = _endpoint_batch(16)
    res_plain = ilqr_solve(task.collision_residuals, start, goal, params)
    res_sh, gmean = ilqr_solve_sharded(
        task.collision_residuals, shard_batch(start, mesh),
        shard_batch(goal, mesh), params, mesh)
    np.testing.assert_allclose(np.asarray(res_sh.trajs),
                               np.asarray(res_plain.trajs),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res_sh.cost_trace),
                               np.asarray(res_plain.cost_trace),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(gmean), float(res_plain.costs.mean()),
                               rtol=1e-5)


def test_ilqr_sharded_optionals_padded_chunked(setup):
    """q_limits replicated + warm-start controls sharded + uneven batch via
    shard_batch_padded + per-device chunking, all at once."""
    task, _ = setup
    mesh = make_mesh()
    robot = task.robot
    params = ILQRParams(n_support_points=16, dt=0.04, opt_iters=3,
                        sigma_coll=1e-2, sigma_goal_prior=1e-2,
                        sigma_limits=1e-1)
    B_odd = 13
    start, goal = _endpoint_batch(B_odd)
    u0 = jnp.zeros((B_odd, 15, 2))
    qlim = (robot.q_min, robot.q_max)
    res_plain = ilqr_solve(task.collision_residuals, start, goal, params,
                           u_init=u0, q_limits=qlim)
    s_p, n_valid = shard_batch_padded(start, mesh)
    g_p, _ = shard_batch_padded(goal, mesh)
    u_p, _ = shard_batch_padded(u0, mesh)
    res_sh, gmean = ilqr_solve_sharded(
        task.collision_residuals, s_p, g_p, params, mesh, u_init=u_p,
        q_limits=qlim, n_valid=n_valid, chunk=1)
    np.testing.assert_allclose(np.asarray(res_sh.trajs[:B_odd]),
                               np.asarray(res_plain.trajs),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(gmean), float(res_plain.costs.mean()),
                               rtol=1e-5)


def test_chomp_sharded_matches_single_device(setup):
    task, gparams = setup
    mesh = make_mesh()
    params = CHOMPParams(n_support_points=16, dt=0.04, opt_iters=10,
                         sigma_coll=1e-2)
    start = jnp.array([-0.9, -0.9, 0.0, 0.0])
    goal = jnp.array([0.9, 0.9, 0.0, 0.0])
    theta0 = gpmp2_init_trajs(jax.random.PRNGKey(1), gparams, start, goal,
                              num_samples=16)
    res_plain = chomp_solve(task.collision_residuals, theta0, start, goal,
                            params)
    res_sh, gmean = chomp_solve_sharded(
        task.collision_residuals, shard_batch(theta0, mesh), start, goal,
        params, mesh)
    np.testing.assert_allclose(np.asarray(res_sh.trajs),
                               np.asarray(res_plain.trajs),
                               rtol=1e-5, atol=1e-5)
    # CHOMP's trace is batch-summed; the sharded one is psum'd over devices
    np.testing.assert_allclose(np.asarray(res_sh.cost_trace),
                               np.asarray(res_plain.cost_trace),
                               rtol=1e-4)
    np.testing.assert_allclose(
        float(gmean), float(res_plain.cost_trace[-1]) / 16, rtol=1e-4)


def test_sgpmp_sharded_converges(setup):
    """sGPMP draws independent per-device streams (fold_in(axis_index)) —
    statistically equivalent, not bitwise: assert shape, finiteness, and
    that optimization made progress on every problem."""
    task, gparams = setup
    mesh = make_mesh()
    params = SGPMPParams(n_support_points=16, dt=0.04, opt_iters=10,
                         num_samples=8, sigma_coll=1e-2,
                         sigma_gp_sample=0.05)
    start = jnp.array([-0.9, -0.9, 0.0, 0.0])
    goal = jnp.array([0.9, 0.9, 0.0, 0.0])
    theta0 = gpmp2_init_trajs(jax.random.PRNGKey(2), gparams, start, goal,
                              num_samples=16)
    res_sh, gmean = sgpmp_solve_sharded(
        task.collision_residuals, shard_batch(theta0, mesh), start, goal,
        params, mesh, key=jax.random.PRNGKey(3))
    assert res_sh.trajs.shape == (16, 16, 4)
    assert bool(jnp.all(jnp.isfinite(res_sh.trajs)))
    assert res_sh.cost_trace.shape == (10, 16)
    assert bool(jnp.isfinite(gmean))
    assert bool(jnp.all(res_sh.cost_trace[-1] <= res_sh.cost_trace[0]))


def test_sgpmp_sharded_chunked_distinct_noise(setup):
    """Knee-chunked sGPMP must draw DISTINCT perturbation streams per chunk
    (fold_in(chunk_id)): identical problems placed in different chunks on
    the same device should NOT produce bit-identical trajectories."""
    task, gparams = setup
    mesh = make_mesh()
    params = SGPMPParams(n_support_points=16, dt=0.04, opt_iters=5,
                         num_samples=4, sigma_coll=1e-2,
                         sigma_gp_sample=0.05)
    start = jnp.array([-0.9, -0.9, 0.0, 0.0])
    goal = jnp.array([0.9, 0.9, 0.0, 0.0])
    one = gpmp2_init_trajs(jax.random.PRNGKey(2), gparams, start, goal,
                           num_samples=4)
    # 4 identical problems per device share -> 2 chunks of 2: rows 0 and 2
    # land at the same intra-chunk index of different chunks
    theta0 = jnp.tile(one[:1], (32, 1, 1))
    res_sh, _ = sgpmp_solve_sharded(
        task.collision_residuals, shard_batch(theta0, mesh), start, goal,
        params, mesh, key=jax.random.PRNGKey(3), chunk=2)
    t = np.asarray(res_sh.trajs)
    assert res_sh.trajs.shape == (32, 16, 4)
    assert bool(np.all(np.isfinite(t)))
    # same device (rows 0-3 live on device 0), same intra-chunk index,
    # different chunks -> different noise -> different optimized trajs
    assert not np.allclose(t[0], t[2]), \
        "chunks drew bit-identical perturbation streams"


def test_chomp_sharded_padded_excludes_duplicates(setup):
    """chomp_solve_sharded with a padded batch (n_valid) must exclude the
    padded duplicate rows from the summed trace and the global mean."""
    task, gparams = setup
    mesh = make_mesh()
    params = CHOMPParams(n_support_points=16, dt=0.04, opt_iters=10,
                         sigma_coll=1e-2)
    start = jnp.array([-0.9, -0.9, 0.0, 0.0])
    goal = jnp.array([0.9, 0.9, 0.0, 0.0])
    theta0 = gpmp2_init_trajs(jax.random.PRNGKey(1), gparams, start, goal,
                              num_samples=13)
    res_plain = chomp_solve(task.collision_residuals, theta0, start, goal,
                            params, per_problem_trace=True)
    padded, n_valid = shard_batch_padded(theta0, mesh)
    res_sh, gmean = chomp_solve_sharded(
        task.collision_residuals, padded, start, goal, params, mesh,
        n_valid=n_valid)
    trace_valid = np.asarray(res_plain.cost_trace)  # (iters, 13)
    np.testing.assert_allclose(np.asarray(res_sh.cost_trace),
                               trace_valid.sum(axis=1), rtol=1e-4)
    np.testing.assert_allclose(float(gmean), trace_valid[-1].mean(),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(res_sh.trajs[:13]),
                               np.asarray(res_plain.trajs), rtol=1e-5,
                               atol=1e-5)
