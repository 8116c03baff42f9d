"""Fused Pallas GN obstacle-terms kernel (ops/pallas_terms.py).

The kernel runs the whole terms pipeline (FK -> point Jacobians -> scene
SDF+grad -> hinge -> dense J^T r / J^T J assembly) per lane tile; these
tests pin (a) interpret-mode parity with the XLA lanes factory, (b) the
factory's gating, (c) the off-TPU dispatch back to the XLA graph."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_robotics_tpu.envs import EnvDense2D, EnvSpheres3D
from torch_robotics_tpu.ops.lanes_fk import obstacle_terms_lanes_factory
from torch_robotics_tpu.ops.pallas_terms import obstacle_terms_pallas_factory
from torch_robotics_tpu.robots import RobotPanda, RobotPointMass, RobotUR10
from torch_robotics_tpu.tasks import PlanningTask


def _rand_q(robot, n, seed=3):
    return jax.random.uniform(
        jax.random.PRNGKey(seed), (robot.q_dim, n),
        minval=robot.q_min[:, None], maxval=robot.q_max[:, None])


# NOTE: the grasped-object Panda variant is validated on real hardware by
# benchmarks/pallas_terms_ab.py — its interpret-mode run costs ~650 s of
# CPU compile (the ~2.4x-bigger kernel body), too slow for this suite.
@pytest.mark.parametrize("make_robot,h_variants", [
    (lambda: RobotPanda.create(), (None, 8)),
    (lambda: RobotUR10(), (None,)),
])
def test_pallas_terms_interpret_matches_xla(make_robot, h_variants):
    robot = make_robot()
    task = PlanningTask(env=EnvSpheres3D(), robot=robot,
                        obstacle_cutoff_margin=0.03)
    t_xla = obstacle_terms_lanes_factory(task)
    t_pal = obstacle_terms_pallas_factory(task)
    assert t_pal is not None
    q = _rand_q(robot, 32)
    for h in h_variants:
        a = t_xla(q, 77.0, h=h)
        b = t_pal(q, 77.0, h=h, interpret=True)
        for x, y in zip(a, b):
            scale = float(jnp.abs(x).max()) + 1e-30
            np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                       atol=3e-5 * scale, rtol=2e-5)


def test_pallas_terms_2d_scene_interpret():
    robot = RobotPointMass.create()
    task = PlanningTask(env=EnvDense2D(), robot=robot,
                        obstacle_cutoff_margin=0.01)
    # PointMass stays on the XLA path (identity FK — nothing to fuse)
    assert obstacle_terms_pallas_factory(task) is None


def test_pallas_terms_net_interpret_matches_xla():
    """Learned self-collision net runs IN-KERNEL (round 5): the MLP row is
    three small MXU matmuls + vjp on the (features, TN) lanes activations,
    weights entering as full-block VMEM const inputs.  Must match the XLA
    lanes path (which evaluates the same net on (N, d) rows)."""
    from torch_robotics_tpu.ops.pallas_terms import (
        collision_cost_pallas_factory)
    robot_net = RobotPanda.create(use_learned_self_collision=True)
    task_net = PlanningTask(env=EnvSpheres3D(), robot=robot_net,
                            obstacle_cutoff_margin=0.03)
    t_pal = obstacle_terms_pallas_factory(task_net)
    assert t_pal is not None
    t_xla = obstacle_terms_lanes_factory(task_net)
    q = _rand_q(robot_net, 32, seed=17)
    a = t_xla(q, 77.0)
    b = t_pal(q, 77.0, interpret=True)
    for x, y in zip(a, b):
        scale = float(jnp.abs(x).max()) + 1e-30
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   atol=3e-5 * scale, rtol=2e-5)
    c_pal = collision_cost_pallas_factory(task_net)
    assert c_pal is not None
    ref = t_xla(q, 1.0)[2]
    got = c_pal(q, interpret=True)
    scale = float(jnp.abs(ref).max()) + 1e-30
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5 * scale, rtol=2e-5)


def test_pallas_terms_grid_scene_interpret_matches_xla():
    """Grid-SDF scenes take the SPLIT pipeline: XLA performs the packed-row
    (sdf, grad) gather (the measured ~7-11 ns/row floor Pallas cannot
    beat), the kernel consumes the gathered rows as inputs and fuses
    FK + Jacobians + hinge + assembly around them.  Must match the XLA
    lanes path (which shares the gather + surrogate-gradient semantics,
    reference grid_map_sdf.py:84-114)."""
    env_grid = EnvSpheres3D(precompute_sdf_obj_fixed=True,
                            sdf_cell_size=0.05)
    robot = RobotPanda.create()
    task_grid = PlanningTask(env=env_grid, robot=robot,
                             obstacle_cutoff_margin=0.03)
    t_pal = obstacle_terms_pallas_factory(task_grid)
    assert t_pal is not None
    t_xla = obstacle_terms_lanes_factory(task_grid)
    q = _rand_q(robot, 32, seed=11)
    for h in (None, 8):
        a = t_xla(q, 77.0, h=h)
        b = t_pal(q, 77.0, h=h, interpret=True)
        for x, y in zip(a, b):
            scale = float(jnp.abs(x).max()) + 1e-30
            np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                       atol=3e-5 * scale, rtol=2e-5)


def test_cost_kernel_grid_scene_interpret_matches_terms():
    from torch_robotics_tpu.ops.pallas_terms import (
        collision_cost_pallas_factory)
    env_grid = EnvSpheres3D(precompute_sdf_obj_fixed=True,
                            sdf_cell_size=0.05)
    robot = RobotPanda.create()
    task_grid = PlanningTask(env=env_grid, robot=robot,
                             obstacle_cutoff_margin=0.03)
    c_pal = collision_cost_pallas_factory(task_grid)
    assert c_pal is not None
    q = _rand_q(robot, 16, seed=13)
    ref = obstacle_terms_lanes_factory(task_grid)(q, 1.0)[2]
    got = c_pal(q, interpret=True)
    scale = float(jnp.abs(ref).max()) + 1e-30
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5 * scale, rtol=2e-5)


def test_pallas_terms_cpu_dispatch_equals_xla():
    """Off-TPU (interpret=False) the returned terms fn must route to the
    XLA lanes graph and agree with it exactly."""
    task = PlanningTask(env=EnvSpheres3D(), robot=RobotPanda.create(),
                        obstacle_cutoff_margin=0.03)
    t_xla = obstacle_terms_lanes_factory(task)
    t_pal = obstacle_terms_pallas_factory(task)
    q = _rand_q(task.robot, 32, seed=5)
    a = t_xla(q, 10.0)
    b = t_pal(q, 10.0)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_multirobot_pallas_terms_interpret_matches_structured():
    """MultiRobot fused kernel (group-stacked assembly) == the block-
    structured XLA path.  On-chip A/B at config-4 shapes: 2.15 -> 0.442
    ms/iter (4.9x), config 4 30.4k -> 51.6k solves/s."""
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
    q = jax.random.uniform(jax.random.PRNGKey(3), (d, 16),
                           minval=jnp.tile(robot.q_min[:, None], (1, 16)),
                           maxval=jnp.tile(robot.q_max[:, None], (1, 16)))
    t_xla = lanes_fk.obstacle_terms_lanes_multirobot_factory(task)
    t_pal = obstacle_terms_pallas_factory(task)
    assert t_pal is not None
    for h in (None, 4):
        a = t_xla(q, 50.0, h=h)
        b = t_pal(q, 50.0, h=h, interpret=True)
        for x, y in zip(a, b):
            scale = float(jnp.abs(x).max()) + 1e-30
            np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                       atol=3e-5 * scale, rtol=2e-5)


def test_cost_kernel_interpret_matches_terms():
    """collision_cost_pallas_factory == the terms graph's cost output
    (lam=1), single robot and MultiRobot; and the task wires it."""
    from torch_robotics_tpu.core import z_rot
    from torch_robotics_tpu.ops.pallas_terms import (
        collision_cost_pallas_factory)
    from torch_robotics_tpu.robots import MultiRobot

    for robot in (RobotPanda.create(),
                  MultiRobot.create(
                      [RobotPanda.create(), RobotUR10()],
                      [(jnp.eye(3), jnp.array([0.2, 0.55, 0.0])),
                       (z_rot(jnp.array(jnp.pi)),
                        jnp.array([0.2, -0.55, 0.0]))])):
        task = PlanningTask(env=EnvSpheres3D(), robot=robot,
                            obstacle_cutoff_margin=0.03)
        c_pal = collision_cost_pallas_factory(task)
        assert c_pal is not None
        assert getattr(task.collision_residuals, "collision_cost_lanes",
                       None) is not None
        q = _rand_q(robot, 16, seed=5)
        ref = obstacle_terms_lanes_factory(task)(q, 1.0)[2]
        got = c_pal(q, interpret=True)
        scale = float(jnp.abs(ref).max()) + 1e-30
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5 * scale, rtol=2e-5)


def test_chomp_fused_gradient_matches_autodiff():
    """CHOMP's obstacle gradient via the lanes/fused terms hook equals
    autodiff through the residual chain (CPU: both take the XLA path)."""
    from torch_robotics_tpu.solve.chomp import CHOMPParams, chomp_solve
    from torch_robotics_tpu.solve.gp_prior import straight_line_trajs

    task = PlanningTask(env=EnvSpheres3D(), robot=RobotPanda.create(),
                        obstacle_cutoff_margin=0.03)
    start = jnp.concatenate([jnp.zeros(7), jnp.zeros(7)])
    goal = jnp.concatenate([jnp.full(7, 0.5), jnp.zeros(7)])
    theta0 = straight_line_trajs(start[None], goal[None], 16)
    p = CHOMPParams(n_support_points=16, opt_iters=8, sigma_coll=1e-2)
    res_hook = chomp_solve(task.collision_residuals, theta0, start, goal, p)

    # plain residual fn (no hooks) -> autodiff path
    def plain(q):
        return task.collision_residuals(q)
    plain.supports_batch = True
    res_ad = chomp_solve(plain, theta0, start, goal, p)
    np.testing.assert_allclose(np.asarray(res_hook.trajs),
                               np.asarray(res_ad.trajs), atol=1e-5)


def test_gn_assembly_kernel_interpret_matches_reference():
    """ops/pallas_gn_assembly.py is a kept NEGATIVE result (XLA single-
    passes materialized assembly reduces already; see its docstring) but
    stays correct: interpret-mode parity incl. the N-padding path."""
    from torch_robotics_tpu.ops.pallas_gn_assembly import (
        gn_assembly_pallas, gn_assembly_reference)
    P, d, N = 12, 5, 300
    r = jax.random.normal(jax.random.PRNGKey(0), (P, N))
    Jr = jax.random.normal(jax.random.PRNGKey(1), (P, d, N))
    a = gn_assembly_reference(r, Jr)
    b = gn_assembly_pallas(r, Jr, tile_n=128, interpret=True)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   atol=1e-4, rtol=1e-5)


def test_task_wires_fused_terms():
    """PlanningTask prefers the fused factory on supported tasks; the hook
    keeps the XLA-identical CPU behavior (this suite runs on CPU)."""
    task = PlanningTask(env=EnvSpheres3D(), robot=RobotPanda.create(),
                        obstacle_cutoff_margin=0.03)
    terms = getattr(task.collision_residuals, "obstacle_terms_lanes", None)
    assert terms is not None
    q = _rand_q(task.robot, 16, seed=7)
    g, Hb, cost = terms(q, 5.0)
    assert g.shape == (2 * task.robot.q_dim, 16)
    assert bool(jnp.isfinite(Hb).all())
