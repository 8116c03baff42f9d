"""Dynamically-feasible Panda trajectory optimization with batched iLQR.

Unlike the GPMP2/CHOMP paths (which optimize waypoints and trust the GP
prior for smoothness), iLQR optimizes CONTROLS of an exact double
integrator: the returned states satisfy x_{t+1} = Phi x_t + B u_t to
machine precision, so velocity/acceleration limits can be enforced on real
quantities.  Perf numbers: benchmarks/ilqr_sgpmp_bench.py.
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from torch_robotics_tpu.envs import EnvSpheres3D
from torch_robotics_tpu.robots import RobotPanda
from torch_robotics_tpu.solve.ilqr import ILQRParams, ilqr_solve
from torch_robotics_tpu.tasks import PlanningTask

if __name__ == "__main__":
    env = EnvSpheres3D()
    robot = RobotPanda.create()
    # 0.06 cutoff: wide repulsion buffer (at 0.03 fast transits graze
    # obstacles the hinge never saw; see benchmarks/ilqr_sgpmp_bench.py)
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.06)
    d = robot.q_dim

    B = 64
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    qs, n1 = task.random_coll_free_q(k1, n_samples=B, max_samples=4096)
    # goals rejection-sampled collision-free (a goal inside an obstacle
    # makes goal-distance/fraction-free meaningless)
    # goals inset 0.01 rad from the joint limits: a goal exactly ON a
    # hard stop makes the tracker graze out-of-limits by ~1e-3 rad,
    # which trajectory validators count as infeasible
    pert = jnp.clip(qs + 0.6 * jax.random.normal(k2, (16, B, d)),
                    robot.q_min + 0.01, robot.q_max - 0.01)
    free0 = (task.compute_collision(pert.reshape(-1, d)) == 0).reshape(16, B)
    idx = jnp.argmax(free0, axis=0)
    qg = jnp.where(free0.max(0)[:, None], pert[idx, jnp.arange(B)], qs)
    start = jnp.concatenate([qs, jnp.zeros_like(qs)], -1)
    goal = jnp.concatenate([qg, jnp.zeros_like(qg)], -1)

    params = ILQRParams(n_support_points=32, dt=0.04, opt_iters=30,
                        sigma_coll=2e-3, sigma_goal_prior=5e-3,
                        sigma_limits=5e-3, r_control=1e-6)
    limits = (robot.q_min, robot.q_max)
    res = ilqr_solve(task.collision_residuals, start, goal, params,
                     q_limits=limits)

    # feasibility: states must satisfy the double integrator exactly
    q, qd = res.trajs[..., :d], res.trajs[..., d:]
    dt = params.dt
    q_pred = q[..., :-1, :] + dt * qd[..., :-1, :] \
        + 0.5 * dt * dt * res.controls
    feas = float(jnp.abs(res.trajs[..., 1:, :d] - q_pred).max())
    goal_dist = jnp.linalg.norm(res.trajs[:, -1, :d] - qg, axis=-1)
    frac_free = task.compute_fraction_free_trajs(res.trajs)

    print(f"iLQR batch {B}: dynamics feasibility max err {feas:.2e}")
    print(f"mean final goal distance {float(goal_dist.mean()):.3f} rad, "
          f"{int((goal_dist < 0.2).sum())}/{B} within 0.2 rad")
    print(f"{frac_free * 100:.0f}% collision-free trajectories")
    print(f"peak |control| {float(jnp.abs(res.controls).max()):.1f} rad/s^2")

    if "--track" in sys.argv:
        # plan & track: a short-horizon (H=16, 3-iter) controller tracks
        # receding windows of the converged plan — executed paths inherit
        # the plan's detours, where a point-goal regulator would drag the
        # arm through any obstacle its pull line crosses
        import dataclasses
        H_trk, n_exec = 16, 40
        p_trk = dataclasses.replace(
            params, n_support_points=H_trk, opt_iters=3,
            sigma_goal_running=0.05, r_control=1e-3)
        pad = jnp.broadcast_to(goal[:, None], (B, H_trk + n_exec, 2 * d))
        ref_full = jnp.concatenate([res.trajs, pad], axis=1)
        x = start
        u_warm = jnp.zeros((B, H_trk - 1, d))
        xs = [x]
        for t in range(n_exec):
            refs = jax.lax.dynamic_slice_in_dim(ref_full, t + 1, H_trk,
                                                axis=1)
            step = ilqr_solve(task.collision_residuals, x, goal, p_trk,
                              u_init=u_warm, x_ref=refs, q_limits=limits)
            x = step.trajs[:, 1, :]
            u_warm = jnp.concatenate(
                [step.controls[:, 1:], step.controls[:, -1:]], 1)
            xs.append(x)
        exec_traj = jnp.stack(xs, 1)
        dist = jnp.linalg.norm(exec_traj[:, -1, :d] - qg, axis=-1)
        frac = task.compute_fraction_free_trajs(exec_traj[..., :d])
        print(f"tracking MPC ({n_exec} steps): median final goal distance "
              f"{float(jnp.median(dist)):.4f} rad, "
              f"{frac * 100:.0f}% executed paths collision-free")
