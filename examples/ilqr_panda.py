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
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.03)
    d = robot.q_dim

    B = 64
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    qs, n1 = task.random_coll_free_q(k1, n_samples=B, max_samples=4096)
    qg = jnp.clip(qs + 0.6 * jax.random.normal(k2, (B, d)),
                  robot.q_min, robot.q_max)
    start = jnp.concatenate([qs, jnp.zeros_like(qs)], -1)
    goal = jnp.concatenate([qg, jnp.zeros_like(qg)], -1)

    params = ILQRParams(n_support_points=32, dt=0.04, opt_iters=30,
                        sigma_coll=2e-3, sigma_goal_prior=5e-3,
                        r_control=1e-6)
    res = ilqr_solve(task.collision_residuals, start, goal, params)

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
