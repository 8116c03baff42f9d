"""Receding-horizon MPC: Franka Panda in EnvSpheres3D.

Runs a batch of MPC problems to goal configurations, executes the resulting
state rollouts through the PD harness, and reports success statistics.

``--record out.mp4`` additionally executes the first few rollouts through
the MuJoCo contact-dynamics adapter and records the EXECUTED (physics-
integrated) motion to video with collision-sphere debug draw — the
reference Isaac harness's camera-recording role
(motion_planning_envs.py:111-173).
"""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from torch_robotics_tpu.envs import EnvSpheres3D
from torch_robotics_tpu.robots import RobotPanda
from torch_robotics_tpu.solve import GPMP2Params
from torch_robotics_tpu.solve.mpc import MPCParams, mpc_rollout
from torch_robotics_tpu.tasks import PlanningTask

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--record", nargs="?", const="mpc_panda_execution.mp4",
                    default=None, metavar="PATH",
                    help="record MuJoCo-executed rollouts to mp4/gif")
    args = ap.parse_args()
    env = EnvSpheres3D()
    robot = RobotPanda.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.03)

    B = 32
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    starts, n1 = task.random_coll_free_q(k1, n_samples=B, max_samples=2048)
    goals, n2 = task.random_coll_free_q(k2, n_samples=B, max_samples=2048)
    print(f"sampled {int(n1)}/{B} starts, {int(n2)}/{B} goals collision-free")

    start_states = jnp.concatenate([starts, jnp.zeros_like(starts)], axis=-1)
    goal_states = jnp.concatenate([goals, jnp.zeros_like(goals)], axis=-1)

    gp = GPMP2Params(n_support_points=32, dt=0.04, sigma_start=1e-3,
                     sigma_gp=1e-1, sigma_goal_prior=1e-3, sigma_coll=2e-3,
                     step_size=0.8)
    params = MPCParams(gpmp2=gp, iters_per_step=2)
    xs, info = mpc_rollout(task.collision_residuals, start_states,
                           goal_states, params, n_steps=60)
    dist = info["dist_to_goal"][-1]
    print(f"MPC: mean final distance to goal "
          f"{float(dist.mean()):.3f} rad, "
          f"{int((dist < 0.2).sum())}/{B} within 0.2 rad")

    # contact check at margin 0 (actual penetration, not the safety margins)
    coll = task.compute_collision(xs, margin=0.0)
    frac = float(jnp.mean(jnp.any(coll, axis=-1)))
    print(f"{(1 - frac) * 100:.0f}% of executed rollouts contact-free")

    if args.record:
        import matplotlib
        matplotlib.use("Agg")
        from torch_robotics_tpu.sim.mujoco_adapter import MujocoExecutionEnv
        from torch_robotics_tpu.viz import PlanningVisualizer
        n_rec = 4
        sim = MujocoExecutionEnv(robot, env=env)
        result = sim.run_trajectories(xs[:n_rec, :, :robot.q_dim],
                                      dt_plan=gp.dt)
        print(f"MuJoCo execution: {int(result.contact.sum())}/{n_rec} "
              f"rollouts reported contact")
        viz = PlanningVisualizer(task=task)
        out = viz.animate_execution(
            result.qpos_executed, contact=result.contact,
            contact_step=result.contact_step, video_filepath=args.record,
            anim_time=6.0)
        print(f"wrote execution video to {out}")
