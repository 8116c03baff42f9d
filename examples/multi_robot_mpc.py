"""Multi-robot MPC: two Pandas + a UR10 sharing one workspace.

Beyond-reference capability (the reference wraps single robots only):
`MultiRobot` composes embodiments with per-member base poses and adds
mutual-collision pairs between every pair of members, so the coupled
q_dim=20 system is optimized jointly — each arm avoids the environment
AND the other arms.
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from torch_robotics_tpu.core import z_rot
from torch_robotics_tpu.envs import EnvSpheres3D
from torch_robotics_tpu.robots import MultiRobot, RobotPanda, RobotUR10
from torch_robotics_tpu.solve import GPMP2Params
from torch_robotics_tpu.solve.mpc import MPCParams, mpc_rollout
from torch_robotics_tpu.tasks import PlanningTask

if __name__ == "__main__":
    robots = [RobotPanda.create(), RobotPanda.create(), RobotUR10()]
    # base poses clear of the EnvSpheres3D obstacles: the spheres at
    # (0, +-0.3..0.45, *) would permanently intersect base-adjacent links
    # of arms mounted at +-0.45
    poses = [(jnp.eye(3), jnp.array([0.2, 0.72, 0.0])),
             (z_rot(jnp.array(jnp.pi)), jnp.array([0.2, -0.72, 0.0])),
             (jnp.eye(3), jnp.array([-0.75, 0.0, 0.0]))]
    robot = MultiRobot.create(robots, poses)
    task = PlanningTask(env=EnvSpheres3D(), robot=robot,
                        obstacle_cutoff_margin=0.02)
    d = robot.q_dim
    print(f"{len(robots)} arms, q_dim={d}, "
          f"{len(robot.self_pair_idxs)} mutual/self collision pairs")

    B = 16
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    # collision-free joint start/goal configurations (environment + the
    # OTHER arms: the mutual pairs are part of the collision model)
    # the joint 20-dof free space is a ~0.2% sliver of the limit box, so the
    # rejection budget is large — 128k collision checks take ~ms on the
    # lanes FK path
    q0, n1 = task.random_coll_free_q(k1, n_samples=B, max_samples=131072)
    qg, n2 = task.random_coll_free_q(k2, n_samples=B, max_samples=131072)
    print(f"sampled {int(n1)}/{B} starts, {int(n2)}/{B} goals collision-free")
    start = jnp.concatenate([q0, jnp.zeros_like(q0)], -1)
    goal = jnp.concatenate([qg, jnp.zeros_like(qg)], -1)

    gp = GPMP2Params(n_support_points=32, dt=0.05, sigma_start=1e-3,
                     sigma_gp=1e-1, sigma_goal_prior=1e-3, sigma_coll=1e-3,
                     step_size=0.7)
    params = MPCParams(gpmp2=gp, iters_per_step=2)
    xs, info = mpc_rollout(task.collision_residuals, start, goal, params,
                           n_steps=150)
    d0 = float(jnp.linalg.norm(q0 - qg, axis=-1).mean())
    dist = info["dist_to_goal"][-1]
    print(f"mean distance to goal {d0:.2f} -> {float(dist.mean()):.3f} rad "
          f"(20-dof joint norm), {int((dist < 0.3).sum())}/{B} within 0.3 rad")

    coll = task.compute_collision(xs, margin=0.0)
    frac = float(jnp.mean(jnp.any(coll, axis=-1)))
    print(f"{(1 - frac) * 100:.0f}% of executed rollouts contact-free "
          f"(environment + inter-arm)")
