"""GPMP2 trajectory optimization: PointMass 2D in EnvDense2D, with plots.

The minimum end-to-end slice (SURVEY.md §7): batched GPMP2 solve of B
trajectories, collision/free split, metrics, rendering.
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from torch_robotics_tpu.envs import EnvDense2D
from torch_robotics_tpu.robots import RobotPointMass
from torch_robotics_tpu.solve import GPMP2Params, gpmp2_init_trajs, gpmp2_solve
from torch_robotics_tpu.tasks import PlanningTask
from torch_robotics_tpu.trajectory import compute_path_length, compute_smoothness

if __name__ == "__main__":
    env = EnvDense2D()
    robot = RobotPointMass.create()
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.02)
    params = GPMP2Params.from_preset(env.get_gpmp2_params(robot))

    start = jnp.array([-0.9, -0.9, 0.0, 0.0])
    goal = jnp.array([0.9, 0.9, 0.0, 0.0])
    theta0 = gpmp2_init_trajs(jax.random.PRNGKey(2), params, start, goal)
    result = gpmp2_solve(task.collision_residuals, theta0, start, goal, params)

    frac_free = task.compute_fraction_free_trajs(result.trajs)
    print(f"solved {result.trajs.shape[0]} trajectories, "
          f"{frac_free * 100:.0f}% collision-free")
    print("path length (mean):",
          float(compute_path_length(result.trajs, robot).mean()))
    print("smoothness (mean):",
          float(compute_smoothness(result.trajs, robot).mean()))

    try:
        import matplotlib
        matplotlib.use("Agg")
        from torch_robotics_tpu.viz import PlanningVisualizer
        viz = PlanningVisualizer(task=task)
        fig, ax = viz.render_robot_trajectories(
            trajs=result.trajs, start_state=start[:2], goal_state=goal[:2])
        fig.savefig("planning_point_mass.png", dpi=120)
        print("saved planning_point_mass.png")
    except Exception as e:
        print("plotting skipped:", e)
