import matplotlib

matplotlib.use("Agg")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_robotics_tpu.envs import EnvDense2D, EnvSpheres3D
from torch_robotics_tpu.robots import RobotPanda, RobotPointMass
from torch_robotics_tpu.tasks import PlanningTask
from torch_robotics_tpu.viz import (PlanningVisualizer, create_fig_and_axes,
                                    plot_coordinate_frame, render_env,
                                    render_env_sdf, render_robot)


def test_render_env_2d():
    env = EnvDense2D()
    fig, ax = create_fig_and_axes(2)
    render_env(env, ax)
    render_env_sdf(env, ax, fig, steps=50)
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_visualizer_point_mass(tmp_path):
    env = EnvDense2D()
    robot = RobotPointMass.create()
    task = PlanningTask(env=env, robot=robot)
    viz = PlanningVisualizer(task=task)
    trajs = jnp.tile(jnp.linspace(jnp.array([-0.9, -0.9]),
                                  jnp.array([0.9, 0.9]), 8)[None], (2, 1, 1))
    fig, ax = viz.render_robot_trajectories(
        trajs=trajs, start_state=trajs[0, 0], goal_state=trajs[0, -1])
    out = tmp_path / "trajs.png"
    fig.savefig(out)
    assert out.stat().st_size > 0
    fig2, _ = viz.plot_joint_space_state_trajectories(trajs=trajs)
    import matplotlib.pyplot as plt
    plt.close("all")


def test_visualizer_animation(tmp_path):
    env = EnvDense2D()
    robot = RobotPointMass.create()
    task = PlanningTask(env=env, robot=robot)
    viz = PlanningVisualizer(task=task)
    trajs = jnp.tile(jnp.linspace(jnp.array([-0.9, -0.9]),
                                  jnp.array([0.9, 0.9]), 5)[None], (1, 1, 1))
    path = viz.animate_robot_trajectories(
        trajs=trajs, video_filepath=str(tmp_path / "anim.gif"), n_frames=3,
        anim_time=1.0)
    assert (tmp_path / "anim.gif").exists()


def test_animate_execution(tmp_path):
    """Executed-trajectory recording with collision-sphere debug draw
    (the reference's sim camera + viewer overlay role,
    motion_planning_envs.py:111-173, 578-621)."""
    env = EnvSpheres3D()
    robot = RobotPanda.create()
    task = PlanningTask(env=env, robot=robot)
    viz = PlanningVisualizer(task=task)
    qpos = jnp.tile(jnp.linspace(jnp.zeros(7), 0.3 * jnp.ones(7), 3)[None],
                    (2, 1, 1))
    out = viz.animate_execution(
        qpos, contact=np.array([False, True]),
        contact_step=np.array([-1, 1]),
        video_filepath=str(tmp_path / "exec.gif"), anim_time=1.0)
    assert (tmp_path / "exec.gif").exists()


def test_occupancy_map_plot(tmp_path):
    from torch_robotics_tpu.geom import build_occupancy_map
    env = EnvDense2D()
    occ = build_occupancy_map(env.limits, 0.05, env.obj_fixed_list)
    ax = occ.plot(save_path=str(tmp_path / "occ.png"))
    assert (tmp_path / "occ.png").stat().st_size > 0
    import matplotlib.pyplot as plt
    plt.close("all")


def test_render_panda_3d():
    env = EnvSpheres3D()
    robot = RobotPanda.create()
    fig, ax = create_fig_and_axes(3)
    render_env(env, ax)
    render_robot(robot, ax, q=jnp.zeros(7))
    plot_coordinate_frame(ax, np.eye(3), np.zeros(3))
    import matplotlib.pyplot as plt
    plt.close(fig)
