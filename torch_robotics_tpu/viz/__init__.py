from .planning_visualizer import PlanningVisualizer, create_fig_and_axes
from .plot_utils import plot_coordinate_frame
from .render_env import render_env, render_env_grad_sdf, render_env_sdf
from .render_robot import render_robot, render_robot_trajectories
