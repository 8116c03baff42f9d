import jax.numpy as jnp
import numpy as np

from golden_utils import load_golden
from torch_robotics_tpu.robots import RobotPointMass
from torch_robotics_tpu.trajectory import (
    compute_path_length, compute_smoothness, compute_variance_waypoints,
    finite_difference_vector, interpolate_traj_via_points, smoothen_trajectory,
)


def robot():
    return RobotPointMass.create()


def test_interpolate_traj_via_points_golden():
    g = load_golden("trajectory_metrics")
    out = interpolate_traj_via_points(jnp.asarray(g["trajs"]), 3)
    np.testing.assert_allclose(out, g["interp_3"], atol=1e-6)


def test_finite_difference_golden():
    g = load_golden("trajectory_metrics")
    trajs = jnp.asarray(g["trajs"])
    np.testing.assert_allclose(
        finite_difference_vector(trajs, dt=0.1, method="forward"),
        g["fd_forward"], atol=1e-5)
    np.testing.assert_allclose(
        finite_difference_vector(trajs, dt=0.1, method="central"),
        g["fd_central"], atol=1e-5)


def test_metrics_golden():
    g = load_golden("trajectory_metrics")
    trajs = jnp.asarray(g["trajs"])
    r = robot()
    np.testing.assert_allclose(compute_path_length(trajs, r),
                               g["path_length"], atol=1e-5)
    np.testing.assert_allclose(compute_smoothness(trajs, r),
                               g["smoothness"], atol=1e-5)
    np.testing.assert_allclose(compute_variance_waypoints(trajs, r),
                               g["variance_waypoints"], rtol=1e-4)


def test_smoothen_trajectory_endpoints():
    path = jnp.array([[0.0, 0.0], [0.4, 0.6], [1.0, 0.2], [1.5, 1.0]])
    pos, vel = smoothen_trajectory(path, n_support_points=20, dt=0.02,
                                   set_average_velocity=False,
                                   zero_velocity=False)
    assert pos.shape == (20, 2)
    np.testing.assert_allclose(pos[0], path[0], atol=1e-5)
    np.testing.assert_allclose(pos[-1], path[-1], atol=1e-5)
    # clamped BCs: zero velocity at the ends
    np.testing.assert_allclose(vel[0], np.zeros(2), atol=1e-4)
    np.testing.assert_allclose(vel[-1], np.zeros(2), atol=1e-4)


def test_smoothen_trajectory_matches_scipy():
    from scipy import interpolate as sci
    path = np.array([[0.0, 0.0], [0.4, 0.6], [1.0, 0.2], [1.5, 1.0],
                     [2.0, 0.0]], np.float64)
    spline = sci.make_interp_spline(np.linspace(0, 1, len(path)), path, k=3,
                                    bc_type="clamped")
    t = np.linspace(0, 1, 16)
    expected = spline(t)
    pos, _ = smoothen_trajectory(jnp.asarray(path, jnp.float32),
                                 n_support_points=16, zero_velocity=True,
                                 set_average_velocity=False)
    np.testing.assert_allclose(pos, expected, atol=1e-4)
