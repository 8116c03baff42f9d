"""Parity-tail tests: interpolate_points_v2, occupancy compute_distances
internal occupied cells, skeleton posture sampling / landmark ingestion.

Reference semantics: distance_fields.py:73-82, occupancy_map.py:131-143,
skeleton.py:92-205.
"""
import jax
import jax.numpy as jnp
import numpy as np

from torch_robotics_tpu.costs.fields import interpolate_points_v2
from torch_robotics_tpu.geom.occupancy import OccupancyMap, build_occupancy_map
from torch_robotics_tpu.geom.sdf import ObjectField, Spheres
from torch_robotics_tpu.kin.skeleton import (Skeleton,
                                             get_skeleton_from_landmarks,
                                             get_skeleton_from_model)


def _interp_v2_numpy(points, num_interpolate, rng):
    """Direct numpy transcription of the reference semantics
    (distance_fields.py:73-82)."""
    lo, hi = rng
    alpha = np.linspace(0, 1, num_interpolate + 2)[1:num_interpolate + 1]
    X = points[..., lo:hi + 1, :][..., :, None, :]
    X_diff = np.diff(X, axis=-3)
    X_interp = X[..., :-1, :, :] + X_diff * alpha[:, None]
    flat = X_interp.reshape(points.shape[:-2] + (-1, points.shape[-1]))
    return np.concatenate([points, flat], axis=-2)


def test_interpolate_points_v2_matches_reference_semantics():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(4, 6, 3)).astype(np.float32)
    got = interpolate_points_v2(jnp.asarray(pts), 3, (1, 4))
    want = _interp_v2_numpy(pts, 3, (1, 4))
    assert got.shape == want.shape == (4, 6 + 3 * 3, 3)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
    # num_interpolate=0 is the identity (distance_fields.py:74)
    same = interpolate_points_v2(jnp.asarray(pts), 0, (0, 5))
    np.testing.assert_array_equal(np.asarray(same), pts)


def test_occupancy_compute_distances_internal_occupied_cells():
    obj = ObjectField.create(
        [Spheres(centers=jnp.asarray([[0.3, 0.0]]),
                 radii=jnp.asarray([0.2]))])
    occ = build_occupancy_map(np.array([[-1.0, -1.0], [1.0, 1.0]]), 0.05,
                              [obj])
    x = jnp.asarray([[0.0, 0.0], [0.9, 0.9]], jnp.float32)
    d_auto = occ.compute_distances(x)
    d_explicit = occ.compute_distances(
        x, jnp.asarray(occ.occupied_points(), jnp.float32))
    assert d_auto.shape == d_explicit.shape
    np.testing.assert_allclose(np.asarray(d_auto), np.asarray(d_explicit),
                               atol=1e-6)
    # the origin is 0.1 from the sphere edge: min distance to an occupied
    # cell center is within a cell diagonal of that
    assert abs(float(jnp.min(d_auto[0])) - 0.1) < 0.08


def test_skeleton_sample_posture_statistics():
    from torch_robotics_tpu.kin import robot_zoo
    model = robot_zoo.planar_2_link()
    sk = get_skeleton_from_model(model, np.zeros(model.n_dofs))
    samples = sk.sample_posture(jax.random.PRNGKey(0), 4096)
    assert samples.shape == (4096, len(sk.link_names), 3)
    mean = np.asarray(jnp.mean(samples, axis=0))
    np.testing.assert_allclose(mean, sk.positions, atol=0.01)
    std = np.asarray(jnp.std(samples, axis=0))
    np.testing.assert_allclose(std, np.sqrt(1e-3), atol=0.01)


class _Landmark:
    def __init__(self, x, y, z, visibility=1.0):
        self.x, self.y, self.z = x, y, z
        self.visibility = visibility


def test_skeleton_from_landmarks():
    lms = [_Landmark(0.1, 0.2, 0.3),
           _Landmark(0.2, 0.3, 0.4),
           _Landmark(0.5, 0.5, 0.5, visibility=0.1),   # filtered out
           _Landmark(0.0, 0.1, 0.6)]
    sk = get_skeleton_from_landmarks(lms, [(0, 1), (1, 2), (1, 3)])
    assert isinstance(sk, Skeleton)
    assert sk.link_names == ["0", "1", "3"]
    # camera -> robot frame remap (z, -x, -y) (skeleton.py:172-175)
    np.testing.assert_allclose(sk.positions[0], [0.3, -0.1, -0.2])
    # edge (1,2) dropped (landmark 2 invisible); (0,1) and (1,3) kept
    assert sk.parent_idx == [-1, 0, 1]
    # all landmarks filtered -> None
    assert get_skeleton_from_landmarks(
        [_Landmark(0, 0, 0, visibility=0.0)], []) is None
