import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_robotics_tpu.core import (
    axis_angles_to_q, euler_to_q, q_convert_wxyz, q_convert_xyzw, q_div,
    q_exp_map, q_inverse, q_log_map, q_mul, q_to_axis_angles, q_to_euler,
    q_to_quaternion_matrix, q_to_rotation_matrix, rotation_matrix_to_q,
)


def random_unit_quats(key, n):
    q = jax.random.normal(key, (n, 4))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


@pytest.fixture
def quats():
    return random_unit_quats(jax.random.PRNGKey(0), 64)


def test_q_mul_identity(quats):
    identity = jnp.array([1.0, 0, 0, 0])
    np.testing.assert_allclose(q_mul(identity, quats), quats, atol=1e-6)
    np.testing.assert_allclose(q_mul(quats, identity), quats, atol=1e-6)


def test_q_inverse(quats):
    res = q_mul(quats, q_inverse(quats))
    expected = jnp.tile(jnp.array([1.0, 0, 0, 0]), (quats.shape[0], 1))
    np.testing.assert_allclose(res, expected, atol=1e-5)


def test_q_div(quats):
    np.testing.assert_allclose(
        q_div(quats, quats),
        jnp.tile(jnp.array([1.0, 0, 0, 0]), (quats.shape[0], 1)), atol=1e-5)


def test_quaternion_matrix_matches_mul(quats):
    q1 = quats[:32]
    q2 = quats[32:]
    via_matrix = (q_to_quaternion_matrix(q1) @ q2[..., None])[..., 0]
    np.testing.assert_allclose(via_matrix, q_mul(q1, q2), atol=1e-6)


def test_rotation_matrix_round_trip(quats):
    R = q_to_rotation_matrix(quats)
    # Proper rotations: orthogonal, det 1
    eye = jnp.tile(jnp.eye(3), (R.shape[0], 1, 1))
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(jnp.linalg.det(R), jnp.ones(R.shape[0]), atol=1e-5)
    q_back = rotation_matrix_to_q(R)
    # q and -q are the same rotation
    sign = jnp.sign(jnp.sum(q_back * quats, axis=-1, keepdims=True))
    np.testing.assert_allclose(q_back * sign, quats, atol=1e-4)


def test_known_rotation():
    # 90 deg about z: q = [cos45, 0, 0, sin45]
    q = jnp.array([np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)])
    R = q_to_rotation_matrix(q)
    expected = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_exp_log_round_trip():
    key = jax.random.PRNGKey(1)
    v = jax.random.normal(key, (32, 3)) * 0.5
    q = q_exp_map(v)
    np.testing.assert_allclose(jnp.linalg.norm(q, axis=-1), np.ones(32), atol=1e-5)
    v_back = q_log_map(q)
    np.testing.assert_allclose(v_back, v, atol=1e-4)


def test_exp_map_zero():
    q = q_exp_map(jnp.zeros((4, 3)))
    np.testing.assert_allclose(q, np.tile([1.0, 0, 0, 0], (4, 1)), atol=1e-7)


def test_log_map_identity():
    v = q_log_map(jnp.tile(jnp.array([1.0, 0, 0, 0]), (4, 1)))
    np.testing.assert_allclose(v, np.zeros((4, 3)), atol=1e-7)


def test_axis_angle_round_trip():
    key = jax.random.PRNGKey(2)
    aa = jax.random.normal(key, (32, 3))
    q = axis_angles_to_q(aa)
    aa_back = q_to_axis_angles(q)
    np.testing.assert_allclose(aa_back, aa, atol=1e-4)


def test_euler_round_trip():
    key = jax.random.PRNGKey(3)
    # restrict pitch to avoid gimbal ambiguity
    euler = jax.random.uniform(key, (32, 3), minval=-1.0, maxval=1.0)
    q = euler_to_q(euler)
    euler_back = q_to_euler(q)
    np.testing.assert_allclose(euler_back, euler, atol=1e-5)


def test_wxyz_xyzw_round_trip(quats):
    np.testing.assert_allclose(q_convert_wxyz(q_convert_xyzw(quats)), quats)


def test_jit_and_grad():
    q = random_unit_quats(jax.random.PRNGKey(4), 8)
    f = jax.jit(lambda q: jnp.sum(q_to_rotation_matrix(q)))
    g = jax.grad(lambda q: jnp.sum(q_to_rotation_matrix(q)))(q)
    assert jnp.all(jnp.isfinite(g))
    assert jnp.isfinite(f(q))


def test_rotation_matrix_to_q_grad_no_nan():
    # gradient through the branchless sqrt must not produce NaNs at identity
    R = jnp.tile(jnp.eye(3), (2, 1, 1))
    g = jax.grad(lambda R: jnp.sum(rotation_matrix_to_q(R)))(R)
    assert jnp.all(jnp.isfinite(g))
