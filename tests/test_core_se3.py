import jax
import jax.numpy as jnp
import numpy as np

from torch_robotics_tpu.core import (
    SE3_distance, acos_linear_extrapolation, axis_angle_rotation,
    exp_map_so3, invert_transform, link_pos_from_link_tensor, log_SO3,
    multiply_transform, pack_homogeneous, rotate_point, rpy_to_rotation_matrix,
    skew_symm_matrix_to_vec, so3_relative_angle, transform_point,
    unpack_homogeneous, vector3_to_skew_symm_matrix, x_rot, y_rot, z_rot,
)


def test_axis_rotations_match_closed_form():
    a = jnp.array(0.3)
    c, s = np.cos(0.3), np.sin(0.3)
    np.testing.assert_allclose(
        x_rot(a), [[1, 0, 0], [0, c, -s], [0, s, c]], atol=1e-6)
    np.testing.assert_allclose(
        y_rot(a), [[c, 0, s], [0, 1, 0], [-s, 0, c]], atol=1e-6)
    np.testing.assert_allclose(
        z_rot(a), [[c, -s, 0], [s, c, 0], [0, 0, 1]], atol=1e-6)


def test_axis_rotations_batched():
    a = jnp.linspace(0.0, 1.0, 5)
    R = z_rot(a)
    assert R.shape == (5, 3, 3)
    np.testing.assert_allclose(R[2], z_rot(a[2]), atol=1e-6)


def test_axis_angle_rotation_matches_axis_aligned():
    angles = jnp.linspace(-2.0, 2.0, 7)
    for axis_vec, rot_fn in [((1, 0, 0), x_rot), ((0, 1, 0), y_rot), ((0, 0, 1), z_rot)]:
        axis = jnp.array(axis_vec, dtype=jnp.float32)
        R = axis_angle_rotation(axis, angles)
        np.testing.assert_allclose(R, rot_fn(angles), atol=1e-5)
        # negative axis = negative angle
        R_neg = axis_angle_rotation(-axis, angles)
        np.testing.assert_allclose(R_neg, rot_fn(-angles), atol=1e-5)


def test_rpy_rotation_order():
    rpy = jnp.array([0.1, -0.2, 0.3])
    expected = z_rot(rpy[2]) @ y_rot(rpy[1]) @ x_rot(rpy[0])
    np.testing.assert_allclose(rpy_to_rotation_matrix(rpy), expected, atol=1e-6)


def test_multiply_and_invert_transform():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    R1 = z_rot(jax.random.uniform(k1, (8,)))
    t1 = jax.random.normal(k2, (8, 3))
    R_inv, t_inv = invert_transform(R1, t1)
    R_id, t_id = multiply_transform(R1, t1, R_inv, t_inv)
    np.testing.assert_allclose(R_id, jnp.tile(jnp.eye(3), (8, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(t_id, np.zeros((8, 3)), atol=1e-5)
    # composition matches 4x4 matmul
    R2 = x_rot(jax.random.uniform(k3, (8,)))
    t2 = jnp.ones((8, 3))
    Rc, tc = multiply_transform(R1, t1, R2, t2)
    H = pack_homogeneous(R1, t1) @ pack_homogeneous(R2, t2)
    np.testing.assert_allclose(Rc, H[..., :3, :3], atol=1e-5)
    np.testing.assert_allclose(tc, H[..., :3, 3], atol=1e-5)


def test_pack_unpack_homogeneous():
    R = y_rot(jnp.array([0.5, 1.0]))
    t = jnp.array([[1.0, 2, 3], [4, 5, 6]])
    H = pack_homogeneous(R, t)
    assert H.shape == (2, 4, 4)
    R2, t2 = unpack_homogeneous(H)
    np.testing.assert_allclose(R2, R)
    np.testing.assert_allclose(t2, t)
    np.testing.assert_allclose(H[:, 3], np.tile([0, 0, 0, 1.0], (2, 1)))


def test_transform_point():
    R = z_rot(jnp.array(np.pi / 2))
    t = jnp.array([1.0, 0.0, 0.0])
    p = jnp.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(transform_point(p, R, t), [1.0, 1.0, 0.0], atol=1e-6)
    # batched points
    pts = jnp.array([[1.0, 0, 0], [0, 1.0, 0]])
    out = transform_point(pts, R, t)
    np.testing.assert_allclose(out, [[1, 1, 0], [0, 0, 0]], atol=1e-6)


def test_skew_round_trip():
    v = jnp.array([[1.0, -2.0, 3.0]])
    S = vector3_to_skew_symm_matrix(v)
    np.testing.assert_allclose(S + jnp.swapaxes(S, -1, -2), np.zeros((1, 3, 3)))
    np.testing.assert_allclose(skew_symm_matrix_to_vec(S), v)
    # Sx = v cross x
    x = jnp.array([0.5, 0.5, 0.5])
    np.testing.assert_allclose((S[0] @ x), np.cross(np.array(v[0]), np.array(x)),
                               atol=1e-6)


def test_acos_linear_extrapolation():
    x = jnp.linspace(-1.2, 1.2, 101)
    y = acos_linear_extrapolation(x)
    assert jnp.all(jnp.isfinite(y))
    inner = jnp.abs(x) < 0.9
    np.testing.assert_allclose(
        np.asarray(y)[np.asarray(inner)],
        np.arccos(np.asarray(x)[np.asarray(inner)]), atol=1e-5)
    # monotonically decreasing
    assert np.all(np.diff(np.asarray(y)) < 0)
    # gradient finite everywhere, including past the bounds
    g = jax.vmap(jax.grad(acos_linear_extrapolation))(x)
    assert jnp.all(jnp.isfinite(g))


def test_so3_relative_angle():
    R1 = z_rot(jnp.array(0.5))
    R2 = z_rot(jnp.array(0.1))
    np.testing.assert_allclose(so3_relative_angle(R1, R2), 0.4, atol=1e-5)
    np.testing.assert_allclose(
        so3_relative_angle(R1, R2, cos_angle=True), np.cos(0.4), atol=1e-5)


def test_SE3_distance():
    H1 = pack_homogeneous(z_rot(jnp.array(0.0)), jnp.array([0.0, 0, 0]))
    H2 = pack_homogeneous(z_rot(jnp.array(np.pi / 2)), jnp.array([3.0, 4.0, 0]))
    d = SE3_distance(H1, H2, w_pos=1.0, w_rot=1.0)
    # pos distance 5, rot distance 1 - cos(pi/2) = 1
    np.testing.assert_allclose(d, 6.0, atol=1e-5)
    d_pos = SE3_distance(H1, H2, w_pos=1.0, w_rot=0.0)
    np.testing.assert_allclose(d_pos, 5.0, atol=1e-5)


def test_log_exp_so3_round_trip():
    omega = jnp.array([[0.1, 0.2, -0.3], [0.0, 0.0, 1.0]])
    R = exp_map_so3(omega)
    vec = skew_symm_matrix_to_vec(log_SO3(R))
    np.testing.assert_allclose(vec, omega, atol=1e-4)


def test_link_pos_extraction():
    H = pack_homogeneous(jnp.eye(3), jnp.array([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(link_pos_from_link_tensor(H), [1.0, 2.0, 3.0])
