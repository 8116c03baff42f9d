"""Quaternion algebra (wxyz convention), fully batched and branchless.

TPU-native re-design of the reference quaternion library
(/root/reference/torch_robotics/torch_kinematics_tree/geometrics/quaternion.py):
every op is a pure function on jnp arrays with ``...``-style batch dims, no
data-dependent Python control flow, so everything vmaps/jits cleanly.

Convention: q = [w, x, y, z] (Hamilton).  xyzw variants are provided for
interop (e.g. physics engines that use xyzw).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "q_exp_map", "q_log_map", "q_mul", "q_inverse", "q_div", "q_norm_squared",
    "q_to_rotation_matrix", "q_to_quaternion_matrix", "rotation_matrix_to_q",
    "q_to_axis_angles", "axis_angles_to_q", "q_to_euler", "euler_to_q",
    "q_convert_xyzw", "q_convert_wxyz", "q_parallel_transport",
]


def _sqrt_positive(x):
    """sqrt(max(x, 0)) with a zero (not NaN) gradient at x <= 0."""
    safe = jnp.where(x > 0.0, x, 1.0)
    return jnp.where(x > 0.0, jnp.sqrt(safe), 0.0)


def q_exp_map(v, base=None):
    """Exponential map R^3 -> S^3 at ``base`` (identity if None).

    Mirrors reference ``q_exp_map`` (quaternion.py:23-38): for ||v|| = 0 the
    identity quaternion is returned.
    v: (..., 3) tangent vector.  Returns (..., 4) wxyz.
    """
    v = jnp.asarray(v)
    norm_v = jnp.linalg.norm(v, axis=-1, keepdims=True)
    safe_norm = jnp.where(norm_v > 0.0, norm_v, 1.0)
    sinc = jnp.where(norm_v > 0.0, jnp.sin(safe_norm) / safe_norm, 0.0)
    w = jnp.where(norm_v[..., 0] > 0.0, jnp.cos(norm_v[..., 0]), 1.0)
    q = jnp.concatenate([w[..., None], sinc * v], axis=-1)
    if base is None:
        return q
    return q_mul(jnp.asarray(base), q)


def q_log_map(q, base=None):
    """Log map S^3 -> R^3 at ``base`` (identity if None).

    Mirrors reference ``q_log_map`` (quaternion.py:41-57) including the
    double-cover handling: if w < 0 the angle is shifted by -pi so q and -q
    map to the same tangent vector.
    """
    q = jnp.asarray(q)
    if base is not None:
        return q_log_map(q_mul(q_inverse(jnp.asarray(base)), q))
    vec = q[..., 1:]
    w = q[..., 0]
    norm_vec = jnp.linalg.norm(vec, axis=-1)
    # non-singular where the vector part is nonzero and |w| <= 1
    valid = (norm_vec > 0.0) & (jnp.abs(w) <= 1.0)
    acos = jnp.arccos(jnp.clip(w, -1.0, 1.0))
    acos = jnp.where(w < 0.0, acos - jnp.pi, acos)
    safe_norm = jnp.where(valid, norm_vec, 1.0)
    scale = jnp.where(valid, acos / safe_norm, 0.0)
    return vec * scale[..., None]


def q_mul(q1, q2):
    """Hamilton product, (..., 4) x (..., 4) -> (..., 4)."""
    w1, x1, y1, z1 = jnp.moveaxis(jnp.asarray(q1), -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(jnp.asarray(q2), -1, 0)
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def q_norm_squared(q):
    return jnp.sum(jnp.square(q), axis=-1, keepdims=True)


def q_inverse(q):
    q = jnp.asarray(q)
    scaling = jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)
    return q * scaling / q_norm_squared(q)


def q_div(q1, q2):
    return q_mul(q1, q_inverse(q2))


def q_to_rotation_matrix(q):
    """wxyz quaternion -> (..., 3, 3) rotation matrix.

    Same normalization trick as the reference (quaternion.py:102-120):
    scale 2/(q.q) handles non-unit quaternions.
    """
    q = jnp.asarray(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    s = 2.0 / jnp.sum(jnp.square(q), axis=-1)
    o = jnp.stack([
        1.0 - s * (y * y + z * z), s * (x * y - z * w), s * (x * z + y * w),
        s * (x * y + z * w), 1.0 - s * (x * x + z * z), s * (y * z - x * w),
        s * (x * z - y * w), s * (y * z + x * w), 1.0 - s * (x * x + y * y),
    ], axis=-1)
    return o.reshape(q.shape[:-1] + (3, 3))


def q_to_quaternion_matrix(q):
    """Left-multiplication matrix Q(q1) with Q(q1) @ q2 = q_mul(q1, q2)."""
    w, x, y, z = jnp.moveaxis(jnp.asarray(q), -1, 0)
    o = jnp.stack([
        w, -x, -y, -z,
        x, w, -z, y,
        y, z, w, -x,
        z, -y, x, w,
    ], axis=-1)
    return o.reshape(jnp.shape(w) + (4, 4))


def rotation_matrix_to_q(rot_mat):
    """(..., 3, 3) rotation matrix -> wxyz quaternion.

    Branchless best-conditioned-candidate selection, mirroring the reference
    (quaternion.py:135-166): four candidate quaternions are formed and the one
    with the largest denominator is selected with a one-hot gather.
    """
    rot_mat = jnp.asarray(rot_mat)
    batch_dim = rot_mat.shape[:-2]
    m = rot_mat.reshape(batch_dim + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(m, -1, 0)
    q_abs = _sqrt_positive(jnp.stack([
        1.0 + m00 + m11 + m22,
        1.0 + m00 - m11 - m22,
        1.0 - m00 + m11 - m22,
        1.0 - m00 - m11 + m22,
    ], axis=-1))
    quat_by_wxyz = jnp.stack([
        jnp.stack([jnp.square(q_abs[..., 0]), m21 - m12, m02 - m20, m10 - m01], axis=-1),
        jnp.stack([m21 - m12, jnp.square(q_abs[..., 1]), m10 + m01, m02 + m20], axis=-1),
        jnp.stack([m02 - m20, m10 + m01, jnp.square(q_abs[..., 2]), m12 + m21], axis=-1),
        jnp.stack([m10 - m01, m20 + m02, m21 + m12, jnp.square(q_abs[..., 3])], axis=-1),
    ], axis=-2)
    flr = jnp.asarray(0.1, dtype=rot_mat.dtype)
    quat_candidates = quat_by_wxyz / (2.0 * jnp.maximum(q_abs[..., None], flr))
    best = jnp.argmax(q_abs, axis=-1)
    one_hot = best[..., None] == jnp.arange(4)
    return jnp.sum(jnp.where(one_hot[..., None], quat_candidates, 0.0), axis=-2)


def _sin_half_angle_over_angle(angles, eps=1e-10):
    """sin(theta/2)/theta, with Taylor expansion near 0 (0.5 - theta^2/48)."""
    small = jnp.abs(angles) < eps
    safe = jnp.where(small, 1.0, angles)
    return jnp.where(small, 0.5 - jnp.square(angles) / 48.0,
                     jnp.sin(safe / 2.0) / safe)


def q_to_axis_angles(q, eps=1e-10):
    q = jnp.asarray(q)
    norm_q = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    half_angles = jnp.arctan2(norm_q, q[..., :1])
    angles = 2.0 * half_angles
    return q[..., 1:] / _sin_half_angle_over_angle(angles, eps)


def axis_angles_to_q(axis_angles, eps=1e-10):
    axis_angles = jnp.asarray(axis_angles)
    angles = jnp.linalg.norm(axis_angles, axis=-1, keepdims=True)
    s = _sin_half_angle_over_angle(angles, eps)
    return jnp.concatenate([jnp.cos(angles / 2.0), axis_angles * s], axis=-1)


def q_to_euler(q):
    """wxyz quaternion -> [roll, pitch, yaw] (XYZ extrinsic)."""
    w, x, y, z = jnp.moveaxis(jnp.asarray(q), -1, 0)
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def euler_to_q(euler):
    roll, pitch, yaw = jnp.moveaxis(jnp.asarray(euler), -1, 0)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    return jnp.stack([
        cr * cp * cy + sr * sp * sy,
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy,
    ], axis=-1)


def q_convert_xyzw(q):
    w, x, y, z = jnp.moveaxis(jnp.asarray(q), -1, 0)
    return jnp.stack([x, y, z, w], axis=-1)


def q_convert_wxyz(q):
    x, y, z, w = jnp.moveaxis(jnp.asarray(q), -1, 0)
    return jnp.stack([w, x, y, z], axis=-1)


def q_parallel_transport(p_g, g, h, eps=1e-10):
    """Parallel transport of tangent vector p_g from T_g S^3 to T_h S^3.

    Branchless version of the reference (quaternion.py:60-80): when the
    geodesic distance between g and h is ~0 the input is returned unchanged.
    """
    p_g = jnp.asarray(p_g)
    g = jnp.asarray(g)
    h = jnp.asarray(h)
    dtype = p_g.dtype
    Q_g = q_to_quaternion_matrix(g)
    Q_h = q_to_quaternion_matrix(h)
    B = jnp.concatenate([jnp.zeros((1, 3), dtype), jnp.eye(3, dtype=dtype)], axis=0)
    log_g_h = q_log_map(h, base=g)
    m = jnp.linalg.norm(log_g_h, axis=-1)
    safe_m = jnp.where(m < eps, 1.0, m)
    u_vec = jnp.concatenate([jnp.zeros_like(log_g_h[..., :1]),
                             log_g_h / safe_m[..., None]], axis=-1)
    u = (Q_g @ u_vec[..., None])[..., 0]
    I4 = jnp.eye(4, dtype=dtype)
    R_g_h = (I4 - jnp.sin(m)[..., None, None] * _outer(g, u)
             + (jnp.cos(m) - 1.0)[..., None, None] * _outer(u, u))
    A = jnp.swapaxes(B, -1, -2) @ jnp.swapaxes(Q_h, -1, -2) @ R_g_h @ Q_g @ B
    res = (A @ p_g[..., None])[..., 0]
    return jnp.where((m < eps)[..., None], p_g, res)


def _outer(a, b):
    return a[..., :, None] * b[..., None, :]
