import jax
import jax.numpy as jnp
import numpy as np

from torch_robotics_tpu.core.manifold import Manifold
from torch_robotics_tpu.kin import fk_rot_trans, fk_with_velocities, robot_zoo
from torch_robotics_tpu.trajectory.manifold_ops import (
    compute_traj_derivatives, compute_traj_velocity, smooth_traj)


def test_fk_with_velocities_matches_fk_and_fd():
    model = robot_zoo.franka_panda()
    q = jnp.array([0.1, -0.4, 0.3, -1.2, 0.5, 1.0, 0.2])
    qd = jnp.array([0.5, -0.2, 0.1, 0.3, -0.4, 0.2, 0.6])
    R, t, lin, ang = fk_with_velocities(model, q, qd)
    R0, t0 = fk_rot_trans(model, q)
    np.testing.assert_allclose(R, R0, atol=1e-6)
    np.testing.assert_allclose(t, t0, atol=1e-6)
    # zero joint velocity -> zero body velocities
    _, _, lin0, ang0 = fk_with_velocities(model, q, jnp.zeros(7))
    np.testing.assert_allclose(lin0, np.zeros_like(lin0), atol=1e-7)
    np.testing.assert_allclose(ang0, np.zeros_like(ang0), atol=1e-7)
    # world-frame EE linear velocity (R_ee @ v_local) matches d(t_ee)/dt
    eps = 1e-4
    _, t_p = fk_rot_trans(model, q + eps * qd)
    _, t_m = fk_rot_trans(model, q - eps * qd)
    v_world_fd = (t_p - t_m) / (2 * eps)
    v_world = jnp.einsum("lij,lj->li", R, lin)
    np.testing.assert_allclose(v_world, v_world_fd, atol=1e-2)


def test_manifold_traj_velocity_euclidean():
    M = Manifold.euclidean(2)
    traj = jnp.stack([jnp.linspace(0, 1, 11),
                      jnp.linspace(0, 2, 11)], axis=-1)
    vel = compute_traj_velocity(traj, dt=0.1, manifold=M)
    np.testing.assert_allclose(vel[:-1], np.tile([1.0, 2.0], (10, 1)),
                               atol=1e-5)
    pos, v, a = compute_traj_derivatives(traj, 0.1, M)
    np.testing.assert_allclose(a[:-2], np.zeros((9, 2)), atol=1e-4)


def test_manifold_smooth_traj_quaternion():
    from torch_robotics_tpu.core.quaternion import q_exp_map
    M = Manifold.sphere_S3()
    angles = jnp.linspace(0.0, 1.0, 9)
    noise = 0.05 * ((-1.0) ** jnp.arange(9))  # max-frequency jitter
    quats = q_exp_map((angles + noise)[:, None]
                      * jnp.array([0.0, 0.0, 1.0]))
    sm = smooth_traj(quats, M, window=5)
    # still unit quaternions, endpoints preserved
    np.testing.assert_allclose(jnp.linalg.norm(sm, axis=-1),
                               np.ones(9), atol=1e-5)
    np.testing.assert_allclose(sm[0], quats[0], atol=1e-6)
    np.testing.assert_allclose(sm[-1], quats[-1], atol=1e-6)
    # smoother than the input (smaller second differences in tangent space)
    def roughness(q):
        v = M.log_map(q[1:], base=q[:-1])
        return float(jnp.sum(jnp.square(jnp.diff(v, axis=0))))
    assert roughness(sm) < roughness(quats)
