import jax
import jax.numpy as jnp
import numpy as np

from torch_robotics_tpu.core import Frame, MotionVec
from torch_robotics_tpu.core.manifold import (Gaussian, Manifold,
                                              kl_divergence_mvn)
from torch_robotics_tpu.core import z_rot


def test_frame_identity_and_compose():
    f = Frame.identity((4,))
    np.testing.assert_allclose(f.get_transform_matrix(),
                               np.tile(np.eye(4), (4, 1, 1)))
    g = Frame(z_rot(jnp.full((4,), 0.5)), jnp.ones((4, 3)))
    gi = g.inverse()
    prod = g.multiply_transform(gi)
    np.testing.assert_allclose(prod.rot, np.tile(np.eye(3), (4, 1, 1)),
                               atol=1e-6)
    np.testing.assert_allclose(prod.trans, np.zeros((4, 3)), atol=1e-6)


def test_frame_quaternion_xyzw_convention():
    f = Frame.identity()
    q = f.get_quaternion()           # xyzw by default like the reference
    np.testing.assert_allclose(q, [0, 0, 0, 1.0], atol=1e-6)
    np.testing.assert_allclose(f.get_quaternion(wxyz=True), [1.0, 0, 0, 0],
                               atol=1e-6)


def test_frame_from_pose_and_transform_point():
    pose = jnp.array([1.0, 2.0, 3.0, 1.0, 0.0, 0.0, 0.0])
    f = Frame.from_pose(pose)
    pts = jnp.array([[1.0, 0.0, 0.0]])
    np.testing.assert_allclose(f.transform_point(pts), [[2.0, 2.0, 3.0]],
                               atol=1e-6)


def test_motion_vec_transform():
    mv = MotionVec(jnp.array([1.0, 0, 0]), jnp.array([0.0, 0, 1.0]))
    f = Frame(z_rot(jnp.array(np.pi / 2)), jnp.array([0.0, 0.0, 0.0]))
    out = mv.transform(f)
    np.testing.assert_allclose(out.ang, [0, 0, 1.0], atol=1e-6)
    np.testing.assert_allclose(out.lin, [0, 1.0, 0], atol=1e-6)


def test_manifold_product_log_exp():
    M = Manifold.euclidean(2).cartesian_product(Manifold.sphere_S3())
    assert M.dim_M == 6 and M.dim_T == 5
    x = jnp.concatenate([jnp.array([0.5, -0.5]),
                         jnp.array([1.0, 0.0, 0.0, 0.0])])
    v = M.log_map(x)
    x_back = M.exp_map(v)
    np.testing.assert_allclose(x_back, x, atol=1e-5)


def test_karcher_mean_euclidean():
    M = Manifold.euclidean(3)
    pts = jnp.asarray(np.random.RandomState(0).randn(10, 3), jnp.float32)
    mu = M.mean(pts)
    np.testing.assert_allclose(mu, pts.mean(axis=0), atol=1e-4)


def test_gaussian_pdf_and_kl():
    M = Manifold.euclidean(2)
    g1 = Gaussian(M, jnp.zeros(2), jnp.eye(2))
    g2 = Gaussian(M, jnp.zeros(2), jnp.eye(2))
    np.testing.assert_allclose(kl_divergence_mvn(g1, g2), 0.0, atol=1e-6)
    # standard normal pdf at origin
    np.testing.assert_allclose(g1.pdf(jnp.zeros(2)), 1 / (2 * np.pi),
                               atol=1e-6)
    samples = g1.sample(jax.random.PRNGKey(0), 2000)
    np.testing.assert_allclose(samples.mean(axis=0), [0, 0], atol=0.1)


def test_skeleton():
    from torch_robotics_tpu.kin import get_skeleton_from_model, robot_zoo
    model = robot_zoo.franka_panda()
    sk = get_skeleton_from_model(model, jnp.zeros(7))
    assert len(sk.edges) == model.n_links - 1
    D = sk.compute_self_distance()
    assert D.shape == (model.n_links, model.n_links)
    np.testing.assert_allclose(np.diag(D), 0.0, atol=1e-6)
    lengths = sk.link_lengths()
    assert all(v >= 0 for v in lengths.values())
