import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_robotics_tpu.ops.pallas_sdf import (sphere_sdf_pallas,
                                               sphere_sdf_reference)


@pytest.mark.parametrize("M,S", [(100, 10), (512, 128), (1000, 300)])
def test_pallas_sphere_sdf_interpret_matches_reference(M, S):
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    points = jax.random.uniform(k1, (M, 3), minval=-1, maxval=1)
    centers = jax.random.uniform(k2, (S, 3), minval=-1, maxval=1)
    radii = jax.random.uniform(k3, (S,), minval=0.05, maxval=0.3)
    ref = sphere_sdf_reference(points, centers, radii)
    out = sphere_sdf_pallas(points, centers, radii, interpret=True)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_point_cloud_spheres_cpu_fallback():
    from torch_robotics_tpu.geom import PointCloudSpheres
    key = jax.random.PRNGKey(1)
    centers = jax.random.uniform(key, (400, 3), minval=-1, maxval=1)
    cloud = PointCloudSpheres.create(centers, radius=0.05)
    x = jnp.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    sdf = cloud.signed_distance(x)
    ref = sphere_sdf_reference(x, centers, cloud.radii)
    np.testing.assert_allclose(sdf, ref, atol=1e-5)
    # batched leading dims
    sdf_b = cloud.signed_distance(x.reshape(2, 1, 3))
    np.testing.assert_allclose(sdf_b.reshape(-1), ref, atol=1e-5)
