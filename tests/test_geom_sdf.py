import jax
import jax.numpy as jnp
import numpy as np

from golden_utils import load_golden
from torch_robotics_tpu.geom import (
    GridSDF, MultiBoxField, MultiSharpBoxField, MultiSphereField, ObjectField,
    build_occupancy_map, precompute_sdf_grid,
)


def test_sphere_sdf_closed_form():
    s = MultiSphereField(np.array([[0.0, 0.0]]), np.array([0.5]))
    x = jnp.array([[1.0, 0.0], [0.0, 0.0], [0.25, 0.0]])
    np.testing.assert_allclose(s.signed_distance(x), [0.5, -0.5, -0.25], atol=1e-6)


def test_sphere_sdf_min_over_spheres():
    s = MultiSphereField(np.array([[0.0, 0.0], [2.0, 0.0]]), np.array([0.5, 1.0]))
    x = jnp.array([[1.2, 0.0]])
    np.testing.assert_allclose(s.signed_distance(x), [-0.2], atol=1e-6)


def test_sharp_box_sdf_closed_form():
    b = MultiSharpBoxField(np.array([[0.0, 0.0]]), np.array([[1.0, 2.0]]))
    # inside center: max(|x|-h) = max(-0.5, -1) = -0.5
    x = jnp.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.5]])
    np.testing.assert_allclose(b.signed_distance(x), [-0.5, 0.5, 0.5], atol=1e-6)


def test_primitives_2d_golden():
    g = load_golden("primitives_2d")
    x = jnp.asarray(g["x"])
    spheres = MultiSphereField(g["sphere_centers"], g["sphere_radii"])
    np.testing.assert_allclose(spheres.signed_distance(x), g["sdf_spheres"], atol=1e-5)
    boxes = MultiBoxField(g["box_centers"], g["box_sizes"])
    np.testing.assert_allclose(boxes.signed_distance(x), g["sdf_rounded_boxes"], atol=1e-5)
    sharp = MultiSharpBoxField(g["box_centers"], g["box_sizes"])
    np.testing.assert_allclose(sharp.signed_distance(x), g["sdf_sharp_boxes"], atol=1e-5)
    obj = ObjectField.create([spheres, boxes], pos=g["obj_pos"], ori=g["obj_ori"])
    np.testing.assert_allclose(obj.signed_distance(x), g["sdf_posed_object"], atol=1e-5)


def test_primitives_3d_golden():
    g = load_golden("primitives_3d")
    x = jnp.asarray(g["x"])
    spheres = MultiSphereField(g["sphere_centers"], g["sphere_radii"])
    np.testing.assert_allclose(spheres.signed_distance(x), g["sdf_spheres"], atol=1e-5)
    boxes = MultiBoxField(g["box_centers"], g["box_sizes"])
    np.testing.assert_allclose(boxes.signed_distance(x), g["sdf_rounded_boxes"], atol=1e-5)


def test_object_field_is_pytree():
    g = load_golden("primitives_2d")
    obj = ObjectField.create(
        [MultiSphereField(g["sphere_centers"], g["sphere_radii"])],
        pos=g["obj_pos"], ori=g["obj_ori"])
    leaves = jax.tree_util.tree_leaves(obj)
    assert len(leaves) == 4  # centers, radii, pos, ori
    # jit through the pytree
    f = jax.jit(lambda o, x: o.signed_distance(x))
    x = jnp.asarray(g["x"])
    np.testing.assert_allclose(f(obj, x), obj.signed_distance(x), atol=1e-6)


def test_sdf_gradients_finite():
    g = load_golden("primitives_2d")
    boxes = MultiBoxField(g["box_centers"], g["box_sizes"])
    grad = jax.vmap(jax.grad(boxes.signed_distance))(jnp.asarray(g["x"]))
    assert jnp.all(jnp.isfinite(grad))
    spheres = MultiSphereField(g["sphere_centers"], g["sphere_radii"])
    grad_s = jax.vmap(jax.grad(spheres.signed_distance))(jnp.asarray(g["x"]))
    # gradient of a sphere SDF has unit norm away from centers
    np.testing.assert_allclose(jnp.linalg.norm(grad_s, axis=-1),
                               np.ones(len(g["x"])), atol=1e-4)


def test_grid_sdf_matches_analytic_and_reference():
    g = load_golden("env_dense2d_sdf")
    p = load_golden("primitives_2d")
    del p
    # build the same dense2d scene from the golden env file via envs module later;
    # here: grid over the primitives_2d posed object
    g2 = load_golden("primitives_2d")
    spheres = MultiSphereField(g2["sphere_centers"], g2["sphere_radii"])
    boxes = MultiBoxField(g2["box_centers"], g2["box_sizes"])
    obj = ObjectField.create([spheres, boxes], pos=g2["obj_pos"], ori=g2["obj_ori"])
    limits = jnp.array([[-1.0, -1.0], [1.0, 1.0]])
    grid = precompute_sdf_grid(limits, 0.005, [obj])
    x = jnp.asarray(g2["x"])
    sdf_nearest = grid.signed_distance(x)
    sdf_exact = obj.signed_distance(x)
    # nearest-cell error bounded by cell diagonal * Lipschitz(=1)
    assert float(jnp.max(jnp.abs(sdf_nearest - sdf_exact))) < 0.01
    sdf_tri = grid.signed_distance_trilinear(x)
    assert float(jnp.max(jnp.abs(sdf_tri - sdf_exact))) < 0.005


def test_grid_sdf_surrogate_gradient():
    spheres = MultiSphereField(np.array([[0.0, 0.0]]), np.array([0.4]))
    obj = ObjectField.create([spheres])
    limits = jnp.array([[-1.0, -1.0], [1.0, 1.0]])
    grid = precompute_sdf_grid(limits, 0.01, [obj])
    x = jnp.array([0.7, 0.0])
    grad = jax.grad(grid.signed_distance)(x)
    np.testing.assert_allclose(grad, [1.0, 0.0], atol=0.05)
    grad_tri = jax.grad(grid.signed_distance_trilinear)(x)
    np.testing.assert_allclose(grad_tri, [1.0, 0.0], atol=0.05)


def test_occupancy_map():
    spheres = MultiSphereField(np.array([[0.0, 0.0]]), np.array([0.4]))
    obj = ObjectField.create([spheres])
    limits = jnp.array([[-1.0, -1.0], [1.0, 1.0]])
    occ = build_occupancy_map(limits, 0.01, [obj])
    inside = occ.get_collisions(jnp.array([[0.0, 0.0], [0.2, 0.2]]))
    outside = occ.get_collisions(jnp.array([[0.9, 0.9], [-0.8, 0.0]]))
    np.testing.assert_allclose(inside, [1.0, 1.0])
    np.testing.assert_allclose(outside, [0.0, 0.0])
