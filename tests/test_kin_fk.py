import jax
import jax.numpy as jnp
import numpy as np
import pytest

from golden_utils import load_golden
from torch_robotics_tpu.kin import (
    KinematicModel, analytical_jacobian, fk_all_links, fk_rot_trans,
    geometric_jacobian, robot_zoo,
)


@pytest.fixture(scope="module")
def panda():
    return robot_zoo.franka_panda()


@pytest.fixture(scope="module")
def ur10_model():
    return robot_zoo.ur10()


def test_panda_structure(panda):
    g = load_golden("panda_fk")
    assert list(panda.link_names) == list(g["link_names"])
    assert panda.n_dofs == 7
    np.testing.assert_allclose(panda.q_lower, g["joint_lower"], atol=1e-6)
    np.testing.assert_allclose(panda.q_upper, g["joint_upper"], atol=1e-6)


def test_panda_fk_golden(panda):
    g = load_golden("panda_fk")
    q = jnp.asarray(g["q"])
    H = fk_all_links(panda, q)
    assert H.shape == g["link_tensor"].shape
    np.testing.assert_allclose(H, g["link_tensor"], atol=2e-5)


def test_ur10_fk_golden(ur10_model):
    g = load_golden("ur10_fk")
    q = jnp.asarray(g["q"])
    H = fk_all_links(ur10_model, q)
    np.testing.assert_allclose(H, g["link_tensor"], atol=2e-5)


def test_fk_jit_vmap(panda):
    q = jax.random.uniform(jax.random.PRNGKey(0), (4, 7), minval=-1, maxval=1)
    H_batch = fk_all_links(panda, q)
    f = jax.jit(lambda q: fk_all_links(panda, q))
    np.testing.assert_allclose(f(q), H_batch, atol=1e-6)
    H_vmap = jax.vmap(lambda qi: fk_all_links(panda, qi))(q)
    np.testing.assert_allclose(H_vmap, H_batch, atol=1e-6)


def test_fk_link_list_selection(panda):
    q = jnp.zeros((2, 7))
    H_all = fk_all_links(panda, q)
    H_sel = fk_all_links(panda, q, link_list=["panda_hand", "ee_link"])
    i_hand = panda.link_index("panda_hand")
    i_ee = panda.link_index("ee_link")
    np.testing.assert_allclose(H_sel[:, 0], H_all[:, i_hand])
    np.testing.assert_allclose(H_sel[:, 1], H_all[:, i_ee])


def test_fk_clamps_joint_limits(panda):
    # FK must clamp out-of-limit q (rigid_body.py:157-160 parity)
    q_over = panda.q_upper[None, :] + 1.0
    q_clamped = jnp.clip(q_over, panda.q_lower, panda.q_upper)
    np.testing.assert_allclose(fk_all_links(panda, q_over),
                               fk_all_links(panda, q_clamped), atol=1e-6)


def test_base_pose_offset(panda):
    q = jnp.zeros((1, 7))
    from torch_robotics_tpu.core import z_rot
    base_rot = z_rot(jnp.array(0.5))
    base_trans = jnp.array([1.0, 2.0, 3.0])
    R, t = fk_rot_trans(panda, q, base_rot=base_rot, base_trans=base_trans)
    R0, t0 = fk_rot_trans(panda, q)
    np.testing.assert_allclose(
        t[..., -1, :],
        (base_rot @ t0[..., -1, :, None])[..., 0] + base_trans, atol=1e-5)
    np.testing.assert_allclose(R[..., -1, :, :], base_rot @ R0[..., -1, :, :],
                               atol=1e-5)


def test_geometric_jacobian_matches_fd(panda):
    q = jnp.array([0.1, -0.4, 0.3, -1.2, 0.5, 1.0, 0.2])
    lin, ang = geometric_jacobian(panda, q, "ee_link")
    assert lin.shape == (3, 7)
    # finite-difference check of the linear jacobian
    eps = 1e-4
    i_ee = panda.link_index("ee_link")
    for j in range(7):
        dq = jnp.zeros(7).at[j].set(eps)
        _, t_p = fk_rot_trans(panda, q + dq)
        _, t_m = fk_rot_trans(panda, q - dq)
        fd = (t_p[i_ee] - t_m[i_ee]) / (2 * eps)
        np.testing.assert_allclose(lin[:, j], fd, atol=1e-2)


def test_analytical_jacobian_shape(panda):
    q = jnp.zeros((3, 7))
    J = analytical_jacobian(panda, q)
    assert J.shape == (3, panda.n_links, 7, 7)
    assert jnp.all(jnp.isfinite(J))


def test_fk_grad_flows(panda):
    def f(q):
        return jnp.sum(fk_all_links(panda, q))

    g = jax.grad(f)(jnp.full((7,), 0.3))
    assert jnp.all(jnp.isfinite(g))
    assert float(jnp.abs(g).max()) > 0


def test_whole_zoo_compiles_and_runs():
    zoo = [
        robot_zoo.kuka_iiwa7, robot_zoo.ur10, robot_zoo.habitat_stretch,
        robot_zoo.tiago_dual_holo, robot_zoo.tiago_dual_holo_move,
        robot_zoo.shadow_hand, robot_zoo.allegro_hand, robot_zoo.planar_2_link,
    ]
    for ctor in zoo:
        model = ctor()
        assert model.n_dofs > 0, model.name
        q = jnp.zeros((2, model.n_dofs))
        H = fk_all_links(model, q)
        assert H.shape == (2, model.n_links, 4, 4)
        assert jnp.all(jnp.isfinite(H)), model.name
        # bottom row must be [0,0,0,1]
        np.testing.assert_allclose(H[..., 3, :], np.tile([0, 0, 0, 1.0],
                                                         (2, model.n_links, 1)))


def test_grasped_object_link(panda):
    class Obj:
        pos = np.array([0.0, 0.0, 0.11])
        ori = np.array([0.0, 0.7071081, 0.0, 0.7071055])

    model = robot_zoo.franka_panda(grasped_object=Obj())
    assert "grasped_object" in model.link_names
    q = jnp.zeros((1, 7))
    H = fk_all_links(model, q, link_list=["grasped_object"])
    assert jnp.all(jnp.isfinite(H))
    # grasped object sits 0.11 along the hand z-axis
    H_hand = fk_all_links(model, q, link_list=["panda_hand"])
    offset_world = H[0, 0, :3, 3] - H_hand[0, 0, :3, 3]
    np.testing.assert_allclose(jnp.linalg.norm(offset_world), 0.11, atol=1e-5)


@pytest.mark.parametrize("golden_name,ctor,exclude_prefix", [
    # the Shadow hand's little-finger chain hangs off LFJ5, whose axis is
    # NON-axis-aligned (0.574, 0, 0.819); the reference dispatches any axis
    # that is not exactly e_x/e_y to z_rot (rigid_body.py:100-105), rotating
    # LFJ5 about the WRONG axis.  We rotate about the true axis (checked
    # in closed form below), so the lf* links are excluded from reference
    # parity.
    ("shadow_hand_fk", robot_zoo.shadow_hand, "lf"),
    ("allegro_hand_fk", robot_zoo.allegro_hand, None),
    ("tiago_dual_fk", robot_zoo.tiago_dual_holo, None),
    ("kuka_iiwa7_fk", robot_zoo.kuka_iiwa7, None),
])
def test_branching_tree_fk_golden(golden_name, ctor, exclude_prefix):
    """Golden FK parity for the BRANCHING kinematic trees (Shadow/Allegro
    hands: 5/4 finger chains off one palm; Tiago dual: two arm chains off
    the torso) plus KUKA iiwa — the parent-indexed gather topologies the
    chain-scan FK must get right (reference recursion:
    /root/reference/torch_robotics/torch_kinematics_tree/models/
    rigid_body.py:146-211)."""
    g = load_golden(golden_name)
    model = ctor()
    assert list(model.link_names) == list(g["link_names"]), model.name
    H = np.asarray(fk_all_links(model, jnp.asarray(g["q"])))
    ref = np.asarray(g["link_tensor"])
    keep = [i for i, n in enumerate(g["link_names"])
            if exclude_prefix is None or not n.startswith(exclude_prefix)]
    assert len(keep) >= len(g["link_names"]) - 6
    np.testing.assert_allclose(H[:, keep], ref[:, keep], atol=2e-5)


def test_shadow_lfj5_true_axis_closed_form():
    """LFJ5 (palm -> lfmetacarpal) rotates about its URDF axis
    (0.5735764, 0, 0.8191520) — verified against a closed-form Rodrigues
    rotation composed onto the palm pose.  (The reference rotates this
    joint about z instead — rigid_body.py:100-105 — so no golden exists
    for the true behavior.)"""
    g = load_golden("shadow_hand_fk")
    model = robot_zoo.shadow_hand()
    names = list(model.link_names)
    q = jnp.asarray(g["q"])
    H = np.asarray(fk_all_links(model, q))
    i_palm, i_lfm = names.index("palm"), names.index("lfmetacarpal")
    # LFJ5 dof index within q
    j_names = list(model.joint_names)
    dof = int(np.asarray(model.q_map)[names.index("lfmetacarpal")])
    assert "LFJ5" in j_names[i_lfm]
    axis = np.array([0.573576436, 0.0, 0.819152044])
    angle = np.clip(np.asarray(q)[:, dof], 0.0, 0.69813170079773179)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    T_origin = np.eye(4)
    T_origin[:3, 3] = [-0.033, 0.0, 0.02071]
    for b in range(q.shape[0]):
        R = (np.eye(3) + np.sin(angle[b]) * K
             + (1 - np.cos(angle[b])) * (K @ K))
        T_rot = np.eye(4)
        T_rot[:3, :3] = R
        expected = H[b, i_palm] @ T_origin @ T_rot
        np.testing.assert_allclose(H[b, i_lfm], expected, atol=2e-5)


def test_stretch_fk_golden_prismatic():
    """Habitat Stretch mixes revolute/prismatic/continuous joints —
    prismatic-joint parity with the reference FK."""
    g = load_golden("stretch_fk")
    model = robot_zoo.habitat_stretch()
    assert list(model.link_names) == list(g["link_names"])
    H = fk_all_links(model, jnp.asarray(g["q"]))
    np.testing.assert_allclose(H, g["link_tensor"], atol=2e-5)


def test_fk_all_links_batched_base_pose():
    """Per-sample base poses (B, 3, 3)/(B, 3) flatten into the lane axis —
    regression: the first lanes-backed fk_all_links only handled a single
    (3, 3) base and crashed on batched bases."""
    from torch_robotics_tpu.core import z_rot
    model = robot_zoo.franka_panda()
    B = 5
    q = jax.random.uniform(jax.random.PRNGKey(3), (B, model.n_dofs),
                           minval=-1.0, maxval=1.0)
    angles = jnp.linspace(0.0, 2.0, B)
    base_R = jax.vmap(z_rot)(angles)                       # (B, 3, 3)
    base_t = jnp.stack([angles, -angles, 0.1 * angles], -1)  # (B, 3)
    H = fk_all_links(model, q, base_rot=base_R, base_trans=base_t)
    # reference: per-sample AoS path (q.ndim == 1 branch)
    for i in range(B):
        H_i = fk_all_links(model, q[i], base_rot=base_R[i],
                           base_trans=base_t[i])
        np.testing.assert_allclose(H[i], H_i, rtol=1e-5, atol=1e-6)
