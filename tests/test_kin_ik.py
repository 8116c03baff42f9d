import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_robotics_tpu.core import pack_homogeneous, y_rot, z_rot
from torch_robotics_tpu.kin import fk_all_links, inverse_kinematics, robot_zoo


@pytest.fixture(scope="module")
def panda():
    return robot_zoo.franka_panda()


def test_ik_converges_to_reachable_target(panda):
    # reference example target (examples/inverse_kinematics.py:27-30)
    pos_target = jnp.array([0.2, 0.4, 0.1])
    rot_target = z_rot(jnp.array(-np.pi / 2)) @ y_rot(jnp.array(-np.pi))
    H_target = pack_homogeneous(rot_target, pos_target)

    res = inverse_kinematics(
        panda, H_target, link_name="ee_link", batch_size=8, max_iters=300,
        lr=2e-1, se3_eps=5e-2, eps_joint_lim=np.pi / 64,
        key=jax.random.PRNGKey(0))
    assert res.q.shape == (8, 7)
    assert int(res.valid.sum()) >= 4  # most samples should converge
    # the converged solutions actually reach the target
    H = fk_all_links(panda, res.q, link_list=["ee_link"])[:, 0]
    pos_err = jnp.linalg.norm(H[:, :3, 3] - pos_target, axis=-1)
    assert float(pos_err[res.valid].max()) < 0.1


def test_ik_respects_q0(panda):
    q_goal = jnp.array([0.0, -0.3, 0.0, -1.8, 0.0, 1.5, 0.0])
    H_target = fk_all_links(panda, q_goal, link_list=["ee_link"])[0]
    res = inverse_kinematics(
        panda, H_target, link_name="ee_link", batch_size=4, max_iters=150,
        lr=1e-1, se3_eps=5e-2, q0=jnp.tile(q_goal, (4, 1)), q0_noise=0.05,
        key=jax.random.PRNGKey(1))
    assert int(res.valid.sum()) == 4
    assert float(res.err_se3.max()) < 5e-2


def test_gn_ik_beats_adam_convergence():
    """Damped-least-squares IK converges far faster and more reliably than
    the reference-parity Adam solver."""
    from torch_robotics_tpu.core import pack_homogeneous, y_rot, z_rot
    from torch_robotics_tpu.kin.ik import inverse_kinematics_gn

    model = robot_zoo.franka_panda()
    H_target = pack_homogeneous(
        z_rot(jnp.array(-jnp.pi / 2)) @ y_rot(jnp.array(-jnp.pi)),
        jnp.array([0.2, 0.4, 0.1]))
    res = inverse_kinematics_gn(model, H_target, link_name="ee_link",
                                batch_size=64, max_iters=100, se3_eps=5e-2,
                                restart_every=25, key=jax.random.PRNGKey(1))
    assert float(res.valid.mean()) >= 0.85
    assert float(jnp.median(res.iters_to_valid)) < 60
    # returned q of valid samples actually satisfies the validity test
    from torch_robotics_tpu.kin.ik import ik_valid_mask
    ok, _ = ik_valid_mask(model, res.q, H_target[None], "ee_link",
                          se3_eps=5e-2)
    assert bool(jnp.all(ok[res.valid] | ~res.valid[res.valid]))


def test_adam_ik_restart_keeps_first_valid():
    """The Adam IK freezes the first valid q (later drift cannot unvalidate
    a converged sample)."""
    from torch_robotics_tpu.core import pack_homogeneous, y_rot, z_rot
    from torch_robotics_tpu.kin.ik import ik_valid_mask

    model = robot_zoo.franka_panda()
    H_target = pack_homogeneous(
        z_rot(jnp.array(-jnp.pi / 2)) @ y_rot(jnp.array(-jnp.pi)),
        jnp.array([0.2, 0.4, 0.1]))
    res = inverse_kinematics(model, H_target, link_name="ee_link",
                             batch_size=64, max_iters=150, lr=2e-1,
                             se3_eps=5e-2, key=jax.random.PRNGKey(2))
    ok, _ = ik_valid_mask(model, res.q, H_target[None], "ee_link",
                          se3_eps=5e-2)
    # every sample reported valid satisfies the check on the RETURNED q
    assert bool(jnp.all(~res.valid | ok))
