import jax.numpy as jnp
import numpy as np
import pytest

dm_control = pytest.importorskip("dm_control")

from torch_robotics_tpu.kin import fk_all_links
from torch_robotics_tpu.kin.mjcf import kinematic_model_from_mjcf

MJCF = """
<mujoco model="two_link">
  <worldbody>
    <body name="upper" pos="0 0 0.1">
      <joint name="shoulder" type="hinge" axis="0 1 0" range="-1.5 1.5"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0 0 0.3"/>
      <body name="lower" pos="0 0 0.3">
        <joint name="elbow" type="hinge" axis="0 1 0" range="-2 2"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0 0 0.25"/>
        <body name="tip" pos="0 0 0.25"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""


def test_mjcf_two_link(tmp_path):
    path = tmp_path / "two_link.xml"
    path.write_text(MJCF)
    model = kinematic_model_from_mjcf(path)
    assert model.n_dofs == 2
    assert "tip" in model.link_names

    # q = 0: tip at base + 0.1 + 0.3 + 0.25 along z
    H = fk_all_links(model, jnp.zeros((1, 2)),
                     link_list=["tip"])
    np.testing.assert_allclose(H[0, 0, :3, 3], [0, 0, 0.65], atol=1e-6)

    # elbow at 90 deg about +y: tip moves to +x
    H2 = fk_all_links(model, jnp.array([[0.0, jnp.pi / 2]]),
                      link_list=["tip"])
    np.testing.assert_allclose(H2[0, 0, :3, 3], [0.25, 0, 0.4], atol=1e-5)

    # joint limits parsed
    np.testing.assert_allclose(model.q_lower, [-1.5, -2.0])
    np.testing.assert_allclose(model.q_upper, [1.5, 2.0])
