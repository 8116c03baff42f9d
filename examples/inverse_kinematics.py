"""Batched Adam IK for the Panda to a target SE(3) pose, with 3-D plot.

Mirrors /root/reference/examples/inverse_kinematics.py.
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from torch_robotics_tpu.core import (TimerTPU, fix_random_seed,
                                     pack_homogeneous, y_rot, z_rot)
from torch_robotics_tpu.kin import (fk_all_links, get_skeleton_from_model,
                                    inverse_kinematics, robot_zoo)

if __name__ == "__main__":
    key = fix_random_seed(0)
    batch_size = 10

    pos_target = jnp.array([0.2, 0.4, 0.1])
    rot_target = z_rot(jnp.array(-jnp.pi / 2)) @ y_rot(jnp.array(-jnp.pi))
    H_target = pack_homogeneous(rot_target, pos_target)

    print("=================== Panda IK ===================")
    panda = robot_zoo.franka_panda()
    with TimerTPU() as t:
        res = inverse_kinematics(
            panda, H_target, link_name="ee_link", batch_size=batch_size,
            max_iters=500, lr=2e-1, se3_eps=5e-2,
            eps_joint_lim=jnp.pi / 64, key=key)
        t.block_on(res.q)
    print(f"IK time: {t.elapsed:.3f}s")
    print(f"valid: {int(res.valid.sum())}/{batch_size}")
    print(f"SE3 error (valid): "
          f"{np.asarray(res.err_se3)[np.asarray(res.valid)]}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from torch_robotics_tpu.viz import (create_fig_and_axes,
                                            plot_coordinate_frame)
        fig, ax = create_fig_and_axes(3)
        ax.set_xlim(-0.75, 0.75); ax.set_ylim(-0.75, 0.75); ax.set_zlim(-0.5, 1)
        plot_coordinate_frame(ax, rot_target, pos_target, arrow_length=0.15)
        for i in range(batch_size):
            if bool(res.valid[i]):
                sk = get_skeleton_from_model(panda, res.q[i])
                sk.draw_skeleton(ax=ax, color="blue", alpha=0.5)
        fig.savefig("ik_result.png", dpi=120)
        print("saved ik_result.png")
    except Exception as e:  # headless-safe
        print("plotting skipped:", e)
