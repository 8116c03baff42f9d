"""Batched FK across the robot zoo with timing.

Mirrors /root/reference/examples/forward_kinematics.py.
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from torch_robotics_tpu.core import TimerTPU, fix_random_seed
from torch_robotics_tpu.kin import fk_all_links, robot_zoo

if __name__ == "__main__":
    key = fix_random_seed(1)
    batch_size = 10

    zoo = {
        "Panda": robot_zoo.franka_panda,
        "UR10": robot_zoo.ur10,
        "Habitat Stretch": robot_zoo.habitat_stretch,
        "Tiago": robot_zoo.tiago_dual_holo_move,
        "Shadow Hand": robot_zoo.shadow_hand,
        "Allegro Hand": robot_zoo.allegro_hand,
        "KUKA iiwa7": robot_zoo.kuka_iiwa7,
    }

    for name, ctor in zoo.items():
        print(f"\n==================== {name} ====================")
        model = ctor()
        print("links:", len(model.link_names), "dofs:", model.n_dofs)
        key, sub = jax.random.split(key)
        q = jax.random.uniform(sub, (batch_size, model.n_dofs))
        fk = jax.jit(lambda q, m=model: fk_all_links(m, q))
        fk(q).block_until_ready()  # compile
        with TimerTPU() as t:
            data = fk(q)
            t.block_on(data)
        print(f"link tensor {data.shape}, computational time {t.elapsed:.6f}s")
