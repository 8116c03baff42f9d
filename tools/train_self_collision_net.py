"""Train the Panda learned self-collision SDF net and bundle the checkpoint.

Produces ``torch_robotics_tpu/data/panda_self_collision_net.npz``, the
checkpoint ``RobotPanda.create(use_learned_self_collision=True)`` loads —
our equivalent of the reference's storm_kit ``franka_self_sdf.pt``
(robot_panda.py:131-136; the .pt is not shipped with the reference, so the
net is trained here against the same q -> min-self-pair-distance target).

Run: python tools/train_self_collision_net.py [--quick]
"""
import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main(quick: bool = False):
    from torch_robotics_tpu.costs.fields import self_collision_distances
    from torch_robotics_tpu.costs.self_collision_net import \
        fit_self_collision_net
    from torch_robotics_tpu.robots import RobotPanda
    from torch_robotics_tpu.utils.files import get_data_path

    robot = RobotPanda.create()
    key = jax.random.PRNGKey(7)
    n = 20000 if quick else 400000
    epochs = 30 if quick else 400
    net, loss = fit_self_collision_net(
        key, robot, n_samples=n, hidden=(256, 128, 64), epochs=epochs,
        batch_size=4096, lr=1e-3)
    print("final train MSE:", loss)

    # held-out evaluation
    q_test = robot.random_q(jax.random.PRNGKey(123), 20000)
    pts = robot.self_collision_points(robot.fk_map_collision(q_test))
    d_true = jnp.min(self_collision_distances(
        pts, np.asarray(robot.self_pair_idxs)), axis=-1)
    d_pred = -net.raw_distance(q_test)
    err = jnp.abs(d_pred - d_true)
    print("held-out MAE: %.4f m   p95: %.4f m" %
          (float(err.mean()), float(jnp.percentile(err, 95))))
    # classification agreement at the reference margin (0.05)
    agree = jnp.mean(((d_pred < 0.05) == (d_true < 0.05)).astype(jnp.float32))
    print("collision-label agreement @0.05m: %.3f" % float(agree))

    out = get_data_path() / "panda_self_collision_net.npz"
    net.save_npz(out)
    print("saved", out)


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)
