import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from torch_robotics_tpu.costs.self_collision_net import (
    SelfCollisionNet, fit_self_collision_net)
from torch_robotics_tpu.robots import RobotPanda
from torch_robotics_tpu.utils.logging import MetricsAccumulator, log_every


def test_log_every_from_jit():
    acc = MetricsAccumulator()
    log_fn = log_every("test/cost", every=2, printer=acc.printer("test/cost"))

    @jax.jit
    def run():
        def body(c, i):
            log_fn(i, c)
            return c + 1.0, None
        out, _ = jax.lax.scan(body, 0.0, jnp.arange(6))
        return out

    out = run()
    jax.effects_barrier()
    assert float(out) == 6.0
    d = acc.as_dict()
    assert [i for i, _ in d["test/cost"]] == [0, 2, 4]


def test_self_collision_net_fit_and_roundtrip(tmp_path):
    robot = RobotPanda.create()
    net, loss = fit_self_collision_net(
        jax.random.PRNGKey(0), robot, n_samples=4000, hidden=(128, 64),
        epochs=1500, batch_size=1024, lr=2e-3)
    assert np.isfinite(loss)

    # the net predicts the (negated) min pair distance within coarse error
    qs = robot.random_q(jax.random.PRNGKey(5), 128)
    from torch_robotics_tpu.costs.fields import self_collision_distances
    pts = robot.self_collision_points(robot.fk_map_collision(qs))
    d_min = jnp.min(self_collision_distances(
        pts, np.asarray(robot.self_pair_idxs)), axis=-1)
    pred_sd = net.signed_distance(qs)     # reference sign: -raw
    corr = np.corrcoef(np.asarray(pred_sd), np.asarray(d_min))[0, 1]
    # smoke test of the training pipeline, not a model-quality benchmark
    assert corr > 0.4, f"net barely correlates with true distance ({corr:.2f})"

    # npz round trip
    path = tmp_path / "self_net.npz"
    net.save_npz(path)
    net2 = SelfCollisionNet.from_npz(path)
    np.testing.assert_allclose(net2.signed_distance(qs), pred_sd, atol=1e-6)
    # collision threshold semantics (distance_fields.py:265)
    assert net2.collision(qs).dtype == bool
