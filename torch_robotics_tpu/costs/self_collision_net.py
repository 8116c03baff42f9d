"""Learned self-collision signed-distance field (STORM-style).

TPU-native counterpart of the reference's ``CollisionSelfFieldWrapperSTORM``
(/root/reference/torch_robotics/torch_planning_objectives/fields/
distance_fields.py:231-266), which wraps storm_kit's RobotSelfCollisionNet
MLP trained to predict the minimal self-collision distance from q.  Here the
net is a plain pytree MLP with the same architecture family; weights can be
loaded from a .npz checkpoint (converted from storm_kit's .pt) or trained
from FK-derived labels via ``fit_self_collision_net``.

Sign convention parity: the raw net predicts distance positive when
penetrating; ``signed_distance`` multiplies by -1 like the reference
(distance_fields.py:249-253), and the occupancy check uses the same -0.05
threshold (trained at 0.02; distance_fields.py:265).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.pytrees import pytree_dataclass, static_field

__all__ = ["SelfCollisionNet", "fit_self_collision_net"]


@pytree_dataclass
class SelfCollisionNet:
    """MLP q -> scalar raw self-collision distance (positive = penetrating)."""
    weights: tuple                # ((W, b), ...) per layer
    mean_q: jnp.ndarray           # input normalization
    std_q: jnp.ndarray
    scale_out: jnp.ndarray        # output de-normalization (scale, shift)
    activation: str = static_field(default="relu")

    @classmethod
    def init(cls, key, n_joints: int, hidden: Sequence[int] = (256, 64),
             dtype=jnp.float32):
        sizes = [n_joints, *hidden, 1]
        keys = jax.random.split(key, len(sizes) - 1)
        weights = []
        for k, n_in, n_out in zip(keys, sizes[:-1], sizes[1:]):
            W = jax.random.normal(k, (n_in, n_out), dtype) * jnp.sqrt(2.0 / n_in)
            weights.append((W, jnp.zeros((n_out,), dtype)))
        return cls(weights=tuple(weights),
                   mean_q=jnp.zeros((n_joints,), dtype),
                   std_q=jnp.ones((n_joints,), dtype),
                   scale_out=jnp.asarray([1.0, 0.0], dtype))

    @classmethod
    def from_npz(cls, path):
        """Load weights exported to npz: W0, b0, W1, b1, ..., mean_q, std_q,
        scale_out."""
        data = np.load(path)
        n_layers = sum(1 for k in data.files if k.startswith("W"))
        weights = tuple((jnp.asarray(data[f"W{i}"]), jnp.asarray(data[f"b{i}"]))
                        for i in range(n_layers))
        return cls(weights=weights,
                   mean_q=jnp.asarray(data["mean_q"]),
                   std_q=jnp.asarray(data["std_q"]),
                   scale_out=jnp.asarray(data["scale_out"]))

    def save_npz(self, path):
        out = {}
        for i, (W, b) in enumerate(self.weights):
            out[f"W{i}"] = np.asarray(W)
            out[f"b{i}"] = np.asarray(b)
        out["mean_q"] = np.asarray(self.mean_q)
        out["std_q"] = np.asarray(self.std_q)
        out["scale_out"] = np.asarray(self.scale_out)
        np.savez(path, **out)

    def raw_distance(self, q):
        """q: (..., n_joints) -> raw net output (...,)."""
        x = (q - self.mean_q) / self.std_q
        act = jax.nn.relu if self.activation == "relu" else jnp.tanh
        for W, b in self.weights[:-1]:
            x = act(x @ W + b)
        W, b = self.weights[-1]
        x = (x @ W + b)[..., 0]
        return x * self.scale_out[0] + self.scale_out[1]

    def signed_distance(self, q):
        """Reference sign convention: negative of the raw prediction
        (distance_fields.py:249-253)."""
        return -self.raw_distance(q)

    def collision(self, q, threshold: float = -0.05):
        return self.signed_distance(q) < threshold

    def cost(self, q):
        """'sdf'-type cost: margin-free negated distance summed (scalar per
        configuration)."""
        return -self.signed_distance(q)


def fit_self_collision_net(key, robot, n_samples: int = 20000,
                           hidden=(256, 64), epochs: int = 200,
                           batch_size: int = 2048, lr: float = 1e-3):
    """Train a SelfCollisionNet on FK-derived min pair distances.

    Labels: raw = -(min pair distance) so positive means penetrating, matching
    the STORM convention (the reference loads storm_kit's pretrained
    ``franka_self_sdf.pt``, which is not shipped with it — this trains the
    same q -> min-self-distance regressor against our collision model).
    Each epoch is a full pass over the shuffled dataset (lax.scan over
    minibatches).  Returns (net, final_loss).
    """
    import optax

    from ..costs.fields import self_collision_distances

    k_data, k_init, k_train = jax.random.split(key, 3)
    qs = robot.random_q(k_data, n_samples)
    link_pos = robot.fk_map_collision(qs)
    pts = robot.self_collision_points(link_pos)
    d_min = jnp.min(self_collision_distances(
        pts, np.asarray(robot.self_pair_idxs)), axis=-1)
    labels = -d_min

    net = SelfCollisionNet.init(k_init, robot.q_dim, hidden)
    net = dataclasses.replace(net, mean_q=qs.mean(0), std_q=qs.std(0) + 1e-6)

    opt = optax.adam(lr)
    params = net.weights
    opt_state = opt.init(params)
    n_batches = max(1, n_samples // batch_size)
    n_used = n_batches * batch_size

    def loss_fn(weights, qb, yb):
        net_w = dataclasses.replace(net, weights=weights)
        pred = net_w.raw_distance(qb)
        return jnp.mean(jnp.square(pred - yb))

    @jax.jit
    def train_epoch(params, opt_state, key_e):
        idx = jax.random.permutation(key_e, n_samples)[:n_used]
        qb = qs[idx].reshape(n_batches, batch_size, -1)
        yb = labels[idx].reshape(n_batches, batch_size)

        def step(carry, batch):
            params, opt_state = carry
            loss, g = jax.value_and_grad(loss_fn)(params, *batch)
            updates, opt_state = opt.update(g, opt_state)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), (qb, yb))
        return params, opt_state, losses[-1]

    loss = jnp.inf
    for e in range(epochs):
        k_train, k_e = jax.random.split(k_train)
        params, opt_state, loss = train_epoch(params, opt_state, k_e)
    net = dataclasses.replace(net, weights=params)
    return net, float(loss)
