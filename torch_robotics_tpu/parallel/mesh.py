"""Device mesh + sharding helpers for multi-chip / multi-host scaling.

The reference has no distributed machinery at all (SURVEY.md §2); this module
is the greenfield TPU-native scaling layer: a named ``Mesh`` over the
scenario/sample batch axis, ``NamedSharding`` placement for problem batches
(env SDF grids and robot models are replicated — they are broadcast
constants inside jit), and ``shard_map``-wrapped solvers whose only
cross-device communication is an optional ``psum`` reduction for global
convergence statistics over ICI.
"""
from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "shard_batch_padded", "replicate",
           "multihost_init", "solve_sharded", "mpc_rollout_sharded"]


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "batch",
              devices=None) -> Mesh:
    """1-D mesh over the scenario batch axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def multihost_init(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None):
    """Initialize multi-host JAX over DCN (no-op if single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def shard_batch(x, mesh: Mesh, axis_name: str = "batch"):
    """Place an array with its leading axis sharded over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P(axis_name)))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))


def shard_batch_padded(x, mesh: Mesh, axis_name: str = "batch"):
    """Shard a batch whose size need not divide the mesh size.

    Pads the leading axis by repeating the last element up to the next
    multiple of the mesh size (repeats keep solver numerics finite, unlike
    zero rows), shards, and returns (sharded array, n_valid).  Callers mask
    the padded tail with ``jnp.arange(B_pad) < n_valid`` when reducing.
    """
    n = mesh.devices.size
    B = x.shape[0]
    pad = (-B) % n
    if pad:
        x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
    return shard_batch(x, mesh, axis_name), B


# the jitted shard_map callables are cached by their static configuration:
# an un-jitted shard_map executes the mapped body op-by-op around the inner
# pjit instead of compiling ONE program per device (measured 3.4x slower at
# B=8192 on one chip), and re-jitting a fresh closure per call would
# retrace every time.  NOTE on retention: each cached entry holds its
# residual_fn (task arrays) and compiled executable for process lifetime,
# bounded at 64 entries; long-lived processes cycling through many
# task/mesh configs can call ``_solve_sharded_fn.cache_clear()`` /
# ``_mpc_rollout_sharded_fn.cache_clear()`` to release them
@lru_cache(maxsize=64)
def _solve_sharded_fn(residual_fn, params, mesh, axis_name,
                      per_problem_endpoints, n_valid):
    from ..solve.gpmp2 import gpmp2_solve

    in_specs = (P(axis_name),
                P(axis_name) if per_problem_endpoints else P(),
                P(axis_name) if per_problem_endpoints else P())

    @jax.jit
    @partial(jax.shard_map, mesh=mesh, in_specs=in_specs,
             out_specs=(P(axis_name), P()))
    def _solve(theta0_l, start_l, goal_l):
        res = gpmp2_solve(residual_fn, theta0_l, start_l, goal_l, params)
        if n_valid is not None:
            local_B = res.costs.shape[0]
            row0 = jax.lax.axis_index(axis_name) * local_B
            valid = ((row0 + jnp.arange(local_B)) < n_valid).astype(
                res.costs.dtype)
        else:
            valid = jnp.ones_like(res.costs)
        local_sum = jnp.sum(res.costs * valid)
        local_n = jnp.sum(valid)
        global_mean = (jax.lax.psum(local_sum, axis_name)
                       / jax.lax.psum(local_n, axis_name))
        return res.trajs, global_mean[None]

    return _solve


def solve_sharded(residual_fn, theta0, start_state, goal_state, params,
                  mesh: Mesh, axis_name: str = "batch",
                  n_valid: Optional[int] = None):
    """GPMP2 solve with the problem batch sharded over the mesh.

    theta0: (B, H, 2d) with B divisible by the mesh size (use
    ``shard_batch_padded`` for uneven batches and pass its ``n_valid``);
    start/goal either shared (2d,) or per-problem (B, 2d).  Returns the
    optimized trajectories (same sharding) plus the global mean final cost
    (psum over ICI), excluding padded rows from the statistic.
    """
    _solve = _solve_sharded_fn(residual_fn, params, mesh, axis_name,
                               start_state.ndim > 1,
                               None if n_valid is None else int(n_valid))
    trajs, global_mean = _solve(theta0, start_state, goal_state)
    return trajs, global_mean[0]


# per-device batches past the measured throughput knee LOSE throughput
# (H=32: B=256 peaks at 369k solves/s on one v5e chip, B=8192 runs at
# 197k; H=64: B=128 peaks at 162.5k, B=1024 runs at 118k — the solver's
# L/y stacks grow past VMEM-adjacent sizes and the sweep goes
# bandwidth-bound; tools/scaling_bench.py --mode knee).  Large per-device
# shares are therefore processed as sequential knee-sized chunks inside
# the device program: B=1024/H=64 measured 167.6k (chunk 128) vs 114.2k
# (unchunked) vs 147.8k (chunk 256) — re-swept after the fused Pallas
# terms kernel (ops/pallas_terms.py) moved the knee: 241k @ 128 /
# 282k @ 256 / 280k @ 1024.
_POD_CHUNK = 256


@lru_cache(maxsize=64)
def _mpc_rollout_sharded_fn(residual_fn, params, n_steps, mesh, axis_name,
                            chunk):
    from ..solve.mpc import mpc_rollout

    @jax.jit
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis_name), P(axis_name)),
             out_specs=(P(axis_name), P()))
    def _run(start_l, goal_l):
        B_l = start_l.shape[0]
        if chunk and B_l > chunk and B_l % chunk == 0:
            def one(sg):
                s, g = sg
                xs_c, info_c = mpc_rollout(residual_fn, s, g, params, n_steps)
                return xs_c, info_c["dist_to_goal"][-1]
            n_c = B_l // chunk
            xs, dist = jax.lax.map(
                one, (start_l.reshape(n_c, chunk, -1),
                      goal_l.reshape(n_c, chunk, -1)))
            xs = xs.reshape((B_l,) + xs.shape[2:])
            dist_final = dist.reshape(-1)
        else:
            xs, info = mpc_rollout(residual_fn, start_l, goal_l, params,
                                   n_steps)
            dist_final = info["dist_to_goal"][-1]
        goal_frac = jnp.mean((dist_final < 0.1).astype(jnp.float32))
        global_frac = jax.lax.pmean(goal_frac, axis_name)
        return xs, global_frac[None]

    return _run


def mpc_rollout_sharded(residual_fn, start_state, goal_state, params, n_steps,
                        mesh: Mesh, axis_name: str = "batch",
                        chunk: Optional[int] = _POD_CHUNK):
    """Receding-horizon MPC with scenario batch sharded over the mesh.

    ``chunk``: per-device shares larger than this are processed as
    sequential chunks at the single-chip throughput knee (None disables).
    """
    _run = _mpc_rollout_sharded_fn(residual_fn, params, int(n_steps), mesh,
                                   axis_name,
                                   None if chunk is None else int(chunk))
    xs, frac = _run(start_state, goal_state)
    return xs, frac[0]
