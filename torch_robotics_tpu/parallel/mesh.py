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
           "multihost_init", "solve_sharded", "mpc_rollout_sharded",
           "ilqr_solve_sharded", "sgpmp_solve_sharded",
           "chomp_solve_sharded"]


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


def _masked_mean(costs, axis_name, n_valid):
    """psum-reduced global mean of per-problem costs, excluding padded rows
    (shard_batch_padded) when ``n_valid`` is set."""
    local_B = costs.shape[0]
    if n_valid is not None:
        row0 = jax.lax.axis_index(axis_name) * local_B
        valid = ((row0 + jnp.arange(local_B)) < n_valid).astype(costs.dtype)
    else:
        valid = jnp.ones_like(costs)
    return (jax.lax.psum(jnp.sum(costs * valid), axis_name)
            / jax.lax.psum(jnp.sum(valid), axis_name))


def _chunked(body, args, chunk):
    """Run ``body`` over the per-device share as sequential knee-sized
    chunks (lax.map) when the share exceeds ``chunk`` and divides evenly;
    otherwise one call.  ``body`` takes/returns pytrees with the local
    batch in the LEADING axis of every leaf."""
    B_l = jax.tree_util.tree_leaves(args)[0].shape[0]
    if chunk and B_l > chunk and B_l % chunk == 0:
        n_c = B_l // chunk
        rs = jax.lax.map(
            body, jax.tree_util.tree_map(
                lambda a: a.reshape((n_c, chunk) + a.shape[1:]), args))
        return jax.tree_util.tree_map(
            lambda x: x.reshape((B_l,) + x.shape[2:]), rs)
    return body(args)


# iLQR/sGPMP/CHOMP sharded wrappers follow the same contract as
# solve_sharded: batch-leading operands sharded over the mesh axis,
# model/env constants replicated (broadcast inside jit), the per-problem
# result carried back with the same sharding, and ONE psum-reduced global
# statistic (mean final cost) over ICI.  Results with a leading
# non-batch axis (cost_trace: (iters, B)) are emitted batch-leading
# inside the mapped body and transposed outside — shard_map out_specs
# stay uniform P(axis_name) on every leaf.

@lru_cache(maxsize=64)
def _ilqr_sharded_fn(residual_fn, params, mesh, axis_name, has_u0, has_ref,
                     has_qlim, n_valid, chunk):
    from ..solve.ilqr import ilqr_solve

    in_specs = [P(axis_name), P(axis_name)]
    if has_u0:
        in_specs.append(P(axis_name))
    if has_ref:
        in_specs.append(P(axis_name))
    if has_qlim:
        in_specs.append(P())

    @jax.jit
    @partial(jax.shard_map, mesh=mesh, in_specs=tuple(in_specs),
             out_specs=((P(axis_name), P(axis_name), P(axis_name),
                         P(axis_name)), P()))
    def _solve(*ops):
        it = iter(ops)
        start_l, goal_l = next(it), next(it)
        u0_l = next(it) if has_u0 else None
        ref_l = next(it) if has_ref else None
        qlim = next(it) if has_qlim else None

        # optional operands ride the chunked tree as tiny dummies so the
        # tree structure (and the chunk reshape) stays uniform
        B_l = start_l.shape[0]
        u0_a = u0_l if has_u0 else jnp.zeros((B_l, 1), start_l.dtype)
        ref_a = ref_l if has_ref else jnp.zeros((B_l, 1), start_l.dtype)

        def body(a):
            s, g, u0, ref = a
            r = ilqr_solve(residual_fn, s, g, params,
                           u_init=u0 if has_u0 else None,
                           x_ref=ref if has_ref else None,
                           q_limits=None if qlim is None
                           else (qlim[0], qlim[1]))
            # batch-leading cost trace for uniform out sharding
            return (r.trajs, r.controls, r.costs,
                    jnp.moveaxis(r.cost_trace, 0, 1))

        trajs, controls, costs, trace_b = _chunked(
            body, (start_l, goal_l, u0_a, ref_a), chunk)
        return (trajs, controls, costs, trace_b), \
            _masked_mean(costs, axis_name, n_valid)[None]

    return _solve


def ilqr_solve_sharded(residual_fn, start_state, goal_state, params,
                       mesh: Mesh, axis_name: str = "batch", u_init=None,
                       x_ref=None, q_limits=None,
                       n_valid: Optional[int] = None,
                       chunk: Optional[int] = None):
    """iLQR solve with the problem batch sharded over the mesh.

    start/goal: (B, 2d) with B divisible by the mesh size (use
    ``shard_batch_padded`` + ``n_valid`` for uneven batches); optional
    warm-start controls ``u_init`` (B, H-1, d) and tracking reference
    ``x_ref`` (B, H, 2d) shard alongside; ``q_limits`` (q_min, q_max) is
    replicated.  Returns an ``ILQRResult`` (same sharding) plus the global
    mean final cost (psum over ICI, padded rows excluded).

    ``chunk``: per-device shares larger than this run as sequential
    knee-sized chunks (like ``mpc_rollout_sharded``); default None — the
    iLQR throughput knee is shallow (B=512 is past the GPMP2 knee but iLQR
    peak-throughput batch is larger; sweep with tools/scaling_bench.py).
    """
    from ..solve.ilqr import ILQRResult
    has_u0, has_ref = u_init is not None, x_ref is not None
    has_qlim = q_limits is not None
    _solve = _ilqr_sharded_fn(residual_fn, params, mesh, axis_name, has_u0,
                              has_ref, has_qlim,
                              None if n_valid is None else int(n_valid),
                              None if chunk is None else int(chunk))
    ops = [start_state, goal_state]
    if has_u0:
        ops.append(u_init)
    if has_ref:
        ops.append(x_ref)
    if has_qlim:
        ops.append(jnp.stack([q_limits[0], q_limits[1]]))
    (trajs, controls, costs, trace_b), gmean = _solve(*ops)
    return ILQRResult(trajs=trajs, controls=controls, costs=costs,
                      cost_trace=jnp.moveaxis(trace_b, 1, 0)), gmean[0]


@lru_cache(maxsize=64)
def _sgpmp_sharded_fn(residual_fn, params, mesh, axis_name,
                      per_problem_endpoints, n_valid, chunk):
    from ..solve.sampling import sgpmp_solve

    ep = P(axis_name) if per_problem_endpoints else P()

    @jax.jit
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis_name), ep, ep, P()),
             out_specs=((P(axis_name), P(axis_name)), P()))
    def _solve(theta0_l, start_l, goal_l, key):
        # independent per-device sample stream: statistically equivalent
        # to (not bitwise-identical with) the unsharded solve
        key_l = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        B_l = theta0_l.shape[0]
        # per-CHUNK streams too: without the fold every knee-sized chunk
        # would draw a bit-identical (K, chunk, ...) perturbation array
        chunk_ids = jnp.arange(B_l, dtype=jnp.int32) // (chunk or B_l)

        def body(a):
            th, s, g, cid = a
            key_c = jax.random.fold_in(key_l, cid[0])
            r = sgpmp_solve(residual_fn, th, s, g, params, key=key_c)
            return r.trajs, jnp.moveaxis(r.cost_trace, 0, 1)

        s_b = (start_l if per_problem_endpoints
               else jnp.broadcast_to(start_l, (B_l,) + start_l.shape))
        g_b = (goal_l if per_problem_endpoints
               else jnp.broadcast_to(goal_l, (B_l,) + goal_l.shape))
        trajs, trace_b = _chunked(body, (theta0_l, s_b, g_b, chunk_ids),
                                  chunk)
        costs = trace_b[:, -1]
        return (trajs, trace_b), _masked_mean(costs, axis_name, n_valid)[None]

    return _solve


def sgpmp_solve_sharded(residual_fn, theta0, start_state, goal_state, params,
                        mesh: Mesh, key=None, axis_name: str = "batch",
                        n_valid: Optional[int] = None,
                        chunk: Optional[int] = None):
    """Stochastic GPMP solve sharded over the mesh.

    Each device draws an independent perturbation stream
    (``fold_in(key, axis_index)``) — results are statistically equivalent
    to, not bitwise-identical with, the unsharded solve.  Returns an
    ``SGPMPResult`` plus the psum-reduced global mean final cost.
    """
    from ..solve.sampling import SGPMPResult
    if key is None:
        key = jax.random.PRNGKey(0)
    _solve = _sgpmp_sharded_fn(residual_fn, params, mesh, axis_name,
                               start_state.ndim > 1,
                               None if n_valid is None else int(n_valid),
                               None if chunk is None else int(chunk))
    (trajs, trace_b), gmean = _solve(theta0, start_state, goal_state, key)
    return SGPMPResult(trajs=trajs,
                       cost_trace=jnp.moveaxis(trace_b, 1, 0)), gmean[0]


@lru_cache(maxsize=64)
def _chomp_sharded_fn(residual_fn, params, mesh, axis_name,
                      per_problem_endpoints, n_valid, chunk):
    from ..solve.chomp import chomp_solve

    ep = P(axis_name) if per_problem_endpoints else P()

    @jax.jit
    @partial(jax.shard_map, mesh=mesh, in_specs=(P(axis_name), ep, ep),
             out_specs=((P(axis_name), P()), P()))
    def _solve(theta0_l, start_l, goal_l):
        B_l = theta0_l.shape[0]
        s_b = (start_l if per_problem_endpoints
               else jnp.broadcast_to(start_l, (B_l,) + start_l.shape))
        g_b = (goal_l if per_problem_endpoints
               else jnp.broadcast_to(goal_l, (B_l,) + goal_l.shape))

        def body(a):
            th, s, g = a
            r = chomp_solve(residual_fn, th, s, g, params,
                            per_problem_trace=True)
            # batch-leading per-problem trace so _chunked can reassemble
            return r.trajs, jnp.moveaxis(r.cost_trace, 0, 1)

        trajs, trace_b = _chunked(body, (theta0_l, s_b, g_b), chunk)
        # padded rows (shard_batch_padded) excluded from BOTH statistics
        if n_valid is not None:
            row0 = jax.lax.axis_index(axis_name) * B_l
            valid = ((row0 + jnp.arange(B_l)) < n_valid)
            trace_b = jnp.where(valid[:, None], trace_b, 0.0)
        # global summed trace (CHOMP's public semantics) over ICI
        trace_g = jax.lax.psum(jnp.sum(trace_b, axis=0), axis_name)
        gmean = _masked_mean(trace_b[:, -1], axis_name, n_valid)
        return (trajs, trace_g), gmean[None]

    return _solve


def chomp_solve_sharded(residual_fn, theta0, start_state, goal_state, params,
                        mesh: Mesh, axis_name: str = "batch",
                        n_valid: Optional[int] = None,
                        chunk: Optional[int] = None):
    """CHOMP solve sharded over the mesh (deterministic: bitwise-matches
    the unsharded solve per problem).  Returns a ``CHOMPResult`` whose
    ``cost_trace`` keeps CHOMP's batch-summed (iters,) semantics, psum'd
    across devices, plus the global mean final cost per problem.  With a
    padded batch (``n_valid``) the padded duplicate rows are excluded
    from both the summed trace and the mean (same contract as the
    iLQR/sGPMP wrappers)."""
    from ..solve.chomp import CHOMPResult
    _solve = _chomp_sharded_fn(residual_fn, params, mesh, axis_name,
                               start_state.ndim > 1,
                               None if n_valid is None else int(n_valid),
                               None if chunk is None else int(chunk))
    (trajs, trace_g), gmean = _solve(theta0, start_state, goal_state)
    return CHOMPResult(trajs=trajs, cost_trace=trace_g), gmean[0]
