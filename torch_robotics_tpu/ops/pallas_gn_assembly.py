"""Assembly-only Pallas kernel: (r, Jr) -> (g, JtJ, cost) in one pass.

NEGATIVE RESULT, kept as measured evidence (A/B 2026-08-19, git history):
from MATERIALIZED (P, N) / (P, d, N) inputs, XLA already fuses all
d(d+3)/2 + 1 multiply-reduces into a single HBM pass — 0.055 ms at
N=65k vs 0.18 ms for this kernel (grid/pipeline overhead + the d=7
sublane padding of its input blocks).  The terms stage's real cost was
UPSTREAM of the assembly: the hinge/contract chains and their
materialized small-second-minor-dim intermediates.  The production fix is
the fully-fused terms kernel (``ops/pallas_terms.py``), which subsumes
this one; nothing routes here in production.

The reference's cost stacking re-evaluates fields per cost term
(torch_planning_objectives/fields/distance_fields.py:107-130 summed per
field); the fused terms kernel is the TPU-native replacement for that
whole stage.

Contract (per lane n):
    g[j]    = sum_p r[p] * Jr[p, j]
    Hu[u]   = sum_p Jr[p, i] * Jr[p, j]   for u = tri(i, j), j >= i
    cost    = 0.5 * sum_p r[p]^2
Scaling by the collision weight lam is the caller's job (fold sqrt(lam)
into r and Jr to get lam-scaled g/H and 0.5*lam*sum r^2 cost exactly).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gn_assembly_pallas", "gn_assembly_reference", "gn_assembly_auto",
           "triu_index_pairs"]

_TILE_N = 2048
_LANE = 128


def triu_index_pairs(d: int):
    """[(i, j)] for the upper triangle in the kernel's row order."""
    return [(i, j) for i in range(d) for j in range(i, d)]


def gn_assembly_reference(r, Jr):
    """Plain-jnp reference: r (P, N), Jr (P, d, N) ->
    g (d, N), Hu (d(d+1)/2, N), cost (N,)."""
    d = Jr.shape[1]
    g = jnp.sum(r[:, None, :] * Jr, axis=0)
    rows = [jnp.sum(Jr[:, i, :] * Jr[:, j, :], axis=0)
            for i, j in triu_index_pairs(d)]
    return g, jnp.stack(rows), 0.5 * jnp.sum(r * r, axis=0)


from .pallas_common import out_struct as _out_struct


def _kernel(r_ref, j_ref, g_ref, h_ref, c_ref, *, d):
    r = r_ref[...]                                     # (P, TN)
    cols = [j_ref[:, j, :] for j in range(d)]          # each (P, TN)
    g_ref[...] = jnp.stack(
        [jnp.sum(r * cols[j], axis=0) for j in range(d)])
    h_ref[...] = jnp.stack(
        [jnp.sum(cols[i] * cols[j], axis=0)
         for i, j in triu_index_pairs(d)])
    c_ref[...] = 0.5 * jnp.sum(r * r, axis=0, keepdims=True)


@partial(jax.jit, static_argnames=("tile_n", "interpret"))
def gn_assembly_pallas(r, Jr, tile_n: int = _TILE_N, interpret: bool = False):
    """r (P, N), Jr (P, d, N) -> g (d, N), Hu (d(d+1)/2, N), cost (N,).

    N is padded to a multiple of ``tile_n`` internally (zero rows produce
    zero contributions, so padding is exact)."""
    P, d, N = Jr.shape
    assert r.shape == (P, N), (r.shape, Jr.shape)
    n_u = d * (d + 1) // 2
    N_pad = ((N + tile_n - 1) // tile_n) * tile_n
    if N_pad != N:
        pad = ((0, 0), (0, N_pad - N))
        r = jnp.pad(r, pad)
        Jr = jnp.pad(Jr, ((0, 0), (0, 0), (0, N_pad - N)))

    g, hu, cost = pl.pallas_call(
        partial(_kernel, d=d),
        out_shape=(
            _out_struct((d, N_pad), r.dtype, r, Jr),
            _out_struct((n_u, N_pad), r.dtype, r, Jr),
            _out_struct((1, N_pad), r.dtype, r, Jr),
        ),
        grid=(N_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((P, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, d, tile_n), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((d, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_u, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(r, Jr)
    return g[:, :N], hu[:, :N], cost[0, :N]


def gn_assembly_tile_for(P: int, d: int, N: int):
    """Lane tile the kernel would use at these shapes, or None (fall back
    to the XLA reduces).  VMEM per program: the (P, TN) + (P, d, TN) input
    blocks double-buffered plus the small outputs."""
    if jax.default_backend() != "tpu":
        return None
    for tn in (_TILE_N, 1024, 512, 256, _LANE):
        vmem = 2 * (P * tn + P * d * tn) * 4
        if vmem <= 64 * 1024 * 1024:
            return tn
    return None


def gn_assembly_auto(r, Jr):
    """Fused kernel on TPU, plain-jnp reduces elsewhere."""
    P, d, N = Jr.shape
    tn = gn_assembly_tile_for(P, d, N)
    if tn is not None:
        return gn_assembly_pallas(r, Jr, tile_n=tn)
    return gn_assembly_reference(r, Jr)
