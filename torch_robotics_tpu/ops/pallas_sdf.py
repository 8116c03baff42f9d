"""Pallas TPU kernels for large-scene SDF queries.

For the small primitive counts of the env zoo (10-50 spheres) the
lane-vectorized jnp path in ``ops/lanes_fk.py`` is optimal.  For LARGE sphere
sets — point-cloud obstacles, sphere-decomposed meshes with hundreds to
thousands of spheres — the min-distance query becomes an (M points x S
spheres) problem whose dominant term 2 p.c is a matmul: this kernel computes
the distance matrix on the MXU in (block_m x S) tiles held in VMEM, fusing
the min-reduction, and never materializes the (M, S) matrix in HBM.

sdf(p_i) = min_j ||p_i - c_j|| - r_j
         = min_j sqrt(|p_i|^2 + |c_j|^2 - 2 p_i . c_j) - r_j
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sphere_sdf_pallas", "sphere_sdf_reference"]

_BLOCK_M = 512
_LANE = 128


def sphere_sdf_reference(points, centers, radii):
    """Plain-jnp reference: (M, 3), (S, 3), (S,) -> (M,)."""
    d = jnp.linalg.norm(points[:, None, :] - centers[None, :, :], axis=-1)
    return jnp.min(d - radii, axis=-1)


def _kernel(p_ref, c_ref, meta_ref, out_ref):
    """One (block_m, S_pad) tile.

    p_ref: (block_m, 8) points (xyz padded to 8 sublanes);
    c_ref: (8, S_pad) centers^T padded;
    meta_ref: (2, S_pad): row 0 = |c|^2 - is-real mask encoded via +inf on
    padding, row 1 = radii.
    """
    p = p_ref[:, :]                                    # (bm, 8)
    c = c_ref[:, :]                                    # (8, S_pad)
    # -2 p.c on the MXU; the padded coordinate rows are zero on both sides.
    # HIGHEST precision: the default bf16 MXU pass loses ~1e-1 absolute on
    # the cancellation-prone |p|^2+|c|^2-2p.c form.
    cross = jnp.dot(p, c, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    p_sq = jnp.sum(p * p, axis=-1, keepdims=True)      # (bm, 1)
    c_sq_masked = meta_ref[0, :][None, :]              # (1, S_pad) +inf pads
    radii = meta_ref[1, :][None, :]
    d2 = p_sq + c_sq_masked - 2.0 * cross
    d = jnp.sqrt(jnp.maximum(d2, 0.0)) - radii
    out_ref[:, 0] = jnp.min(d, axis=-1)


@partial(jax.jit, static_argnames=("interpret",))
def sphere_sdf_pallas(points, centers, radii, interpret: bool = False):
    """Fused MXU sphere-SDF query: (M, 3), (S, 3), (S,) -> (M,)."""
    M = points.shape[0]
    S = centers.shape[0]
    S_pad = ((S + _LANE - 1) // _LANE) * _LANE
    M_pad = ((M + _BLOCK_M - 1) // _BLOCK_M) * _BLOCK_M

    p = jnp.zeros((M_pad, 8), jnp.float32).at[:M, :3].set(points)
    c = jnp.zeros((8, S_pad), jnp.float32).at[:3, :S].set(centers.T)
    c_sq = jnp.sum(jnp.square(centers), axis=-1)
    big = jnp.asarray(3.4e38, jnp.float32)
    meta = jnp.full((2, S_pad), 0.0, jnp.float32)
    meta = meta.at[0, :S].set(c_sq).at[0, S:].set(big)
    meta = meta.at[1, :S].set(radii)

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((M_pad, 1), jnp.float32),
        grid=(M_pad // _BLOCK_M,),
        in_specs=[
            pl.BlockSpec((_BLOCK_M, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, S_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, S_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_M, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(p, c, meta)
    return out[:M, 0]
