"""Differentiable planning objectives (cost fields) as pure functions.

TPU-native re-design of the reference cost-field class hierarchy
(/root/reference/torch_robotics/torch_planning_objectives/fields/distance_fields.py):
the shape-dispatching ``DistanceField.compute_cost`` (distance_fields.py:26-55)
disappears — every function here takes ``(..., P, dim)`` collision points (any
number of leading batch/horizon dims) and returns ``(...)`` costs, so batching
is vmap/broadcasting instead of einops reshapes.

Cost semantics parity (distance_fields.py:107-130):
- 'sdf' cost per waypoint: sum over points of max over objects of
  (margin - sdf), optionally relu-clamped;
- 'occupancy': any(sdf < margin) over points and objects;
- self-collision uses distances between configured point pairs with per-pair
  margins (distance_fields.py:194-215);
- workspace bounds treat each face distance as an object row
  (distance_fields.py:326-332);
- EE field is the (squared) SE(3) distance of the last link
  (distance_fields.py:335-359).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.se3 import SE3_distance

__all__ = [
    "interpolate_points", "interpolate_points_v2", "object_signed_distances",
    "object_collision_cost", "object_collision_any", "object_collision_rbf",
    "self_collision_distances", "self_collision_cost", "self_collision_any",
    "self_collision_rbf", "workspace_bounds_distances",
    "workspace_bounds_cost", "workspace_bounds_any", "ee_se3_cost",
]


def interpolate_points(points, num_interpolated_points: int):
    """Linearly resample P points to N points along the point axis.

    jnp equivalent of the reference ``interpolate_points_v1``
    (distance_fields.py:66-69), i.e. 1-D linear interpolation with
    align_corners=True semantics.
    points: (..., P, d) -> (..., N, d)
    """
    P = points.shape[-2]
    N = num_interpolated_points
    if N == P:
        return points
    if P == 1:
        return jnp.repeat(points, N, axis=-2)
    pos = jnp.linspace(0.0, P - 1.0, N, dtype=points.dtype)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, P - 2)
    frac = (pos - i0.astype(points.dtype))[..., None]
    return points[..., i0, :] * (1.0 - frac) + points[..., i0 + 1, :] * frac


def interpolate_points_v2(points, num_interpolate: int,
                          link_interpolate_range):
    """Append points interpolated between consecutive links of a range.

    jnp equivalent of the reference ``interpolate_points_v2``
    (distance_fields.py:73-82): for links in
    ``link_interpolate_range=[lo, hi]`` (inclusive), insert
    ``num_interpolate`` evenly spaced interior points on each segment
    between consecutive link positions, concatenated after the originals.
    points: (..., P, d) -> (..., P + (hi - lo) * num_interpolate, d)
    """
    if num_interpolate <= 0:
        return points
    lo, hi = link_interpolate_range
    alpha = jnp.linspace(0.0, 1.0, num_interpolate + 2,
                         dtype=points.dtype)[1:num_interpolate + 1]
    X = points[..., lo:hi + 1, :]                     # (..., L, d)
    X_diff = X[..., 1:, :] - X[..., :-1, :]           # (..., L-1, d)
    #  (..., L-1, num_interpolate, d)
    X_interp = (X[..., :-1, None, :]
                + X_diff[..., None, :] * alpha[:, None])
    flat = X_interp.reshape(X_interp.shape[:-3]
                            + (X_interp.shape[-3] * num_interpolate,
                               points.shape[-1]))
    return jnp.concatenate([points, flat], axis=-2)


# ----------------------------------------------------------------------------
# Obstacle (object) collision
# ----------------------------------------------------------------------------
def object_signed_distances(df_obj_list: Sequence, points):
    """Stack SDFs of each distance-field object.

    df_obj_list: objects with ``signed_distance`` (ObjectField or GridSDF) —
    the env's ``get_df_obj_list`` (env_base.py:75-88).
    points: (..., P, dim) -> (..., n_objs, P)
    """
    sdfs = [df.signed_distance(points) for df in df_obj_list]
    return jnp.stack(sdfs, axis=-2)


def object_collision_cost(df_obj_list, points, margins, cutoff_margin=0.0,
                          clamp=False):
    """'sdf'-type obstacle cost per waypoint (distance_fields.py:112-124).

    points: (..., P, dim); margins: (P,) or scalar -> (...)
    """
    sd = object_signed_distances(df_obj_list, points)
    cost = -(sd - (margins + cutoff_margin))
    if clamp:
        cost = jax.nn.relu(cost)
    cost = jnp.max(cost, axis=-2)          # max over objects
    return jnp.sum(cost, axis=-1)          # sum over points


def object_collision_any(df_obj_list, points, margins, cutoff_margin=0.0):
    """'occupancy'-type obstacle check (distance_fields.py:283-291)."""
    sd = object_signed_distances(df_obj_list, points)
    coll = sd < (margins + cutoff_margin)
    return jnp.any(jnp.any(coll, axis=-1), axis=-1)


def object_collision_rbf(df_obj_list, points, margin):
    """'rbf' field-type obstacle cost: exp(-sdf(x)^2 / (2 margin^2)) summed
    over objects and points.

    The reference dispatches this third field type in
    ``compute_embodiment_cost`` (distance_fields.py:110-112) with the
    object-field formula at distance_fields.py:274-278 — dormant there (the
    method body opens with ``raise NotImplementedError``); revived here
    with the documented math, like ``core/manifold.py``.  A smooth
    occupancy surrogate: 1 on the surface, decaying over ``margin``.
    points: (..., P, dim), margin: scalar -> (...)
    """
    sd = object_signed_distances(df_obj_list, points)
    rbf = jnp.exp(jnp.square(sd) / (-2.0 * margin ** 2))
    return jnp.sum(rbf, axis=(-1, -2))


# ----------------------------------------------------------------------------
# Self collision
# ----------------------------------------------------------------------------
def self_collision_distances(points, pair_idxs):
    """Distances between configured point pairs.

    The reference builds a full P x P distance matrix then gathers
    (distance_fields.py:194-208); gathering the pairs directly is the same
    math with O(n_pairs) work.
    points: (..., P, d); pair_idxs: (n_pairs, 2) -> (..., n_pairs)
    """
    from ..geom.sdf import safe_norm
    pair_idxs = np.asarray(pair_idxs)
    a = points[..., pair_idxs[:, 0], :]
    b = points[..., pair_idxs[:, 1], :]
    return safe_norm(a - b, axis=-1)


def self_collision_cost(points, pair_idxs, margins, clamp=False):
    """'sdf'-type self-collision cost: sum over pairs of (margin - d)."""
    d = self_collision_distances(points, pair_idxs)
    cost = -(d - margins)
    if clamp:
        cost = jax.nn.relu(cost)
    return jnp.sum(cost, axis=-1)


def self_collision_any(points, pair_idxs, margins):
    d = self_collision_distances(points, pair_idxs)
    return jnp.any(d < margins, axis=-1)


def self_collision_rbf(points, margin):
    """'rbf' field-type self-collision cost: the full P x P matrix of
    exp(-||p_i - p_j||^2 / (2 margin^2)) summed over both axes (reference
    formula distance_fields.py:187-192, dormant there behind a
    ``raise NotImplementedError``; summation per
    ``compute_embodiment_cost``, distance_fields.py:110-112).  Includes
    the diagonal (each point contributes a constant 1) exactly like the
    reference expression.
    points: (..., P, d), margin: scalar -> (...)
    """
    diff = points[..., :, None, :] - points[..., None, :, :]
    d2 = jnp.sum(jnp.square(diff), axis=-1)
    rbf = jnp.exp(d2 / (-2.0 * margin ** 2))
    return jnp.sum(rbf, axis=(-1, -2))


# ----------------------------------------------------------------------------
# Workspace boundaries
# ----------------------------------------------------------------------------
def workspace_bounds_distances(points, ws_min, ws_max):
    """Signed distances of points to each workspace face.

    points: (..., P, dim) -> (..., 2*dim, P) (faces act as 'objects';
    distance_fields.py:326-332).
    """
    d = jnp.concatenate([points - ws_min, ws_max - points], axis=-1)
    return jnp.swapaxes(d, -1, -2)


def workspace_bounds_cost(points, ws_min, ws_max, margins, cutoff_margin=0.0,
                          clamp=False):
    sd = workspace_bounds_distances(points, ws_min, ws_max)
    cost = -(sd - (margins + cutoff_margin))
    if clamp:
        cost = jax.nn.relu(cost)
    return jnp.sum(jnp.max(cost, axis=-2), axis=-1)


def workspace_bounds_any(points, ws_min, ws_max, margins, cutoff_margin=0.0):
    sd = workspace_bounds_distances(points, ws_min, ws_max)
    coll = sd < (margins + cutoff_margin)
    return jnp.any(jnp.any(coll, axis=-1), axis=-1)


# ----------------------------------------------------------------------------
# End-effector SE(3) tracking
# ----------------------------------------------------------------------------
def ee_se3_cost(link_tensor, target_H, w_pos=1.0, w_rot=1.0, square=True):
    """SE(3) distance of the last link to a target pose.

    link_tensor: (..., L, 4, 4); target_H: (4, 4) -> (...)
    (distance_fields.py:335-359)
    """
    dist = SE3_distance(link_tensor[..., -1, :, :], target_H,
                        w_pos=w_pos, w_rot=w_rot)
    return jnp.square(dist) if square else dist
