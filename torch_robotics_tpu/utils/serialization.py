"""Serialization of precomputed artifacts (SDF grids, kinematic models).

The reference recomputes its SDF grids in-process and never persists them
(SURVEY.md §5: checkpoint/resume = none).  For multi-host deployments the
grids and compiled robot models are precomputed once and loaded per worker;
this module persists them as .npz archives (pure numpy, no extra deps).
"""
from __future__ import annotations

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..geom.grid_sdf import GridSDF
from ..kin.model import KinematicModel

__all__ = ["save_grid_sdf", "load_grid_sdf", "save_kinematic_model",
           "load_kinematic_model"]


def save_grid_sdf(path, grid: GridSDF) -> None:
    np.savez_compressed(
        path,
        limits=np.asarray(grid.limits),
        sdf_grid=np.asarray(grid.sdf_grid),
        grad_grid=np.asarray(grid.grad_grid),
        cmap_dim=np.asarray(grid.cmap_dim, np.int64),
    )


def load_grid_sdf(path) -> GridSDF:
    data = np.load(path)
    return GridSDF(
        limits=jnp.asarray(data["limits"]),
        sdf_grid=jnp.asarray(data["sdf_grid"]),
        grad_grid=jnp.asarray(data["grad_grid"]),
        cmap_dim=tuple(int(v) for v in data["cmap_dim"]),
    )


_MODEL_ARRAY_FIELDS = [
    "joint_trans", "joint_fixed_rot", "joint_axis", "rot_mask", "prism_mask",
    "clamp_lower", "clamp_upper", "q_map", "q_lower", "q_upper", "q_velocity",
    "q_effort", "joint_damping",
]
_MODEL_META_FIELDS = ["name", "link_names", "joint_names", "parent_idx",
                      "joint_types", "n_dofs"]


def save_kinematic_model(path, model: KinematicModel) -> None:
    arrays = {f: np.asarray(getattr(model, f)) for f in _MODEL_ARRAY_FIELDS}
    meta = {f: getattr(model, f) for f in _MODEL_META_FIELDS}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta, default=list).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_kinematic_model(path) -> KinematicModel:
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    kwargs = {f: jnp.asarray(data[f]) for f in _MODEL_ARRAY_FIELDS}
    kwargs["q_map"] = jnp.asarray(data["q_map"], jnp.int32)
    kwargs.update(
        name=meta["name"],
        link_names=tuple(meta["link_names"]),
        joint_names=tuple(meta["joint_names"]),
        parent_idx=tuple(meta["parent_idx"]),
        joint_types=tuple(meta["joint_types"]),
        n_dofs=int(meta["n_dofs"]),
    )
    return KinematicModel(**kwargs)
