"""Environment zoo, driven by the extracted layout data asset.

The 14 reference environments
(/root/reference/torch_robotics/environments/__init__.py:1-14) are defined by
their obstacle layouts (sphere/box primitive coordinates), workspace limits
and planner presets.  Those are data, not code — they live in
``torch_robotics_tpu/data/env_layouts.json`` (extracted by
tools/gen_env_layouts.py) and are instantiated here into geom pytrees.
"""
from __future__ import annotations

import json
from functools import lru_cache

import jax.numpy as jnp

from ..geom.sdf import (MultiBoxField, MultiSharpBoxField, MultiSphereField,
                        ObjectField)
from ..utils.files import get_data_path
from .base import EnvBase

__all__ = [
    "make_env", "available_envs",
    "EnvSimple2D", "EnvSimple2DExtraObjects", "EnvCircle2D", "EnvDense2D",
    "EnvDense2DExtraObjects", "EnvGridCircles2D", "EnvMazeBoxes3D",
    "EnvNarrowPassageDense2D", "EnvNarrowPassageDense2DExtraObjects",
    "EnvPlanar2Link", "EnvSpheres3D", "EnvSpheres3DExtraObjects",
    "EnvSquare2D", "EnvTableShelf",
]


@lru_cache(maxsize=1)
def _layouts() -> dict:
    path = get_data_path() / "env_layouts.json"
    return json.loads(path.read_text())


def _build_field(spec: dict, dtype):
    if spec["type"] == "spheres":
        return MultiSphereField(spec["centers"], spec["radii"], dtype=dtype)
    if spec["type"] == "rounded_boxes":
        return MultiBoxField(spec["centers"], spec["sizes"], dtype=dtype)
    if spec["type"] == "sharp_boxes":
        return MultiSharpBoxField(spec["centers"], spec["sizes"], dtype=dtype)
    raise NotImplementedError(spec["type"])


def _build_object(spec: dict, dtype):
    fields = [_build_field(f, dtype) for f in spec["fields"]]
    return ObjectField.create(fields, name=spec["name"], pos=spec["pos"],
                              ori=spec["ori"], dtype=dtype)


def available_envs():
    return sorted(_layouts().keys())


# Planner presets tuned HERE, beyond what the reference ships (the layouts
# JSON carries only reference-extracted presets).  EnvDense2D MPOT: the
# reference has a preset only for the regular GridCircles2D scene; dense
# random clutter wants bigger Sinkhorn steps, deeper probes and more OT
# iterations — two-round sweep 2026-08-20 (benchmarks/mpot_dense2d_sweep.py)
# took the mpot->GN-polish pipeline from 0.594 to 0.906 fraction
# collision-free at ~8 s wall (remaining MPOTParams fields keep their
# GridCircles2D-derived defaults).
_TUNED_PLANNER_PARAMS = {
    "EnvDense2D": {
        "mpot": {
            "robot": "RobotPointMass",
            "params": {"opt_iters": 300, "step_radius": 0.07,
                       "probe_radius": 0.09, "num_probe": 9},
        },
    },
}


def make_env(name: str, precompute_sdf_obj_fixed: bool = False,
             sdf_cell_size: float = 0.005, dtype=jnp.float32) -> EnvBase:
    spec = _layouts()[name]
    return EnvBase(
        name=name,
        limits=jnp.asarray(spec["limits"], dtype),
        obj_fixed_list=[_build_object(o, dtype) for o in spec["obj_fixed"]],
        obj_extra_list=([_build_object(o, dtype) for o in spec["obj_extra"]]
                        if spec["obj_extra"] else None),
        precompute_sdf_obj_fixed=precompute_sdf_obj_fixed,
        sdf_cell_size=sdf_cell_size,
        planner_params={**spec["planner_params"],
                        **_TUNED_PLANNER_PARAMS.get(name, {})},
    )


def _make_ctor(env_name: str):
    def ctor(precompute_sdf_obj_fixed: bool = False,
             sdf_cell_size: float = 0.005, dtype=jnp.float32) -> EnvBase:
        return make_env(env_name,
                        precompute_sdf_obj_fixed=precompute_sdf_obj_fixed,
                        sdf_cell_size=sdf_cell_size, dtype=dtype)
    ctor.__name__ = env_name
    ctor.__doc__ = f"Construct {env_name} (layout parity with the reference)."
    return ctor


EnvSimple2D = _make_ctor("EnvSimple2D")
EnvSimple2DExtraObjects = _make_ctor("EnvSimple2DExtraObjects")
EnvCircle2D = _make_ctor("EnvCircle2D")
EnvDense2D = _make_ctor("EnvDense2D")
EnvDense2DExtraObjects = _make_ctor("EnvDense2DExtraObjects")
EnvGridCircles2D = _make_ctor("EnvGridCircles2D")
EnvMazeBoxes3D = _make_ctor("EnvMazeBoxes3D")
EnvNarrowPassageDense2D = _make_ctor("EnvNarrowPassageDense2D")
EnvNarrowPassageDense2DExtraObjects = _make_ctor("EnvNarrowPassageDense2DExtraObjects")
EnvPlanar2Link = _make_ctor("EnvPlanar2Link")
EnvSpheres3D = _make_ctor("EnvSpheres3D")
EnvSpheres3DExtraObjects = _make_ctor("EnvSpheres3DExtraObjects")
EnvSquare2D = _make_ctor("EnvSquare2D")
EnvTableShelf = _make_ctor("EnvTableShelf")
