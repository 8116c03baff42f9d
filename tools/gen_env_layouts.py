"""Extract the reference environment zoo layouts into a JSON data asset.

Instantiates every env in /root/reference (read-only) and dumps obstacle
primitive layouts (sphere centers/radii, box centers/sizes, object poses),
workspace limits, and planner hyperparameter presets to
``torch_robotics_tpu/data/env_layouts.json``.  The env classes in
``torch_robotics_tpu.envs`` are driven by this data file.

Usage: python tools/gen_env_layouts.py
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from gen_golden import install_shim  # noqa: E402

OUT = (Path(__file__).resolve().parent.parent / "torch_robotics_tpu" / "data"
       / "env_layouts.json")


def main():
    sys.path.insert(0, "/root/reference")
    install_shim()

    import torch
    from torch_robotics.environments import (
        EnvCircle2D, EnvDense2D, EnvDense2DExtraObjects, EnvGridCircles2D,
        EnvMazeBoxes3D, EnvNarrowPassageDense2D,
        EnvNarrowPassageDense2DExtraObjects, EnvPlanar2Link, EnvSimple2D,
        EnvSimple2DExtraObjects, EnvSpheres3D, EnvSpheres3DExtraObjects,
        EnvSquare2D, EnvTableShelf)
    from torch_robotics.environments.primitives import (
        MultiBoxField, MultiSphereField, MultiSharpBoxField)

    ta = {"device": "cpu", "dtype": torch.float32}

    def encode_field(f):
        if isinstance(f, MultiSphereField):
            return {"type": "spheres", "centers": f.centers.tolist(),
                    "radii": f.radii.tolist()}
        if isinstance(f, MultiBoxField):  # rounded (subclass of sharp)
            return {"type": "rounded_boxes", "centers": f.centers.tolist(),
                    "sizes": f.sizes.tolist()}
        if isinstance(f, MultiSharpBoxField):
            return {"type": "sharp_boxes", "centers": f.centers.tolist(),
                    "sizes": f.sizes.tolist()}
        raise NotImplementedError(type(f))

    def encode_obj(obj):
        return {
            "name": obj.name,
            "pos": obj.pos.tolist(),
            "ori": obj.ori.tolist(),
            "fields": [encode_field(f) for f in obj.fields],
        }

    def planner_params(env, robots):
        out = {}
        for method in ["rrt_connect", "gpmp2", "chomp", "sgpmp", "mpot"]:
            getter = getattr(env, f"get_{method}_params", None)
            if getter is None:
                continue
            for robot in robots:
                try:
                    params = getter(robot=robot)
                except NotImplementedError:
                    continue
                except Exception:
                    continue
                out[method] = {
                    "robot": type(robot).__name__,
                    "params": json.loads(json.dumps(params, default=float)),
                }
                break
        return out

    from torch_robotics.robots.robot_point_mass import RobotPointMass
    pm = RobotPointMass(tensor_args=ta)

    class _FakePanda:
        pass

    # RobotPanda is expensive to build; env getters only isinstance-check it.
    from torch_robotics.robots import robot_panda
    fake_panda = object.__new__(robot_panda.RobotPanda)
    robots = [pm, fake_panda]

    envs = {
        "EnvSimple2D": EnvSimple2D,
        "EnvSimple2DExtraObjects": EnvSimple2DExtraObjects,
        "EnvCircle2D": EnvCircle2D,
        "EnvDense2D": EnvDense2D,
        "EnvDense2DExtraObjects": EnvDense2DExtraObjects,
        "EnvGridCircles2D": EnvGridCircles2D,
        "EnvMazeBoxes3D": EnvMazeBoxes3D,
        "EnvNarrowPassageDense2D": EnvNarrowPassageDense2D,
        "EnvNarrowPassageDense2DExtraObjects": EnvNarrowPassageDense2DExtraObjects,
        "EnvPlanar2Link": EnvPlanar2Link,
        "EnvSpheres3D": EnvSpheres3D,
        "EnvSpheres3DExtraObjects": EnvSpheres3DExtraObjects,
        "EnvSquare2D": EnvSquare2D,
        "EnvTableShelf": EnvTableShelf,
    }

    data = {}
    for name, cls in envs.items():
        env = cls(tensor_args=ta, precompute_sdf_obj_fixed=False)
        data[name] = {
            "limits": env.limits.tolist(),
            "obj_fixed": [encode_obj(o) for o in (env.obj_fixed_list or [])],
            "obj_extra": [encode_obj(o) for o in (env.obj_extra_list or [])],
            "planner_params": planner_params(env, robots),
        }
        print(f"{name}: {len(data[name]['obj_fixed'])} fixed, "
              f"{len(data[name]['obj_extra'])} extra, "
              f"params={list(data[name]['planner_params'])}")

    OUT.write_text(json.dumps(data))
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
