"""Data-path resolution + yaml loading.

Mirrors the reference path helpers
(/root/reference/torch_robotics/torch_kinematics_tree/utils/files.py).  Data
assets (URDF robot descriptions and collision-sphere yaml configs) are
vendored under ``torch_robotics_tpu/data``.
"""
from __future__ import annotations

from pathlib import Path

import yaml


def get_data_path() -> Path:
    return Path(__file__).resolve().parent.parent / "data"


def get_urdf_path() -> Path:
    return get_data_path() / "urdf"


def get_robot_path() -> Path:
    return get_urdf_path() / "robots"


def get_objects_path() -> Path:
    return get_urdf_path() / "objects"


def get_configs_path() -> Path:
    return get_data_path() / "configs"


def load_yaml(filename):
    with open(filename, "r") as stream:
        return yaml.safe_load(stream)
