"""Environment base: workspace + obstacle objects + optional SDF grids.

TPU-native re-design of the reference ``EnvBase``
(/root/reference/torch_robotics/environments/env_base.py): an environment owns
the workspace limits, fixed/extra ``ObjectField`` lists, an optionally
precomputed ``GridSDF`` over the fixed objects (env_base.py:57-65), an
occupancy map builder (env_base.py:99-107), the min-over-objects SDF query
(env_base.py:140-169), and per-planner hyperparameter presets
(env_base.py:254-263).
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp

from ..geom import (ObjectField, build_occupancy_map, precompute_sdf_grid)

__all__ = ["EnvBase"]


class EnvBase:
    def __init__(self,
                 name: str = "EnvBase",
                 limits=None,
                 obj_fixed_list: Optional[Sequence[ObjectField]] = None,
                 obj_extra_list: Optional[Sequence[ObjectField]] = None,
                 precompute_sdf_obj_fixed: bool = False,
                 sdf_cell_size: float = 0.005,
                 planner_params: Optional[dict] = None):
        assert limits is not None
        self.name = name
        self.limits = jnp.asarray(limits)
        self.dim = self.limits.shape[-1]
        self.obj_fixed_list = list(obj_fixed_list or [])
        self.obj_extra_list = (list(obj_extra_list)
                               if obj_extra_list is not None else None)
        self.obj_all_list = self.obj_fixed_list + (self.obj_extra_list or [])
        self._planner_params = planner_params or {}

        self.grid_map_sdf_obj_fixed = None
        self.sdf_cell_size = sdf_cell_size
        if precompute_sdf_obj_fixed:
            self.grid_map_sdf_obj_fixed = precompute_sdf_grid(
                self.limits, sdf_cell_size, self.obj_fixed_list)

        self.occupancy_map = None
        self.cell_size = None

    # ------------------------------------------------------------------
    # Object / distance-field access (env_base.py:72-97)
    # ------------------------------------------------------------------
    def get_obj_list(self) -> List[ObjectField]:
        return self.obj_all_list

    def get_df_obj_list(self, return_extra_objects_only: bool = False):
        """Distance-field objects for cost evaluation (env_base.py:75-88):
        the fixed objects are replaced by the precomputed grid when present."""
        df_obj_l = []
        if not return_extra_objects_only:
            if self.grid_map_sdf_obj_fixed is not None:
                df_obj_l.append(self.grid_map_sdf_obj_fixed)
            else:
                df_obj_l.extend(self.obj_fixed_list)
        if self.obj_extra_list is not None:
            df_obj_l.extend(self.obj_extra_list)
        return df_obj_l

    def build_occupancy_map(self, cell_size: float = 0.01):
        self.cell_size = cell_size
        self.occupancy_map = build_occupancy_map(
            self.limits, cell_size, self.obj_all_list)
        return self.occupancy_map

    def compute_sdf(self, x):
        """Min-over-objects SDF at world points (env_base.py:140-169)."""
        sdf = None
        if self.grid_map_sdf_obj_fixed is not None:
            sdf = self.grid_map_sdf_obj_fixed(x)
        else:
            for obj in self.obj_fixed_list:
                s = obj.signed_distance(x)
                sdf = s if sdf is None else jnp.minimum(sdf, s)
        if self.obj_extra_list is not None:
            for obj in self.obj_extra_list:
                s = obj.signed_distance(x)
                sdf = s if sdf is None else jnp.minimum(sdf, s)
        return sdf

    # ------------------------------------------------------------------
    # Planner hyperparameter presets (env_base.py:254-263)
    # ------------------------------------------------------------------
    def _get_params(self, method: str, robot=None):
        entry = self._planner_params.get(method)
        if entry is None:
            raise NotImplementedError(
                f"{self.name} has no {method} preset")
        expected = entry.get("robot")
        if robot is not None and expected is not None:
            robot_name = getattr(robot, "name", type(robot).__name__)
            if expected not in (robot_name, type(robot).__name__):
                raise NotImplementedError(
                    f"{self.name} {method} preset is for {expected}, "
                    f"got {robot_name}")
        return dict(entry["params"])

    def get_rrt_connect_params(self, robot=None):
        return self._get_params("rrt_connect", robot)

    def get_gpmp2_params(self, robot=None):
        return self._get_params("gpmp2", robot)

    def get_chomp_params(self, robot=None):
        return self._get_params("chomp", robot)

    def get_sgpmp_params(self, robot=None):
        return self._get_params("sgpmp", robot)

    def get_mpot_params(self, robot=None):
        return self._get_params("mpot", robot)

    # ------------------------------------------------------------------
    # Rendering (host-side; env_base.py:119-252)
    # ------------------------------------------------------------------
    def render(self, ax=None):
        from ..viz.render_env import render_env
        render_env(self, ax)

    def render_sdf(self, ax=None, fig=None):
        from ..viz.render_env import render_env_sdf
        render_env_sdf(self, ax, fig)

    def render_grad_sdf(self, ax=None, fig=None):
        from ..viz.render_env import render_env_grad_sdf
        render_env_grad_sdf(self, ax, fig)
