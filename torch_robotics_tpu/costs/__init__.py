from .fields import (
    interpolate_points, object_signed_distances, object_collision_cost,
    object_collision_any, object_collision_rbf, self_collision_distances,
    self_collision_cost, self_collision_any, self_collision_rbf,
    workspace_bounds_distances, workspace_bounds_cost,
    workspace_bounds_any, ee_se3_cost,
)
