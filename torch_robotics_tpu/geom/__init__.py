from .sdf import (
    Spheres, SharpBoxes, RoundedBoxes, ObjectField,
    MultiSphereField, MultiSharpBoxField, MultiBoxField,
)
from .grid_sdf import GridSDF, precompute_sdf_grid
from .occupancy import OccupancyMap, build_occupancy_map
from .objects import GraspedObject, GraspedObjectPandaBox
from .point_cloud import PointCloudSpheres
