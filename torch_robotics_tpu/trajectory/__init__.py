from .utils import (finite_difference_vector, interpolate_traj_via_points,
                    smoothen_trajectory)
from .metrics import (compute_path_length, compute_smoothness,
                      compute_variance_waypoints)
