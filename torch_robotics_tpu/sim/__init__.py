from .rollout import (ExecutionResult, PDControllerParams,
                      execute_trajectories)
from .motion_planning_controller import MotionPlanningController
