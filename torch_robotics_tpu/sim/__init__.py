from .rollout import (ExecutionResult, PDControllerParams,
                      execute_trajectories)
from .motion_planning_controller import MotionPlanningController

try:
    from .mujoco_adapter import (MujocoExecutionEnv, MujocoExecutionResult,
                                 build_mj_spec)
except ImportError:                      # mujoco not installed
    MujocoExecutionEnv = MujocoExecutionResult = build_mj_spec = None
