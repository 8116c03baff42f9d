from .planning_task import PlanningTask
