from .planner import (  # noqa: F401
    GlobalPlanner,
    GlobalPlannerConfig,
    OMPLGeometric,
    planner_registry,
)
