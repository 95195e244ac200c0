from .robot import (  # noqa: F401
    AngularCtrlLimits,
    LinearCtrlLimits,
    MotionModel2D,
    Robot,
    RobotCtrlLimits,
    RobotGeometry,
    RobotState,
    RobotType,
)
