from .robot import (  # noqa: F401
    AckermannControl,
    AngularCtrlLimits,
    DifferentialDriveControl,
    LinearCtrlLimits,
    MotionControl,
    MotionModel2D,
    OmniControl,
    Robot,
    RobotCtrlLimits,
    RobotGeometry,
    RobotState,
    RobotType,
)
