from .follower import Follower, FollowerConfig, FollowingTarget  # noqa: F401
from .result import FollowingResult, FollowingStatus, VelocityCommand  # noqa: F401
from .trajectory_costs import TrajectoryCostsWeights  # noqa: F401
from .dwa import DWA, DWAConfig  # noqa: F401
from .pid import PID  # noqa: F401
from .stanley import Stanley, StanleyConfig  # noqa: F401
from .pure_pursuit import PurePursuit, PurePursuitConfig  # noqa: F401
from .dvz import DVZ, DVZConfig  # noqa: F401

ControlClasses = {
    "DWA": DWA,
    "Stanley": Stanley,
    "PurePursuit": PurePursuit,
    "DVZ": DVZ,
}

from .vision_followers import (  # noqa: F401
    VisionRGBDFollower,
    VisionRGBDFollowerConfig,
    VisionRGBFollower,
    VisionRGBFollowerConfig,
)

ControlClasses.update(
    {
        "VisionRGBFollower": VisionRGBFollower,
        "VisionRGBDFollower": VisionRGBDFollower,
    }
)
