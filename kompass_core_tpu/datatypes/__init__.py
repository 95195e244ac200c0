from .laserscan import LaserScanData  # noqa: F401
from .obstacles import (  # noqa: F401
    OBSTACLE_TYPE,
    OCCUPANCY_TYPE,
    ObstaclesData,
    split_obstacles_by_type,
)
from .path import InterpolationType, ReferencePath  # noqa: F401
from .pointcloud import PointCloudData  # noqa: F401
from .pose import PoseData  # noqa: F401
from .scan_model import ScanModelConfig  # noqa: F401
from .tracking import (  # noqa: F401
    Bbox2D,
    Bbox3D,
    PointsOfInterest,
    TrackedBbox3D,
    TrackedPose2D,
)
