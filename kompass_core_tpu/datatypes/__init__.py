from .laserscan import LaserScanData  # noqa: F401
from .path import InterpolationType, ReferencePath  # noqa: F401
from .pointcloud import PointCloudData  # noqa: F401
