"""Recorded path / trajectory / motion sample containers.

Equivalents of the reference's ``datatypes/path.py`` (PathPoint, PathSample,
TrajectorySample, MotionSample) and ``datatypes/obstacles.py``
(ObstaclesData): SoA numpy containers used by the offline simulation,
evaluation and calibration tools.
"""

from typing import Union

import numpy as np


class PathPoint:
    """Single global path point."""

    def __init__(self, idx=0, x=0.0, y=0.0, heading=0.0, speed=0.0):
        self.idx = int(idx)
        self.x = float(x)
        self.y = float(y)
        self.heading = float(heading)
        self.speed = float(speed)

    def __sub__(self, other: "PathPoint") -> "PathPoint":
        return PathPoint(
            x=self.x - other.x,
            y=self.y - other.y,
            heading=self.heading - other.heading,
        )

    def __add__(self, other: "PathPoint") -> "PathPoint":
        return PathPoint(
            x=self.x + other.x,
            y=self.y + other.y,
            heading=self.heading + other.heading,
        )

    def __truediv__(self, value: Union[int, float]) -> "PathPoint":
        return PathPoint(x=self.x / value, y=self.y / value, heading=self.heading)


class PathSample:
    """Fixed-length SoA path."""

    def __init__(self, length: int, frame_id: str = "map"):
        self.x_points = np.zeros(length, dtype=float)
        self.y_points = np.zeros(length, dtype=float)
        self.heading_points = np.zeros(length, dtype=float)
        self.frame_id = frame_id

    def set_path(self, x_points, y_points, heading_points):
        self.x_points = np.asarray(x_points, dtype=float)
        self.y_points = np.asarray(y_points, dtype=float)
        self.heading_points = np.asarray(heading_points, dtype=float)

    def set_point(self, idx: int, x: float, y: float, heading: float = 0.0):
        self.x_points[idx] = x
        self.y_points[idx] = y
        self.heading_points[idx] = heading

    def __len__(self):
        return len(self.x_points)


class TrajectorySample(PathSample):
    """Path + applied control + timestamps."""

    def __init__(self, length: int, frame_id: str = "map"):
        super().__init__(length, frame_id)
        self.time_points = np.zeros(length, dtype=float)
        self.vx_points = np.zeros(length, dtype=float)
        self.vy_points = np.zeros(length, dtype=float)
        self.omega_points = np.zeros(length, dtype=float)

    def set_sample_point(
        self, idx, time, x, y, heading, vx=0.0, vy=0.0, omega=0.0
    ):
        self.set_point(idx, x, y, heading)
        self.time_points[idx] = time
        self.vx_points[idx] = vx
        self.vy_points[idx] = vy
        self.omega_points[idx] = omega

    @property
    def time(self) -> np.ndarray:
        """Reference field name for the timestamps array
        (``datatypes/path.py:126-180``)."""
        return self.time_points

    def set_traj_point(
        self, x: float, y: float, heading: float, time: float, idx: int
    ):
        """Sets pose + timestamp at an index (reference
        ``datatypes/path.py:183-199``)."""
        self.set_point(idx, x, y, heading)
        self.time_points[idx] = time


class MotionSample(TrajectorySample):
    """Recorded robot motion (state sequence + control sequence), the input
    to motion-model calibration."""

    CSV_NAMES = [
        "time",
        "x",
        "y",
        "heading",
        "speed",
        "linear_control_x",
        "linear_control_y",
        "angular_control",
    ]

    def __init__(self, length: int, frame_id: str = "map"):
        super().__init__(length, frame_id)
        self.speed_points = np.zeros(length, dtype=float)

    def set_control_point(
        self,
        linear_control_x: float,
        linear_control_y: float,
        angular_control: float,
        idx: int,
    ):
        """Sets the commanded control at an index (reference
        ``datatypes/path.py:308-332``; the [N, 3] control matrix is the
        vx/vy/omega SoA columns here)."""
        self.vx_points[idx] = linear_control_x
        self.vy_points[idx] = linear_control_y
        self.omega_points[idx] = angular_control

    def save_to_csv(self, file_location: str, file_name: str) -> bool:
        """Saves the motion record to csv (reference
        ``datatypes/path.py:414-448``); stdlib csv writer, no pandas."""
        import csv
        import os

        if not os.path.exists(file_location):
            return False
        if not file_name.lower().endswith(".csv"):
            file_name += ".csv"
        columns = [
            self.time_points,
            self.x_points,
            self.y_points,
            self.heading_points,
            self.speed_points,
            self.vx_points,
            self.vy_points,
            self.omega_points,
        ]
        with open(os.path.join(file_location, file_name), "w", newline="") as f:
            writer = csv.writer(f)
            writer.writerow(self.CSV_NAMES)
            writer.writerows(zip(*columns))
        return True


class Point2D:
    """2D point (reference ``datatypes/path.py:561-568``)."""

    def __init__(self, x: float = 0.0, y: float = 0.0):
        self.x = float(x)
        self.y = float(y)


class Range2D:
    """2D range limits (reference ``datatypes/path.py:571-577``)."""

    def __init__(self, min_val: float = 0.0, max_val: float = 0.0):
        self.min_val = float(min_val)
        self.max_val = float(max_val)


class InterpolationPoint:
    """Interpolated path point: arc length + coordinates + pitch
    (reference ``datatypes/path.py:529-538``)."""

    def __init__(self, s, x, y, pitch):
        self.s = s
        self.x = x
        self.y = y
        self.pitch = pitch


class TrackedPoint:
    """Extended interpolated path point used for path following
    (reference ``datatypes/path.py:542-558``)."""

    def __init__(self):
        self.s = 0.0
        self.x = 0.0
        self.y = 0.0
        self.tangent_ori = 0.0
        self.lat_dist = 0.0
        self.curv = 0.0
        self.ori_err = 0.0
        self.s_dot = 0.0
        self.lat_vel = 0.0
        self.pitch = 0.0
        self.forward_dist = 0.0


class PathTrackingError:
    """Path tracking errors (reference ``datatypes/path.py:580-591``)."""

    def __init__(self):
        self.orientation_error = 0.0
        self.lateral_distance_error = 0.0

    def set(self, ori_error: float, lat_error: float):
        self.orientation_error = ori_error
        self.lateral_distance_error = lat_error


class Odom2D:
    """2D odometry (reference ``datatypes/path.py:594-608``)."""

    def __init__(self):
        self.x = 0.0
        self.y = 0.0
        self.ori = 0.0
        self.speed = 0.0

    def set(self, x, y, ori, speed):
        self.x = x
        self.y = y
        self.ori = ori
        self.speed = speed


# the canonical ObstaclesData lives in datatypes/obstacles.py (full
# reference API); re-exported here for backwards compatibility with the
# offline tools that grew up importing it from this module
from .obstacles import ObstaclesData  # noqa: E402,F401
