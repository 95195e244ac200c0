"""2D/3D pose container with quaternion orientation.

Covers the role of the reference's ``datatypes/pose.py`` (PoseData) plus the
relative-pose helpers from ``utils/geometry.py`` that the mapper uses.
Planar math only (yaw about z) — the navigation stack is 2D.
"""

import math

import numpy as np
from attrs import define, field


@define
class PoseData:
    """Position + quaternion orientation (x, y, z, qx, qy, qz, qw)."""

    x: float = field(default=0.0)
    y: float = field(default=0.0)
    z: float = field(default=0.0)
    qx: float = field(default=0.0)
    qy: float = field(default=0.0)
    qz: float = field(default=0.0)
    qw: float = field(default=1.0)

    def set_position(self, x: float, y: float, z: float = 0.0):
        self.x, self.y, self.z = float(x), float(y), float(z)

    def set_yaw(self, yaw: float):
        self.qx = self.qy = 0.0
        self.qz = math.sin(yaw / 2.0)
        self.qw = math.cos(yaw / 2.0)

    def get_position(self) -> np.ndarray:
        return np.array([self.x, self.y, self.z])

    def get_yaw(self) -> float:
        return math.atan2(
            2.0 * (self.qw * self.qz + self.qx * self.qy),
            1.0 - 2.0 * (self.qy * self.qy + self.qz * self.qz),
        )


def get_relative_pose(pose_1_in_ref: PoseData, pose_2_in_ref: PoseData) -> PoseData:
    """Pose of frame 2 expressed in frame 1 (planar)."""
    yaw1 = pose_1_in_ref.get_yaw()
    dx = pose_2_in_ref.x - pose_1_in_ref.x
    dy = pose_2_in_ref.y - pose_1_in_ref.y
    c, s = math.cos(-yaw1), math.sin(-yaw1)
    rel = PoseData()
    rel.set_position(c * dx - s * dy, s * dx + c * dy, pose_2_in_ref.z - pose_1_in_ref.z)
    rel.set_yaw(pose_2_in_ref.get_yaw() - yaw1)
    return rel


def transform_point_from_local_to_global(
    point_local: PoseData, frame_in_global: PoseData
) -> PoseData:
    """Express a point given in a local frame in the global frame (planar)."""
    yaw = frame_in_global.get_yaw()
    c, s = math.cos(yaw), math.sin(yaw)
    out = PoseData()
    out.set_position(
        frame_in_global.x + c * point_local.x - s * point_local.y,
        frame_in_global.y + s * point_local.x + c * point_local.y,
        frame_in_global.z + point_local.z,
    )
    out.set_yaw(yaw + point_local.get_yaw())
    return out
