"""Geometry helpers: angle conversion, quaternions, frame transforms.

Role of the reference's ``utils/geometry.py:10-335``.
"""

import math
from typing import Tuple

import numpy as np

from .angles import normalize_to_0_2pi, normalize_to_minus_pi_pi

convert_to_0_2pi = normalize_to_0_2pi
convert_to_plus_minus_pi = normalize_to_minus_pi_pi


def add_angle(angle1: float, angle2: float) -> float:
    """Wrap-aware angle addition into (-pi, pi] (reference
    ``utils/geometry.py:335-352``)."""
    result = angle1 + angle2
    if result > math.pi:
        result -= 2 * math.pi
    if result <= -math.pi:
        result += 2 * math.pi
    return result


def quaternion_from_euler(roll: float, pitch: float, yaw: float) -> np.ndarray:
    """(x, y, z, w) quaternion from intrinsic ZYX euler angles."""
    cy, sy = math.cos(yaw / 2), math.sin(yaw / 2)
    cp, sp = math.cos(pitch / 2), math.sin(pitch / 2)
    cr, sr = math.cos(roll / 2), math.sin(roll / 2)
    return np.array(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ]
    )


def euler_from_quaternion(q) -> Tuple[float, float, float]:
    """(roll, pitch, yaw) from an (x, y, z, w) quaternion."""
    x, y, z, w = (float(v) for v in q)
    roll = math.atan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    sinp = 2 * (w * y - z * x)
    pitch = math.copysign(math.pi / 2, sinp) if abs(sinp) >= 1 else math.asin(sinp)
    yaw = math.atan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return roll, pitch, yaw


def yaw_from_quaternion(q) -> float:
    x, y, z, w = (float(v) for v in q)
    return math.atan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))


def quaternion_multiply(q1, q2) -> np.ndarray:
    x1, y1, z1, w1 = q1
    x2, y2, z2, w2 = q2
    return np.array(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ]
    )


def quaternion_inverse(q) -> np.ndarray:
    x, y, z, w = q
    n = x * x + y * y + z * z + w * w
    return np.array([-x, -y, -z, w]) / n


def rotation_matrix_2d(yaw: float) -> np.ndarray:
    c, s = math.cos(yaw), math.sin(yaw)
    return np.array([[c, -s], [s, c]])


def transform_points_2d(points, yaw: float, translation) -> np.ndarray:
    """Rotate-then-translate a set of [N, 2] points."""
    return np.asarray(points) @ rotation_matrix_2d(yaw).T + np.asarray(translation)


def from_frame1_to_frame2_2d(
    x_in_1: float, y_in_1: float, frame1_x: float, frame1_y: float,
    frame1_yaw: float,
) -> Tuple[float, float]:
    """Express a point given in frame 1 in the frame that contains frame 1
    at (x, y, yaw)."""
    c, s = math.cos(frame1_yaw), math.sin(frame1_yaw)
    return frame1_x + c * x_in_1 - s * y_in_1, frame1_y + s * x_in_1 + c * y_in_1


def distance(x1: float, y1: float, x2: float, y2: float) -> float:
    return math.hypot(x2 - x1, y2 - y1)


def probability_of_collision(
    mean_distance: float, sigma: float, collision_radius: float
) -> float:
    """Gaussian collision probability within the collision radius (used by
    the dynamic-obstacle motion cost)."""
    if sigma <= 0:
        return 1.0 if mean_distance <= collision_radius else 0.0
    z = (collision_radius - mean_distance) / (sigma * math.sqrt(2.0))
    return 0.5 * (1.0 + math.erf(z))


def probability_of_collision_array(
    mean_distance: np.ndarray, sigma: np.ndarray, collision_radius: float
) -> np.ndarray:
    """Vectorized ``probability_of_collision`` over arrays (broadcasts)."""
    from scipy.special import erf

    mean_distance = np.asarray(mean_distance, np.float64)
    sigma = np.asarray(sigma, np.float64)
    z = (collision_radius - mean_distance) / (
        np.maximum(sigma, 1e-300) * math.sqrt(2.0)
    )
    soft = 0.5 * (1.0 + erf(z))
    hard = (mean_distance <= collision_radius).astype(np.float64)
    return np.where(sigma <= 0, hard, soft)
