"""Offline motion-cost evaluation (Python-side cost library).

Role of the reference's ``motion_cost.py:19-438``: weighted cost terms for
offline trajectory evaluation — static collision, dynamic-obstacle collision
probability, and reference-tracking costs — over recorded/simulated paths.
Vectorized numpy.
"""

import math
from typing import Optional

import numpy as np
from attrs import define, field

from .datatypes.path_sample import ObstaclesData, PathSample
from .utils.config import BaseAttrs, base_validators
from .utils.angles import normalize_to_minus_pi_pi
from .utils.geometry import (
    probability_of_collision,  # noqa: F401 — public, re-exported
    probability_of_collision_array,
)


class MotionCost:
    """Base weighted cost (reference ``motion_cost.py:19-57``)."""

    def __init__(self, weight: float, margin: float):
        self.weight = float(weight)
        self.margin = float(margin)
        self.cost = 0.0

    def set_params(self, weight: float, margin: float):
        self.weight = float(weight)
        self.margin = float(margin)

    def __call__(self) -> float:
        return self.weight * self.cost


class CollisionCost(MotionCost):
    """Collision cost base with a robot-footprint collision radius."""

    def __init__(self, weight: float, margin: float, robot_radius: float):
        super().__init__(weight, margin)
        self.robot_radius = float(robot_radius)

    @property
    def collision_limit_radius(self) -> float:
        return self.robot_radius + self.margin


class StaticCollisionCost(CollisionCost):
    """Min-clearance cost against static obstacles
    (reference ``motion_cost.py:95-155``): 1 at contact, linear decay to 0
    at margin distance beyond the footprint."""

    def __call__(
        self, path: PathSample, obstacles: ObstaclesData
    ) -> float:
        if len(obstacles) == 0 or len(path) == 0:
            self.cost = 0.0
            return 0.0
        obs_x = np.asarray(obstacles.x_global, float)
        obs_y = np.asarray(obstacles.y_global, float)
        zone = np.asarray(obstacles.occupied_zone, float)
        dx = path.x_points[:, None] - obs_x[None, :]
        dy = path.y_points[:, None] - obs_y[None, :]
        d = np.sqrt(dx * dx + dy * dy) - zone[None, :]
        min_d = float(np.min(d))
        clearance = min_d - self.robot_radius
        if clearance <= 0:
            self.cost = 1.0
        elif clearance >= self.margin:
            self.cost = 0.0
        else:
            self.cost = (self.margin - clearance) / self.margin
        return self.weight * self.cost


class DynamicCollisionProbabilityCost(CollisionCost):
    """Collision probability against moving obstacles with positional
    uncertainty (reference ``motion_cost.py:156-256``): per path point,
    propagate each obstacle by its velocity to the point's timestamp and
    integrate a Gaussian collision probability."""

    def __init__(
        self, weight: float, margin: float, robot_radius: float,
        position_sigma: float = 0.2,
    ):
        super().__init__(weight, margin, robot_radius)
        self.position_sigma = position_sigma

    def __call__(
        self,
        path: PathSample,
        obstacles: ObstaclesData,
        time_points: Optional[np.ndarray] = None,
    ) -> float:
        if len(obstacles) == 0 or len(path) == 0:
            self.cost = 0.0
            return 0.0
        t = (
            np.asarray(time_points)
            if time_points is not None
            else np.zeros(len(path))
        )
        obs_x = np.asarray(obstacles.x_global, float)
        obs_y = np.asarray(obstacles.y_global, float)
        obs_vx = np.asarray(obstacles.vx, float)
        obs_vy = np.asarray(obstacles.vy, float)
        ox = obs_x[None, :] + obs_vx[None, :] * t[:, None]
        oy = obs_y[None, :] + obs_vy[None, :] * t[:, None]
        d = np.sqrt(
            (path.x_points[:, None] - ox) ** 2
            + (path.y_points[:, None] - oy) ** 2
        )
        sigma_t = self.position_sigma * (1.0 + t[:, None])
        # one vectorized erf over the whole [points, obstacles] block —
        # the per-element Python loop was ~ms per call and grew linearly
        probs = probability_of_collision_array(
            d, np.broadcast_to(sigma_t, d.shape), self.collision_limit_radius
        )
        self.cost = float(1.0 - np.prod(1.0 - np.max(probs, axis=1)))
        return self.weight * self.cost


class ReferenceCost(MotionCost):
    """Tracking error costs vs a reference path
    (reference ``motion_cost.py:258-360``): mean lateral distance, end-point
    distance, and mean heading error."""

    def __init__(self, weight: float, margin: float = 0.0):
        super().__init__(weight, margin)
        self.lateral_error = 0.0
        self.heading_error = 0.0
        self.end_error = 0.0

    def __call__(self, path: PathSample, reference: PathSample) -> float:
        if len(path) == 0 or len(reference) == 0:
            self.cost = 0.0
            return 0.0
        dx = path.x_points[:, None] - reference.x_points[None, :]
        dy = path.y_points[:, None] - reference.y_points[None, :]
        d = np.sqrt(dx * dx + dy * dy)
        nearest = np.argmin(d, axis=1)
        self.lateral_error = float(np.mean(np.min(d, axis=1)))
        dh = normalize_to_minus_pi_pi(
            path.heading_points - reference.heading_points[nearest]
        )
        self.heading_error = float(np.mean(np.abs(dh)))
        self.end_error = float(
            math.hypot(
                path.x_points[-1] - reference.x_points[-1],
                path.y_points[-1] - reference.y_points[-1],
            )
        )
        self.cost = self.lateral_error + self.end_error + self.heading_error
        return self.weight * self.cost


@define
class MotionCostsParams(BaseAttrs):
    """Weights/margins bundle (reference ``motion_cost.py:362-438``)."""

    static_collision_weight: float = field(
        default=1.0, validator=base_validators.in_range(0.0, 1e3)
    )
    dynamic_collision_weight: float = field(
        default=1.0, validator=base_validators.in_range(0.0, 1e3)
    )
    reference_weight: float = field(
        default=1.0, validator=base_validators.in_range(0.0, 1e3)
    )
    collision_margin: float = field(
        default=0.3, validator=base_validators.in_range(0.0, 1e2)
    )

    def build(self, robot_radius: float):
        return {
            "static_collision": StaticCollisionCost(
                self.static_collision_weight, self.collision_margin, robot_radius
            ),
            "dynamic_collision": DynamicCollisionProbabilityCost(
                self.dynamic_collision_weight, self.collision_margin, robot_radius
            ),
            "reference": ReferenceCost(self.reference_weight),
        }
