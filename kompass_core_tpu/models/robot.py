"""Robot models: geometry, kinematic types, control limits, and 2D state.

API-equivalent to the reference front-end's ``models.py``
(``/root/reference/src/kompass_core/models.py:14-1407``): ``RobotType``,
``RobotGeometry`` (+``Type``), ``RobotState`` with a calibratable 2D motion
model, control-limit containers, and the ``Robot`` aggregate used by all
controllers. Implementation is original (plain attrs + numpy).
"""

import math
from enum import Enum
from typing import List, Optional

import numpy as np
from attrs import Factory, define, field

from ..utils.angles import normalize_to_minus_pi_pi
from ..utils.config import BaseAttrs, base_validators


class RobotType(Enum):
    """Kinematic class of the robot base."""

    ACKERMANN = "ACKERMANN"
    DIFFERENTIAL_DRIVE = "DIFFERENTIAL_DRIVE"
    OMNI = "OMNI"

    @classmethod
    def values(cls) -> List[str]:
        return [m.value for m in cls]

    @classmethod
    def from_str(cls, value):
        if isinstance(value, cls):
            return value
        for m in cls:
            if value == m.value or value == str(m):
                return m
        raise ValueError(f"{value} is not a valid RobotType")


class RobotGeometry:
    """Robot geometry types, parameter validation and derived quantities.

    Parameter conventions (same as reference ``models.py:656-`):
    CYLINDER=(radius, height), BOX=(x, y, z), SPHERE=(radius,),
    ELLIPSOID=(x, y, z), CAPSULE=(radius, height), CONE=(radius, height).
    """

    class Type(Enum):
        BOX = "BOX"
        CYLINDER = "CYLINDER"
        SPHERE = "SPHERE"
        ELLIPSOID = "ELLIPSOID"
        CAPSULE = "CAPSULE"
        CONE = "CONE"

        @classmethod
        def values(cls) -> List[str]:
            return [m.value for m in cls]

        @classmethod
        def from_str(cls, value):
            if isinstance(value, cls):
                return value
            for m in cls:
                if value == m.value or value == str(m):
                    return m
            raise ValueError(f"{value} is not a valid RobotGeometry.Type")

    PARAMS_LENGTH = {
        "BOX": 3,
        "CYLINDER": 2,
        "SPHERE": 1,
        "ELLIPSOID": 3,
        "CAPSULE": 2,
        "CONE": 2,
    }

    _ROUND = ("CYLINDER", "SPHERE", "CAPSULE", "CONE")

    @classmethod
    def is_valid_parameters(cls, geometry_type, parameters) -> bool:
        required = cls.PARAMS_LENGTH[geometry_type.value]
        return len(parameters) == required and all(p > 0 for p in parameters)

    @classmethod
    def get_wheelbase(cls, geometry_type, parameters) -> float:
        if not cls.is_valid_parameters(geometry_type, parameters):
            raise ValueError("Invalid parameters for the robot geometry")
        if geometry_type.value in cls._ROUND:
            return float(parameters[0])
        return float(parameters[1])

    @classmethod
    def get_radius(cls, geometry_type, parameters) -> float:
        """Circumscribed planar radius used by the point-robot collision
        model (reference collision model: ``collision_check.cpp:38-55``
        — cylinder/sphere radius, box half-diagonal)."""
        if not cls.is_valid_parameters(geometry_type, parameters):
            raise ValueError("Invalid parameters for the robot geometry")
        if geometry_type.value in cls._ROUND:
            return float(parameters[0])
        # box-like: half diagonal of the (x, y) footprint
        return float(
            math.sqrt(parameters[0] ** 2 + parameters[1] ** 2) / 2.0
        )

    @classmethod
    def get_height(cls, geometry_type, parameters) -> float:
        if not cls.is_valid_parameters(geometry_type, parameters):
            raise ValueError("Invalid parameters for the robot geometry")
        t = geometry_type.value
        if t in ("CYLINDER", "CAPSULE", "CONE", "ELLIPSOID"):
            return float(parameters[-1])
        if t == "SPHERE":
            return float(parameters[0] * 2.0)
        return float(parameters[2])


@define
class MotionModel2D(BaseAttrs):
    """Calibratable proportional 2D motion model.

    x_dot = a_xx * vx * cos(yaw) - a_xy * vy * sin(yaw)
    y_dot = a_yx * vx * sin(yaw) + a_yy * vy * cos(yaw)
    yaw_dot = a_w * omega

    Defaults (all 1.0) give the ideal unicycle model, identical to the
    reference rollout kinematics ``datatypes/path.h:24-30``.
    """

    x_dot_prop_vx: float = field(default=1.0)
    x_dot_prop_vy: float = field(default=1.0)
    y_dot_prop_vx: float = field(default=1.0)
    y_dot_prop_vy: float = field(default=1.0)
    yaw_dot_prop_omega: float = field(default=1.0)

    def apply(self, state_xyyaw: np.ndarray, v_x, v_y, omega, dt) -> np.ndarray:
        x, y, yaw = state_xyyaw
        c, s = math.cos(yaw), math.sin(yaw)
        return np.array(
            [
                x + (self.x_dot_prop_vx * v_x * c - self.x_dot_prop_vy * v_y * s) * dt,
                y + (self.y_dot_prop_vx * v_x * s + self.y_dot_prop_vy * v_y * c) * dt,
                yaw + self.yaw_dot_prop_omega * omega * dt,
            ]
        )


@define
class RobotState:
    """2D robot state (pose + velocity)."""

    model: MotionModel2D = field(default=Factory(MotionModel2D))
    x: float = field(default=0.0)
    y: float = field(default=0.0)
    yaw: float = field(default=0.0)
    speed: float = field(default=0.0)
    vx: float = field(default=0.0)
    vy: float = field(default=0.0)
    omega: float = field(default=0.0)

    def simulate(self, v_x: float, omega: float, dt: float, v_y: float = 0.0):
        """Advance the pose one step with the motion model and update the
        signed speed (sign convention mirrors reference
        ``models.py:238-268``)."""
        new = self.model.apply(
            np.array([self.x, self.y, self.yaw]), v_x=v_x, v_y=v_y, omega=omega, dt=dt
        )
        dir_robot = np.sign(normalize_to_minus_pi_pi(new[2]))
        dir_x = np.sign(new[0] - self.x) * dir_robot
        dir_y = np.sign(new[1] - self.y) * dir_robot
        dir_speed = -1.0 if (dir_x < 0 and dir_y < 0) else 1.0
        self.speed = dir_speed * math.hypot(new[0] - self.x, new[1] - self.y)
        self.x, self.y, self.yaw = float(new[0]), float(new[1]), float(new[2])


@define
class LinearCtrlLimits(BaseAttrs):
    """Forward/lateral velocity limits (m/s, m/s^2)."""

    max_vel: float = field(default=1.0)
    max_acc: float = field(default=10.0)
    max_decel: float = field(default=10.0)


@define
class AngularCtrlLimits(BaseAttrs):
    """Angular velocity limits (rad/s, rad/s^2) and max steering angle."""

    max_vel: float = field(default=1.0)
    max_acc: float = field(default=10.0)
    max_decel: float = field(default=10.0)
    max_steer: float = field(default=math.pi)


@define
class RobotCtrlLimits(BaseAttrs):
    """Full control-limit set (vx, vy, omega)."""

    vx_limits: LinearCtrlLimits = field(default=Factory(LinearCtrlLimits))
    omega_limits: AngularCtrlLimits = field(default=Factory(AngularCtrlLimits))
    vy_limits: LinearCtrlLimits = field(default=Factory(LinearCtrlLimits))

    def to_array(self) -> np.ndarray:
        """Flat float32 array consumed by the device solver:
        [vx_max, vx_acc, vx_dec, vy_max, vy_acc, vy_dec, w_max, w_acc, w_dec].
        """
        return np.array(
            [
                self.vx_limits.max_vel,
                self.vx_limits.max_acc,
                self.vx_limits.max_decel,
                self.vy_limits.max_vel,
                self.vy_limits.max_acc,
                self.vy_limits.max_decel,
                self.omega_limits.max_vel,
                self.omega_limits.max_acc,
                self.omega_limits.max_decel,
            ],
            dtype=np.float32,
        )


@define
class Robot:
    """Aggregate of kinematic type, geometry and current state/control."""

    robot_type: RobotType = field(
        default=RobotType.DIFFERENTIAL_DRIVE, converter=RobotType.from_str
    )
    geometry_type: RobotGeometry.Type = field(
        default=RobotGeometry.Type.CYLINDER, converter=RobotGeometry.Type.from_str
    )
    geometry_params: np.ndarray = field(
        default=Factory(lambda: np.array([0.2, 0.5]))
    )
    state: RobotState = field(default=Factory(RobotState))
    ctrl_vx: float = field(default=0.0)
    ctrl_vy: float = field(default=0.0)
    ctrl_omega: float = field(default=0.0)

    @geometry_params.validator
    def _check_geometry(self, _attr, value):
        if not RobotGeometry.is_valid_parameters(self.geometry_type, value):
            raise ValueError(
                f"Invalid geometry parameters {value} for {self.geometry_type}"
            )

    @property
    def wheelbase(self) -> float:
        return RobotGeometry.get_wheelbase(self.geometry_type, self.geometry_params)

    @property
    def radius(self) -> float:
        return RobotGeometry.get_radius(self.geometry_type, self.geometry_params)

    def set_control(
        self, velocity_x: float = 0.0, velocity_y: float = 0.0, omega: float = 0.0
    ) -> None:
        self.ctrl_vx = float(velocity_x)
        self.ctrl_vy = float(velocity_y)
        self.ctrl_omega = float(omega)

    def get_state(self, dt: float) -> RobotState:
        """Apply the last set control for ``dt`` seconds and return the
        updated state (mirrors the reference test-sim contract)."""
        self.state.simulate(self.ctrl_vx, self.ctrl_omega, dt, v_y=self.ctrl_vy)
        self.state.vx = self.ctrl_vx
        self.state.vy = self.ctrl_vy
        self.state.omega = self.ctrl_omega
        return self.state


class MotionControl:
    """Kinematic control conversion base (role of the reference's
    ``MotionControl`` family, ``models.py:883-1194``): maps a body-frame
    velocity command (vx, vy, omega) to actuator-space quantities."""

    def __init__(
        self,
        velocity_x: float = 0.0,
        velocity_y: float = 0.0,
        omega: float = 0.0,
        wheel_base: float = 0.3,
    ):
        self.vx = float(velocity_x)
        self.vy = float(velocity_y)
        self.omega = float(omega)
        self.wheel_base = float(wheel_base)

    def update_ctr(self, *, omega: float, velocity_x: float, velocity_y: float = 0.0):
        self.vx = float(velocity_x)
        self.vy = float(velocity_y)
        self.omega = float(omega)


class DifferentialDriveControl(MotionControl):
    """Body command -> left/right wheel linear speeds."""

    @property
    def left_wheel_speed(self) -> float:
        return self.vx - self.omega * self.wheel_base / 2.0

    @property
    def right_wheel_speed(self) -> float:
        return self.vx + self.omega * self.wheel_base / 2.0

    def from_wheel_speeds(self, left: float, right: float):
        self.vx = (left + right) / 2.0
        self.omega = (right - left) / self.wheel_base
        return self


class AckermannControl(MotionControl):
    """Body command -> bicycle-model steering angle."""

    @property
    def steering_angle(self) -> float:
        if abs(self.vx) < 1e-9:
            return 0.0
        return math.atan(self.omega * self.wheel_base / self.vx)

    def from_steering(self, velocity_x: float, steering_angle: float):
        self.vx = float(velocity_x)
        self.omega = (
            math.tan(steering_angle) * velocity_x / self.wheel_base
        )
        return self


class OmniControl(MotionControl):
    """Holonomic base: body command -> wheel speeds of a 4-wheel mecanum
    base (+-45 deg rollers, square footprint of half-diagonal wheel_base)."""

    @property
    def wheel_speeds(self):
        l = self.wheel_base / 2.0
        return (
            self.vx - self.vy - l * self.omega,
            self.vx + self.vy + l * self.omega,
            self.vx + self.vy - l * self.omega,
            self.vx - self.vy + l * self.omega,
        )


def restrict_velocity_to_limits(
    current_velocity: float,
    target_velocity: float,
    acceleration_limit: float,
    deceleration_limit: float,
    max_vel: float,
    time_step: float,
) -> float:
    """Trapezoidal velocity limiting (reference ``controller.cpp:59-84``)."""
    cmd = current_velocity
    if current_velocity < target_velocity:
        cmd = min(current_velocity + acceleration_limit * time_step, target_velocity)
    elif current_velocity > target_velocity:
        cmd = max(current_velocity - deceleration_limit * time_step, target_velocity)
    return max(-max_vel, min(max_vel, cmd))
