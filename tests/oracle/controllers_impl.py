"""Serial NumPy transcriptions of the reference controller laws.

Independent re-transcriptions (from the C++, not from this repo's
implementations) used to cross-check the engine's Stanley and PurePursuit
controllers on randomized scenarios:

- ``restrict_velocity_to_limits`` — ``controller.cpp:59-84``.
- ``StanleyOracle`` — ``stanley.cpp:30-105`` (law + computeCommand
  sequencing, steering clamp, tan/wheelbase omega).
- ``PurePursuitOracle`` — ``pure_pursuit.cpp:42-155,214-273``
  (speed-scaled lookahead, circle-line intersection with sticky
  last-found index and 1.1x radius growth, curvature law, omni vector
  branch, post-law velocity limiting with curvature-preserving omega
  rescale, goal check).

Both consume targets from :class:`reference_impl.OracleFollower` (itself
validated against the engine in lockstep) so the laws are exercised on
identical tracked state. ``reverse`` driving is not transcribed (the
tests run with ``enable_reverse_driving=False``, the default).
"""

import math

from .reference_impl import OracleFollower, normalize_to_minus_pi_pi

__all__ = [
    "restrict_velocity_to_limits",
    "StanleyOracle",
    "PurePursuitOracle",
]


def restrict_velocity_to_limits(
    current_velocity: float,
    target_velocity: float,
    acceleration_limit: float,
    deceleration_limit: float,
    max_vel: float,
    time_step: float,
) -> float:
    velocity_command = current_velocity
    if current_velocity < target_velocity:
        velocity_command += acceleration_limit * time_step
        if velocity_command > target_velocity:
            velocity_command = target_velocity
    elif current_velocity > target_velocity:
        velocity_command -= deceleration_limit * time_step
        if velocity_command < target_velocity:
            velocity_command = target_velocity
    return min(max(velocity_command, -max_vel), max_vel)


class StanleyOracle:
    """stanley.cpp:30-105 over an OracleFollower target."""

    def __init__(
        self,
        follower: OracleFollower,
        cross_track_gain: float,
        heading_gain: float,
        min_velocity: float,
        wheel_base: float,
        limits,
    ):
        self.follower = follower
        self.cross_track_gain = cross_track_gain
        self.heading_gain = heading_gain
        self.min_velocity = min_velocity
        self.wheel_base = wheel_base
        self.limits = limits
        self.latest_vx = 0.0
        self.latest_omega = 0.0

    def step(self, state, time_step: float):
        closest, heading_error = self.follower.determine_target(state)
        target_speed = self.limits.vx_limits.max_vel  # reverse untranscribed
        control_steering_angle = -self.cross_track_gain * math.atan2(
            closest.parallel_distance,
            max(abs(target_speed), self.min_velocity),
        ) + self.heading_gain * normalize_to_minus_pi_pi(heading_error)

        # computeCommand (stanley.cpp:74-105)
        linear_ctrl = restrict_velocity_to_limits(
            self.latest_vx,
            target_speed,
            self.limits.vx_limits.max_acc,
            self.limits.vx_limits.max_decel,
            self.limits.vx_limits.max_vel,
            time_step,
        )
        max_steer = self.limits.omega_limits.max_steer
        steer = min(max(control_steering_angle, -max_steer), max_steer)
        omega = math.tan(steer) * abs(linear_ctrl) / self.wheel_base
        omega = restrict_velocity_to_limits(
            self.latest_omega,
            omega,
            self.limits.omega_limits.max_acc,
            self.limits.omega_limits.max_decel,
            self.limits.omega_limits.max_vel,
            time_step,
        )
        self.latest_vx = linear_ctrl
        self.latest_omega = omega
        return linear_ctrl, omega, steer


class PurePursuitOracle:
    """pure_pursuit.cpp:42-155 + findLookaheadPoint (:214-273)."""

    def __init__(
        self,
        follower: OracleFollower,
        lookahead_distance: float,
        lookahead_gain_forward: float,
        limits,
        is_omni: bool,
        goal_dist_tolerance: float,
        speed_reg,
    ):
        self.follower = follower
        self.lookahead_distance = lookahead_distance
        self.lookahead_gain_forward = lookahead_gain_forward
        self.limits = limits
        self.is_omni = is_omni
        self.goal_dist_tolerance = goal_dist_tolerance
        # (lookahead, k_curv, k_rot, min_factor) for the speed factor
        self.speed_reg = speed_reg
        self.last_found_index = 0

    def find_lookahead_point(self, state, radius: float):
        xs, ys = self.follower.xs, self.follower.ys
        n = len(xs)
        target = (float(xs[-1]), float(ys[-1]))
        intersection_found = False
        for i in range(self.last_found_index, n - 1):
            p1 = (float(xs[i]), float(ys[i]))
            p2 = (float(xs[i + 1]), float(ys[i + 1]))
            d_x, d_y = p2[0] - p1[0], p2[1] - p1[1]
            f_x, f_y = p1[0] - state[0], p1[1] - state[1]
            a = d_x * d_x + d_y * d_y
            b = 2.0 * (f_x * d_x + f_y * d_y)
            c = (f_x * f_x + f_y * f_y) - radius * radius
            disc = b * b - 4.0 * a * c
            if disc >= 0.0:
                disc = math.sqrt(disc)
                t1 = (-b - disc) / (2.0 * a)
                t2 = (-b + disc) / (2.0 * a)
                if 0.0 <= t2 <= 1.0:
                    target = (p1[0] + t2 * d_x, p1[1] + t2 * d_y)
                    self.last_found_index = i
                    intersection_found = True
                elif 0.0 <= t1 <= 1.0:
                    target = (p1[0] + t1 * d_x, p1[1] + t1 * d_y)
                    self.last_found_index = i
                    intersection_found = True
        if not intersection_found:
            dist_to_end = math.hypot(
                float(xs[-1]) - state[0], float(ys[-1]) - state[1]
            )
            if dist_to_end < radius:
                self.last_found_index = n - 1
                return (float(xs[-1]), float(ys[-1]))
            return self.find_lookahead_point(state, 1.1 * radius)
        return target

    def step(self, state, current_vel, time_step: float):
        """One execute() tick; current_vel = (vx, vy, omega). Returns
        (vx, vy, omega, goal_reached)."""
        # Reference quirk (pure_pursuit.cpp:43-141): execute() never calls
        # determineTarget(), so closestPosition keeps its default index 0
        # (path.h:302) and the speed factor (follower.cpp:329) integrates
        # curvature from the path start on every tick.
        vx0, vy0, w0 = current_vel
        lookahead_val = max(
            math.hypot(vx0, vy0) * self.lookahead_gain_forward,
            self.lookahead_distance,
        )
        target = self.find_lookahead_point(state, lookahead_val)
        dx = target[0] - state[0]
        dy = target[1] - state[1]
        alpha_robot = normalize_to_minus_pi_pi(
            math.atan2(dy, dx) - state[2]
        )
        dist_to_target = math.hypot(dx, dy)

        lk, k_curv, k_rot, min_factor = self.speed_reg
        cmd_v = self.limits.vx_limits.max_vel * self.follower.speed_factor(
            w0, lk, k_curv, k_rot, min_factor
        )

        if self.is_omni and abs(alpha_robot) <= math.pi * 0.9:
            vx = cmd_v * math.cos(alpha_robot)
            vy = cmd_v * math.sin(alpha_robot)
            omega = 2.0 * alpha_robot
        else:
            curvature = 2.0 * math.sin(alpha_robot) / max(
                dist_to_target, 0.001
            )
            vx, vy, omega = cmd_v, 0.0, cmd_v * curvature

        v_safe = restrict_velocity_to_limits(
            vx0,
            vx,
            self.limits.vx_limits.max_acc,
            self.limits.vx_limits.max_decel,
            self.limits.vx_limits.max_vel,
            time_step,
        )
        if abs(vx) > 1e-4:
            omega *= v_safe / vx
        vx = v_safe

        xs, ys = self.follower.xs, self.follower.ys
        dist_to_end = math.hypot(
            float(xs[-1]) - state[0], float(ys[-1]) - state[1]
        )
        if dist_to_end < self.goal_dist_tolerance:
            return 0.0, 0.0, 0.0, True
        return vx, vy, omega, False
