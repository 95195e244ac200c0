"""Classic-controller law parity vs independent serial oracles.

Drives the engine's Stanley and PurePursuit controllers and the
``tests/oracle/controllers_impl`` transcriptions of ``stanley.cpp:30-105``
/ ``pure_pursuit.cpp:42-155,214-273`` over identical randomized runs
(shared interpolated path, same state sequence), asserting the emitted
commands stay in lockstep: vx, omega, steering angle, lookahead
stickiness, omni vector branch, and the goal-reached cutover."""

import math

import numpy as np
import pytest

from kompass_core_tpu.control import (
    FollowingStatus,
    PurePursuit,
    PurePursuitConfig,
    Stanley,
    StanleyConfig,
)
from kompass_core_tpu.models import (
    AngularCtrlLimits,
    LinearCtrlLimits,
    Robot,
    RobotCtrlLimits,
    RobotGeometry,
    RobotState,
    RobotType,
)

from oracle.controllers_impl import PurePursuitOracle, StanleyOracle
from oracle.reference_impl import OracleFollower


def _robot(robot_type=RobotType.DIFFERENTIAL_DRIVE):
    return Robot(
        robot_type=robot_type,
        geometry_type=RobotGeometry.Type.CYLINDER,
        geometry_params=np.array([0.2, 0.4]),
    )


def _limits():
    return RobotCtrlLimits(
        vx_limits=LinearCtrlLimits(max_vel=1.2, max_acc=3.0, max_decel=5.0),
        omega_limits=AngularCtrlLimits(
            max_vel=2.5, max_acc=6.0, max_decel=6.0, max_steer=1.2
        ),
    )


def _random_path(rng, n=20, step=0.5):
    heading = rng.uniform(-math.pi / 4, math.pi / 4)
    pts = [(0.0, 0.0)]
    for _ in range(n - 1):
        heading += rng.uniform(-0.4, 0.4)
        pts.append(
            (
                pts[-1][0] + step * math.cos(heading),
                pts[-1][1] + step * math.sin(heading),
            )
        )
    return pts


@pytest.mark.parametrize("seed", [3, 17, 29])
def test_stanley_law_lockstep(seed):
    rng = np.random.default_rng(seed)
    limits = _limits()
    cfg = StanleyConfig(
        cross_track_gain=1.5,
        heading_gain=2.0,
        wheel_base=0.4,
    )
    ctrl = Stanley(robot=_robot(), ctrl_limits=limits, config=cfg)
    ctrl.set_path(_random_path(rng))

    path = ctrl.interpolated_path()
    o = StanleyOracle(
        follower=OracleFollower(
            path.xs, path.ys, list(path.segment_starts), path.curvature
        ),
        cross_track_gain=cfg.cross_track_gain,
        heading_gain=cfg.heading_gain,
        min_velocity=cfg.cross_track_min_linear_vel,
        wheel_base=cfg.wheel_base,
        limits=limits,
    )

    n = path.size()
    dt = 0.1
    for tick in range(40):
        frac = min(tick / 35.0, 1.0)
        idx = int(frac * (n - 1))
        x = float(path.xs[idx] + rng.uniform(-0.15, 0.15))
        y = float(path.ys[idx] + rng.uniform(-0.15, 0.15))
        yaw = rng.uniform(-math.pi, math.pi)
        result = ctrl.execute(RobotState(x=x, y=y, yaw=yaw), dt)
        o_vx, o_omega, o_steer = o.step((x, y, yaw), dt)
        if result.status != FollowingStatus.COMMAND_FOUND:
            break
        cmd = result.velocity_command
        # the engine's closest-point scan runs in the native host lib's
        # float32; the oracle is float64 — tolerances match the follower
        # lockstep test's
        np.testing.assert_allclose(cmd.vx, o_vx, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(cmd.omega, o_omega, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(
            cmd.steer_ang, o_steer, rtol=1e-5, atol=1e-7
        )


@pytest.mark.parametrize("seed", [5, 23])
@pytest.mark.parametrize("robot_type", [RobotType.DIFFERENTIAL_DRIVE, RobotType.OMNI])
def test_pure_pursuit_law_lockstep(seed, robot_type):
    rng = np.random.default_rng(seed)
    limits = _limits()
    cfg = PurePursuitConfig(
        lookahead_distance=0.6,
        lookahead_gain_forward=0.8,
        goal_dist_tolerance=0.15,
    )
    ctrl = PurePursuit(robot=_robot(robot_type), ctrl_limits=limits, config=cfg)
    ctrl.set_path(_random_path(rng))

    path = ctrl.interpolated_path()
    o = PurePursuitOracle(
        follower=OracleFollower(
            path.xs, path.ys, list(path.segment_starts), path.curvature
        ),
        lookahead_distance=cfg.lookahead_distance,
        lookahead_gain_forward=cfg.lookahead_gain_forward,
        limits=limits,
        is_omni=(robot_type == RobotType.OMNI),
        goal_dist_tolerance=cfg.goal_dist_tolerance,
        speed_reg=(
            cfg.lookahead_distance,
            cfg.speed_regulation_curvature,
            cfg.speed_regulation_angular,
            cfg.min_speed_regulation_factor,
        ),
    )

    n = path.size()
    dt = 0.1
    vel = (0.0, 0.0, 0.0)
    for tick in range(40):
        frac = min(tick / 35.0, 1.0)
        idx = int(frac * (n - 1))
        x = float(path.xs[idx] + rng.uniform(-0.1, 0.1))
        y = float(path.ys[idx] + rng.uniform(-0.1, 0.1))
        yaw = rng.uniform(-math.pi / 2, math.pi / 2)

        ctrl.set_current_state(x, y, yaw)
        ctrl._current_vel = vel
        result = ctrl.execute(dt)
        o_vx, o_vy, o_omega, o_goal = o.step((x, y, yaw), vel, dt)

        assert o.last_found_index == ctrl._last_found_index
        if o_goal:
            assert result.status == FollowingStatus.GOAL_REACHED
            break
        assert result.status == FollowingStatus.COMMAND_FOUND
        cmd = result.velocity_command
        np.testing.assert_allclose(cmd.vx, o_vx, rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(cmd.vy, o_vy, rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(cmd.omega, o_omega, rtol=1e-5, atol=1e-7)
        # feed the emitted command back as the next tick's velocity so the
        # accel limiter and speed-scaled lookahead both stay exercised
        vel = (float(cmd.vx), float(cmd.vy), float(cmd.omega))


def test_pure_pursuit_speed_factor_integrates_from_path_start():
    """Reference quirk pin (pure_pursuit.cpp:43-141 + follower.cpp:329):
    execute() never calls determineTarget(), so the exponential speed
    factor always integrates |curvature| from the default closestPosition
    index 0 — the PATH START — even when the robot is far along the path.
    A hairpin at the start must therefore still throttle the command when
    the robot sits on the straight tail."""
    limits = _limits()
    cfg = PurePursuitConfig(
        # lookahead covers the interpolated hairpin (corner lands at arc
        # ~0.85 m after spline resampling)
        lookahead_distance=1.2,
        lookahead_gain_forward=0.8,
        goal_dist_tolerance=0.05,
        speed_regulation_curvature=1.0,
        speed_regulation_angular=0.001,
    )
    # hairpin at the start, then a long straight run in +x
    bend = [
        (0.0, 0.0),
        (0.3, 0.3),
        (0.0, 0.6),
        (0.3, 0.9),
        (0.6, 0.9),
    ]
    straight = [(0.6 + 0.5 * i, 0.9) for i in range(1, 14)]
    ctrl = PurePursuit(robot=_robot(), ctrl_limits=limits, config=cfg)
    ctrl.set_path(bend + straight)

    # robot mid-way down the straight segment, aligned with it
    ctrl.set_current_state(4.0, 0.9, 0.0)
    ctrl._current_vel = (0.5, 0.0, 0.0)
    factor = ctrl.exponential_speed_factor(0.0)
    # local curvature here is ~0; only start-of-path integration explains
    # a throttled factor
    assert factor < 0.9, factor

    result = ctrl.execute(0.1)
    assert result.status == FollowingStatus.COMMAND_FOUND
    assert result.velocity_command.vx <= factor * limits.vx_limits.max_vel + 1e-9

    # the closest position must never advance through the public loop
    ctrl.loop_step(current_state=RobotState(x=4.5, y=0.9, yaw=0.0, vx=0.5))
    assert ctrl._closest.index == 0
