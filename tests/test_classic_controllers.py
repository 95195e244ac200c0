"""Closed-loop tests for the classic follower controllers.

Mirrors the reference's ``test_controllers.py`` scenarios: Stanley, DVZ and
PurePursuit must each drive the robot to the end of the curved global path;
PID matches its textbook law.
"""

import numpy as np
import pytest

from kompass_core_tpu.control import (
    DVZ,
    PID,
    PurePursuit,
    PurePursuitConfig,
    Stanley,
    StanleyConfig,
)
from kompass_core_tpu.datatypes.laserscan import LaserScanData
from kompass_core_tpu.models import (
    AngularCtrlLimits,
    LinearCtrlLimits,
    Robot,
    RobotCtrlLimits,
    RobotGeometry,
    RobotType,
)

from test_dwa_closed_loop import make_global_path, run_control


@pytest.fixture
def robot():
    return Robot(
        robot_type=RobotType.ACKERMANN,
        geometry_type=RobotGeometry.Type.CYLINDER,
        geometry_params=np.array([0.1, 0.4]),
    )


@pytest.fixture
def ctrl_limits():
    return RobotCtrlLimits(
        vx_limits=LinearCtrlLimits(max_vel=1.0, max_acc=5.0, max_decel=10.0),
        omega_limits=AngularCtrlLimits(
            max_vel=4.0, max_acc=3.0, max_decel=3.0, max_steer=np.pi
        ),
    )


def test_stanley_reaches_goal(robot, ctrl_limits):
    controller = Stanley(
        robot=robot,
        ctrl_limits=ctrl_limits,
        config=StanleyConfig(cross_track_gain=1.5, heading_gain=2.0),
        control_time_step=0.1,
    )
    reached, steps = run_control(controller, make_global_path(), robot, 0.1)
    assert reached, f"Stanley did not reach the goal ({steps} steps)"


def test_pure_pursuit_reaches_goal(robot, ctrl_limits):
    controller = PurePursuit(
        robot=robot,
        ctrl_limits=ctrl_limits,
        config=PurePursuitConfig(
            wheel_base=robot.wheelbase,
            lookahead_gain_forward=1.0,
            # neutralize the curvature-sum speed regulation: per-point
            # curvature spikes at interpolation knots (follower.cpp:319-353
            # sums raw per-point curvature) would otherwise pin the speed
            # factor at its minimum for most of this short path
            speed_regulation_curvature=1e-3,
            speed_regulation_angular=1e-3,
        ),
        control_time_step=0.1,
    )
    reached, steps = run_control(controller, make_global_path(), robot, 0.1)
    assert reached, f"PurePursuit did not reach the goal ({steps} steps)"


def test_dvz_reaches_goal(robot, ctrl_limits):
    controller = DVZ(robot=robot, ctrl_limits=ctrl_limits, control_time_step=0.1)
    reached, steps = run_control(controller, make_global_path(), robot, 0.1)
    assert reached, f"DVZ did not reach the goal ({steps} steps)"


def test_dvz_slows_near_obstacles(robot, ctrl_limits):
    """Close frontal intrusion must reduce the linear command relative to
    free space."""
    free = DVZ(robot=robot, ctrl_limits=ctrl_limits, control_time_step=0.1)
    blocked = DVZ(robot=robot, ctrl_limits=ctrl_limits, control_time_step=0.1)
    path = np.array([[0.0, 0.0], [3.0, 0.0]])
    for c in (free, blocked):
        c.set_path(path)
    state = robot.state
    state.x, state.y, state.yaw = 0.0, 0.0, 0.0

    angles = np.linspace(0, 2 * np.pi, 72, endpoint=False)
    clear = LaserScanData(ranges=np.full(72, 10.0), angles=angles)
    close = np.full(72, 10.0)
    close[:4] = 0.4  # intrusion straight ahead
    close[-4:] = 0.4
    wall = LaserScanData(ranges=close, angles=angles)

    for _ in range(5):
        free.loop_step(laser_scan=clear, current_state=state)
        blocked.loop_step(laser_scan=wall, current_state=state)
    assert blocked._dvz_linear < free._dvz_linear


def test_pure_pursuit_stops_for_blocking_wall(robot, ctrl_limits):
    controller = PurePursuit(
        robot=robot,
        ctrl_limits=ctrl_limits,
        config=PurePursuitConfig(wheel_base=robot.wheelbase),
        control_time_step=0.1,
    )
    controller.set_path(np.array([[0.0, 0.0], [3.0, 0.0]]))
    state = robot.state
    state.x, state.y, state.yaw = 0.0, 0.0, 0.0
    state.vx = 0.5
    # dense wall arc ahead
    angles = np.linspace(-1.2, 1.2, 41)
    scan = LaserScanData(ranges=np.full(41, 0.35), angles=angles)
    ok = controller.loop_step(current_state=state, laser_scan=scan)
    assert ok
    # nominal command collides -> must deviate or stop; rollout of the
    # returned command must stay collision-free
    cmd = controller._result.velocity_command
    assert not controller._check_command_collisions(cmd, 0.1)


def test_pid_textbook_values():
    pid = PID(kp=2.0, ki=0.5, kd=0.1)
    # first step: e=1, integral=1, derivative=1
    u1 = pid.compute(target=1.0, current=0.0, delta_time=0.1)
    assert u1 == pytest.approx(2.0 * 1 + 0.5 * 1 * 0.1 + 0.1 * 1 / 0.1)
    # second step with same error: derivative zero, integral=2
    u2 = pid.compute(target=1.0, current=0.0, delta_time=0.1)
    assert u2 == pytest.approx(2.0 * 1 + 0.5 * 2 * 0.1)
    pid.reset()
    assert pid._integral == 0.0


def test_dwa_degenerate_path_message_clears_got_path():
    """A <2-pose Path message mid-mission must NOT leave the controller
    reporting 'reached': the next loop_step should say no path is
    available, exactly like a fresh controller (round-5 review)."""
    import numpy as np

    from kompass_core_tpu.control import DWA, DWAConfig
    from kompass_core_tpu.models import (
        AngularCtrlLimits, LinearCtrlLimits, Robot, RobotCtrlLimits,
        RobotGeometry, RobotType,
    )

    robot = Robot(
        robot_type=RobotType.DIFFERENTIAL_DRIVE,
        geometry_type=RobotGeometry.Type.CYLINDER,
        geometry_params=np.array([0.2, 0.4]),
    )
    limits = RobotCtrlLimits(
        vx_limits=LinearCtrlLimits(max_vel=1.0, max_acc=5.0,
                                   max_decel=10.0),
        omega_limits=AngularCtrlLimits(
            max_vel=2.0, max_acc=3.0, max_decel=3.0, max_steer=np.pi
        ),
    )
    dwa = DWA(robot=robot, ctrl_limits=limits, config=DWAConfig())
    dwa.set_path(np.array([[0.0, 0.0], [2.0, 0.0]]))
    assert dwa.path

    class _Pose:
        class pose:
            class position:
                x = 0.0
                y = 0.0

    class _Msg:
        poses = [_Pose()]  # degenerate: one pose

    dwa.set_path(_Msg())
    assert not dwa._got_path
    from kompass_core_tpu.datatypes import LaserScanData

    angles = np.linspace(0, 2 * np.pi, 32, endpoint=False)
    out = dwa.loop_step(
        current_state=robot.state,
        laser_scan=LaserScanData(angles=angles,
                                 ranges=np.full(32, 10.0)),
    )
    assert out is False


def test_pure_pursuit_local_map_feeds_collision_gate(robot, ctrl_limits):
    """round-5 review: loop_step used to silently drop local_map, so
    map-based callers (the reference wrapper's highest-priority overload,
    control/pure_pursuit.py:175-178) got NO collision gate at all."""
    controller = PurePursuit(
        robot=robot,
        ctrl_limits=ctrl_limits,
        config=PurePursuitConfig(wheel_base=robot.wheelbase),
        control_time_step=0.1,
    )
    controller.set_path(np.array([[0.0, 0.0], [3.0, 0.0]]))
    state = robot.state
    state.x, state.y, state.yaw = 0.0, 0.0, 0.0
    state.vx = 0.5
    # world-frame wall 0.35 m ahead, one NaN row that must be dropped
    ys = np.linspace(-0.6, 0.6, 25)
    wall = np.stack([np.full(25, 0.35), ys], axis=1)
    wall = np.vstack([wall, [np.nan, 0.0]])
    ok = controller.loop_step(current_state=state, local_map=wall)
    assert ok
    assert controller._obstacles_world is not None
    assert len(controller._obstacles_world) == 25  # NaN row dropped
    cmd = controller._result.velocity_command
    assert not controller._check_command_collisions(cmd, 0.1)


def test_pure_pursuit_omni_safe_search_keeps_stale_vy_quirk(ctrl_limits):
    """Reference findSafeCommand (pure_pursuit.cpp:167-186) mutates ONE
    candidate per phase: after an omni lateral trial sets
    vy = nominal.vy + off, the next offset's omega trial inherits that
    stale vy. Pin the exact candidate sequence."""
    from kompass_core_tpu.control.result import VelocityCommand

    omni = Robot(
        robot_type=RobotType.OMNI,
        geometry_type=RobotGeometry.Type.CYLINDER,
        geometry_params=np.array([0.1, 0.4]),
    )
    controller = PurePursuit(
        robot=omni,
        ctrl_limits=ctrl_limits,
        config=PurePursuitConfig(
            wheel_base=0.3, max_search_candidates=4, path_search_step=0.2
        ),
        control_time_step=0.1,
    )
    seen = []

    def record(cmd, dt):
        seen.append((round(cmd.vx, 6), round(cmd.vy, 6), round(cmd.omega, 6)))
        return True  # everything collides -> walk the whole sequence

    controller._check_command_collisions = record
    nominal = VelocityCommand(vx=0.5, vy=0.1, omega=0.3)
    out = controller._find_safe_command(nominal, 0.1)
    assert (out.vx, out.vy, out.omega) == (0.0, 0.0, 0.0)
    offs = controller._search_offsets  # [+0.2, -0.2, +0.6, -0.6]
    expect_forward = [
        (0.5, 0.1, 0.3 + offs[0]),          # omega trial, fresh vy
        (0.5, 0.1 + offs[0], 0.3),          # lateral trial
        (0.5, 0.1 + offs[0], 0.3 + offs[1]),  # omega trial w/ STALE vy
        (0.5, 0.1 + offs[1], 0.3),
        (0.5, 0.1 + offs[1], 0.3 + offs[2]),
        (0.5, 0.1 + offs[2], 0.3),
        (0.5, 0.1 + offs[2], 0.3 + offs[3]),
        (0.5, 0.1 + offs[3], 0.3),
    ]
    got_forward = seen[: len(expect_forward)]
    assert got_forward == [
        tuple(round(v, 6) for v in e) for e in expect_forward
    ]
    # reverse phase resets the candidate to nominal (vy fresh again)
    rev0 = seen[len(expect_forward)]
    assert rev0 == (-0.5, 0.1, round(0.3 + offs[0], 6))


def test_motion_model_defaults_match_params_defaults():
    """round-5 review: MotionModel2D() and
    MotionModel2D(MotionModel2DParams()) must be the SAME model — the
    reference defaults the vy gains to 0 for non-holonomic motion."""
    from kompass_core_tpu.models import MotionModel2D, MotionModel2DParams

    a = MotionModel2D()
    b = MotionModel2D(MotionModel2DParams())
    for f in ("x_dot_prop_vx", "x_dot_prop_vy", "y_dot_prop_vx",
              "y_dot_prop_vy", "yaw_dot_prop_omega"):
        assert getattr(a, f) == getattr(b, f), f
    assert a.x_dot_prop_vy == 0.0 and a.y_dot_prop_vy == 0.0


def test_laserscan_rejects_out_of_range_angles():
    """round-5 review: the reference validates the angle/time fields
    (laserscan.py:31-52); a garbage angle_min/increment used to be
    accepted and silently generate a bogus angle ring."""
    with pytest.raises(ValueError):
        LaserScanData(angle_min=100.0)
    with pytest.raises(ValueError):
        LaserScanData(angle_increment=50.0)
    with pytest.raises(ValueError):
        LaserScanData(scan_time=-1.0)
