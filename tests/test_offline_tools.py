"""Tests for the offline simulation / evaluation / calibration tool chain."""

import numpy as np
import pytest

from kompass_core_tpu.calibration import Calibration, ModelFitting
from kompass_core_tpu.control import Stanley, StanleyConfig
from kompass_core_tpu.datatypes.obstacles import (
    OBSTACLE_TYPE,
    ObstaclesData,
    split_obstacles_by_type,
)
from kompass_core_tpu.datatypes.path_sample import PathSample
from kompass_core_tpu.models import (
    AngularCtrlLimits,
    LinearCtrlLimits,
    MotionModel2D,
    Robot,
    RobotCtrlLimits,
    RobotGeometry,
    RobotType,
)
from kompass_core_tpu.motion_cost import (
    ReferenceCost,
    StaticCollisionCost,
)
from kompass_core_tpu.performance import MotionEvaluation
from kompass_core_tpu.py_path_tools import (
    PathRecorder,
    WaypointExecutor,
    interpolate_path,
    resample_path,
)
from kompass_core_tpu.simulation import MotionPaths, RobotSim


def test_robot_sim_straight_line():
    sim = RobotSim()
    sample = sim.simulate_motion(
        vx_sequence=np.full(10, 1.0), omega_sequence=np.zeros(10), time_step=0.1
    )
    assert sample.x_points[-1] == pytest.approx(1.0, abs=1e-6)
    assert sample.y_points[-1] == pytest.approx(0.0, abs=1e-9)


def test_motion_paths_shapes():
    assert len(MotionPaths.generate_line_path(num_points=50)) == 50
    circle = MotionPaths.generate_circle_path(radius=2.0, num_points=100)
    # circle curvature: end returns near start for full arc
    assert np.hypot(
        circle.x_points[-1] - circle.x_points[0],
        circle.y_points[-1] - circle.y_points[0],
    ) < 0.2
    for gen in (
        MotionPaths.generate_step_path,
        MotionPaths.generate_oval_path,
        MotionPaths.generate_u_turn_path,
    ):
        p = gen()
        assert len(p) > 10


def test_calibration_recovers_scaled_model():
    """Generate data with a known non-unit model, fit it back."""
    true_model = MotionModel2D(
        x_dot_prop_vx=0.9, y_dot_prop_vx=0.9, yaw_dot_prop_omega=0.8
    )
    sim = RobotSim(model=true_model)
    rng = np.random.default_rng(0)
    vx = rng.uniform(0.2, 1.0, 200)
    omega = rng.uniform(-1.0, 1.0, 200)
    sample = sim.simulate_motion(vx, omega, 0.1)
    fitted = Calibration.calibrate_data(sample)
    assert fitted.x_dot_prop_vx == pytest.approx(0.9, abs=0.05)
    assert fitted.y_dot_prop_vx == pytest.approx(0.9, abs=0.05)
    assert fitted.yaw_dot_prop_omega == pytest.approx(0.8, abs=0.05)
    # replay error should be small
    _, rms = Calibration.simulate_calibrated_model_data(sample, fitted)
    assert rms < 0.1


def test_static_collision_cost_bands():
    path = PathSample(3)
    path.set_path(np.array([0.0, 1.0, 2.0]), np.zeros(3), np.zeros(3))
    obs = ObstaclesData()
    cost = StaticCollisionCost(weight=2.0, margin=0.5, robot_radius=0.3)
    # far obstacle: zero
    obs.add_obstacle(OBSTACLE_TYPE.SCAN, 10.0, 10.0)
    assert cost(path, obs) == 0.0
    # touching obstacle: full cost * weight
    obs2 = ObstaclesData()
    obs2.add_obstacle(OBSTACLE_TYPE.SCAN, 1.0, 0.2)
    assert cost(path, obs2) == pytest.approx(2.0)
    # in the margin band: between 0 and weight
    obs3 = ObstaclesData()
    obs3.add_obstacle(OBSTACLE_TYPE.SCAN, 1.0, 0.65)  # clearance 0.35 in (0, 0.5)
    v = cost(path, obs3)
    assert 0.0 < v < 2.0


def test_reference_cost_zero_on_identical_paths():
    p = MotionPaths.generate_line_path(num_points=50)
    cost = ReferenceCost(1.0)
    assert cost(p, p) == pytest.approx(0.0, abs=1e-9)


def test_motion_evaluation_with_stanley():
    robot = Robot(
        robot_type=RobotType.ACKERMANN,
        geometry_type=RobotGeometry.Type.CYLINDER,
        geometry_params=np.array([0.1, 0.4]),
    )
    limits = RobotCtrlLimits(
        vx_limits=LinearCtrlLimits(max_vel=1.0, max_acc=5.0, max_decel=10.0),
        omega_limits=AngularCtrlLimits(
            max_vel=4.0, max_acc=3.0, max_decel=3.0, max_steer=np.pi
        ),
    )
    controller = Stanley(
        robot=robot,
        ctrl_limits=limits,
        config=StanleyConfig(cross_track_gain=1.5, heading_gain=2.0),
        control_time_step=0.1,
    )
    evaluator = MotionEvaluation(robot=robot)
    ref = MotionPaths.generate_line_path(length=3.0, num_points=30)
    result = evaluator.run_test(controller, ref, max_steps=200)
    assert result.reached_end
    assert result.lateral_error_mean < 0.2
    assert evaluator.avg_results.success_rate == 1.0


def test_path_recorder_and_executor(tmp_path):
    rec = PathRecorder(min_point_distance=0.1)
    for x in np.linspace(0, 1, 30):
        rec.record(x, 0.0, 0.0)
    path = rec.get_path()
    assert 5 < len(path) < 15  # pruned by min distance
    # round trip through XML
    f = str(tmp_path / "p.xml")
    PathRecorder.save_xml(path, f)
    loaded = PathRecorder.load_xml(f)
    np.testing.assert_allclose(loaded.x_points, path.x_points)

    ex = WaypointExecutor(path, reach_tolerance=0.05)
    target = ex.update(0.0, 0.0)
    assert target is not None and target.idx >= 1
    # walk the whole path: executor finishes sequentially
    for x in path.x_points:
        ex.update(float(x), 0.0)
    assert ex.finished


def test_interpolation_tools():
    p = MotionPaths.generate_circle_path(radius=1.0, num_points=20)
    dense = interpolate_path(p, max_point_distance=0.05)
    assert len(dense) > len(p)
    coarse = resample_path(dense, 10)
    assert len(coarse) == 10


def test_kinematic_control_conversions():
    from kompass_core_tpu.models import (
        AckermannControl,
        DifferentialDriveControl,
        OmniControl,
    )

    dd = DifferentialDriveControl(velocity_x=1.0, omega=0.5, wheel_base=0.4)
    assert dd.left_wheel_speed == pytest.approx(0.9)
    assert dd.right_wheel_speed == pytest.approx(1.1)
    dd2 = DifferentialDriveControl(wheel_base=0.4).from_wheel_speeds(0.9, 1.1)
    assert dd2.vx == pytest.approx(1.0)
    assert dd2.omega == pytest.approx(0.5)

    ack = AckermannControl(velocity_x=1.0, omega=0.5, wheel_base=0.4)
    steer = ack.steering_angle
    back = AckermannControl(wheel_base=0.4).from_steering(1.0, steer)
    assert back.omega == pytest.approx(0.5)

    omni = OmniControl(velocity_x=1.0, velocity_y=0.5, omega=0.0, wheel_base=0.4)
    ws = omni.wheel_speeds
    assert ws[0] == pytest.approx(0.5)
    assert ws[1] == pytest.approx(1.5)


def test_obstacles_data_full_api():
    """Reference ObstaclesData surface: columns, merge, metadata, split
    (datatypes/obstacles.py:30-244)."""
    obs = ObstaclesData()
    obs.add_obstacle(OBSTACLE_TYPE.SCAN, 1.0, 2.0, x_local=0.5, y_local=0.1,
                     i_grid=3, j_grid=4, occupied_zone=0.2)
    obs.add_obstacle(OBSTACLE_TYPE.SEMANTIC, 5.0, 6.0, class_id=17,
                     object_id=42, vx=0.3, vy=-0.1)
    assert obs.get_length() == 2
    other = ObstaclesData()
    other.add_obstacle(OBSTACLE_TYPE.SCAN, 7.0, 8.0)
    obs.merge_obstacles(other)
    assert len(obs) == 3
    scan, semantic = split_obstacles_by_type(obs)
    assert len(scan) == 2 and len(semantic) == 1
    assert semantic.class_id == [17] and semantic.object_id == [42]
    obs.remove_obstacle_by_object_id(42)
    assert len(obs) == 2
    obs.check_attributes_equal_length()


def test_motion_evaluation_export_all_fail_is_strict_json(tmp_path):
    """avg_time_to_goal is +inf when no test reached its goal; the
    exported file must still be STRICT JSON (null, not the non-standard
    `Infinity` literal) — round-5 review."""
    import json

    from kompass_core_tpu.performance import MotionEvaluation, MotionResult

    ev = MotionEvaluation()
    r = MotionResult()
    r.reached_end = False
    ev.avg_results.add_test(r)
    path = ev.export(str(tmp_path))

    def _no_constants(_):
        raise AssertionError("non-standard JSON constant in export")

    data = json.loads(open(path).read(), parse_constant=_no_constants)
    assert data["avg_time_to_goal"] is None
    assert data["success_rate"] == 0.0


def test_reference_cost_empty_path_returns_zero_not_crash():
    """round-5 review: the reference crashes dereferencing None when the
    reference path is empty; this build logs and returns zero cost."""
    from kompass_core_tpu.motion_cost import ReferenceCost

    cost = ReferenceCost(1.0)
    d, h = cost.point_cost(1.0, 2.0, 0.5, [])
    assert (d, h) == (0.0, 0.0)


def test_sparse_path_augments_and_interpolates():
    """A 4-point sparse path at the mission start (execution_index 0)
    must densify via ONE augmentation pass and interpolate — the
    augmentation branch used to be unreachable, so sparse paths failed
    with 'Need more points' forever (round-5 review). The reference
    recurses forever on this input."""
    from kompass_core_tpu.py_path_tools.executor import PathExecutor

    ex = PathExecutor()
    ex.start_path_recording()
    for x in [0.0, 1.0, 2.0, 3.0]:
        ex.record_path_point(x, 0.0, 0.0, 0.5)
    n_before = len(ex.ref_path)
    ok = ex.interpolate_path_spline(0.0, 0.0)
    assert len(ex.ref_path) > n_before  # densified
    assert ok, "sparse path must interpolate after augmentation"
    # midpoints carry the MEAN heading, not the operator-quirk sum
    h = [p.heading for p in ex.ref_path]
    assert max(abs(v) for v in h) <= max(abs(v) for v in h[::2]) + 1e-9
