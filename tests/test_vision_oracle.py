"""Vision pipeline parity vs serial oracles: RGBD pure-tracking law and
DepthDetector 2D->3D box conversion on randomized inputs."""

import math

import numpy as np
import pytest

from kompass_core_tpu.datatypes import Bbox2D
from kompass_core_tpu.datatypes.tracking import TrackedPose2D
from kompass_core_tpu.vision.depth_detector import DepthDetector

from oracle.vision_impl import depth_box_to_3d, rgbd_pure_tracking


def _rgbd_core(track_velocity, rng):
    from kompass_core_tpu.control.vision_followers import (
        RGBDFollowerCore,
        VisionRGBDFollowerConfig,
    )
    from kompass_core_tpu.models import (
        AngularCtrlLimits,
        LinearCtrlLimits,
        Robot,
        RobotCtrlLimits,
        RobotGeometry,
        RobotType,
    )

    limits = RobotCtrlLimits(
        vx_limits=LinearCtrlLimits(
            max_vel=float(rng.uniform(0.5, 2.0)), max_acc=5.0, max_decel=5.0
        ),
        omega_limits=AngularCtrlLimits(
            max_vel=float(rng.uniform(1.0, 3.0)),
            max_acc=5.0,
            max_decel=5.0,
            max_steer=3.1,
        ),
    )
    cfg = VisionRGBDFollowerConfig(
        target_distance_m=float(rng.uniform(0.5, 2.0)),
        target_orientation=float(rng.uniform(-0.4, 0.4)),
        distance_tolerance=0.05,
        angle_tolerance=0.05,
        speed_gain=float(rng.uniform(0.3, 1.0)),
        rotation_gain=float(rng.uniform(0.3, 1.0)),
        min_vel=0.02,
        use_local_coordinates=not track_velocity,
    )
    robot = Robot(
        robot_type=RobotType.DIFFERENTIAL_DRIVE,
        geometry_type=RobotGeometry.Type.CYLINDER,
        geometry_params=np.array([0.25, 0.4]),
    )
    core = RGBDFollowerCore(
        robot_type=RobotType.DIFFERENTIAL_DRIVE,
        ctrl_limits=limits,
        robot_shape_type=RobotGeometry.Type.CYLINDER,
        robot_dimensions=np.array([0.25, 0.4]),
        config=cfg,
    )
    return core, cfg, limits, robot


@pytest.mark.parametrize("seed", [4, 19])
@pytest.mark.parametrize("track_velocity", [False, True])
def test_rgbd_pure_tracking_lockstep(seed, track_velocity):
    rng = np.random.default_rng(seed)
    core, cfg, limits, robot = _rgbd_core(track_velocity, rng)

    for _ in range(30):
        pose = TrackedPose2D(
            x=float(rng.uniform(-3, 3)),
            y=float(rng.uniform(-3, 3)),
            yaw=float(rng.uniform(-math.pi, math.pi)),
            vx=float(rng.uniform(-0.5, 0.5)),
            vy=0.0,
            omega=float(rng.uniform(-0.5, 0.5)),
        )
        rx, ry, ryaw = (
            float(rng.uniform(-1, 1)),
            float(rng.uniform(-1, 1)),
            float(rng.uniform(-math.pi, math.pi)),
        )
        core.set_current_state(rx, ry, ryaw)
        got = core.get_pure_tracking_ctrl(pose)
        (want_v, want_w), want_de, want_ae = rgbd_pure_tracking(
            track_velocity=track_velocity,
            target_x=pose.x,
            target_y=pose.y,
            target_yaw=pose.yaw,
            target_v=pose.v(),
            robot_x=rx,
            robot_y=ry,
            robot_yaw=ryaw,
            robot_radius=core.robot_radius,
            target_radius=core.current_target_radius,
            target_distance=cfg.target_distance_m,
            target_orientation=cfg.target_orientation,
            dist_tolerance=cfg.distance_tolerance,
            ang_tolerance=cfg.angle_tolerance,
            k_v=cfg.speed_gain,
            k_omega=cfg.rotation_gain,
            min_vel=cfg.min_vel,
            max_vel=limits.vx_limits.max_vel,
            max_omega=limits.omega_limits.max_vel,
        )
        np.testing.assert_allclose(got[0], want_v, rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(got[-1], want_w, rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("seed", [8, 21, 34])
def test_depth_detector_lockstep(seed):
    rng = np.random.default_rng(seed)
    fx, fy = float(rng.uniform(400, 700)), float(rng.uniform(400, 700))
    cx, cy = 320.0, 240.0
    cam_t = rng.uniform(-0.2, 0.2, size=3)
    yaw_cam = float(rng.uniform(-0.3, 0.3))
    cam_q = [0.0, 0.0, math.sin(yaw_cam / 2), math.cos(yaw_cam / 2)]
    det = DepthDetector(
        depth_range=[0.3, 5.0],
        camera_in_body_translation=cam_t,
        camera_in_body_rotation=cam_q,
        focal_length=[fx, fy],
        principal_point=[cx, cy],
        depth_conversion_factor=1e-3,
    )
    rx, ry, ryaw = 1.0, -0.5, float(rng.uniform(-math.pi, math.pi))
    det.set_robot_state(rx, ry, ryaw)

    # synthetic uint16 depth image: background far, a noisy target patch
    img = np.full((480, 640), 4000, np.uint16)
    for _ in range(5):
        w = int(rng.integers(8, 60))
        h = int(rng.integers(8, 60))
        x = int(rng.integers(0, 640 - w - 1))
        y = int(rng.integers(0, 480 - h - 1))
        depth_mm = rng.integers(500, 3000)
        img[y : y + h + 1, x : x + w + 1] = depth_mm + rng.integers(
            -40, 40, size=(h + 1, w + 1)
        )
        # sprinkle some out-of-range dropouts
        mask = rng.random((h + 1, w + 1)) < 0.05
        img[y : y + h + 1, x : x + w + 1][mask] = 0

        box = Bbox2D(
            top_left_corner=np.array([x, y]),
            size=np.array([w, h]),
            img_size=np.array([640, 480]),
        )
        det.update_boxes(img, [box])
        got = det.get_3d_detections()
        want = depth_box_to_3d(
            depth_img=img,
            top_x=x,
            top_y=y,
            size_x=w,
            size_y=h,
            fx=fx,
            fy=fy,
            cx=cx,
            cy=cy,
            min_depth=0.3,
            max_depth=5.0,
            conversion=1e-3,
            cam_R=det._cam_R,
            cam_t=cam_t,
            body_R=det._body_R,
            body_t=det._body_t,
        )
        assert (want is None) == (len(got) == 0)
        if want is not None:
            center, size = want
            np.testing.assert_allclose(
                got[0].center, center, rtol=1e-5, atol=1e-5
            )
            np.testing.assert_allclose(
                got[0].size, size, rtol=1e-5, atol=1e-5
            )


def test_depth_detector_all_out_of_range_returns_none():
    det = DepthDetector(
        depth_range=[0.3, 5.0],
        camera_in_body_translation=[0.0, 0.0, 0.0],
        camera_in_body_rotation=[0.0, 0.0, 0.0, 1.0],
        focal_length=[500.0, 500.0],
        principal_point=[320.0, 240.0],
    )
    img = np.zeros((480, 640), np.uint16)  # all dropouts
    box = Bbox2D(
        top_left_corner=np.array([10, 10]),
        size=np.array([20, 20]),
        img_size=np.array([640, 480]),
    )
    det.update_boxes(img, [box])
    assert det.get_3d_detections() == []
