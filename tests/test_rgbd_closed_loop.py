"""RGBD follower closed-loop convergence, mirroring the reference's
``vision_follower_test.cpp`` Test_RGBDFollower_local / _global_frame
(:378-452, scenario plumbing :20-268): a diff-drive robot starting 0.8 m
behind a target that translates at 0.1 m/s while its heading rotates at
0.1 rad/s, seen as THREE 3D boxes (the target plus two decoys offset by
0.7 m steps); the tracker must hold the correct box by feature similarity
and the follower must settle at

    end_distance = robot_radius + target_distance + target_radius

within 2x the distance tolerance after 100 control iterations (each
applying control_horizon=2 velocity steps and advancing the world in
sync). Runs in both local-coordinates mode (boxes given in the robot
frame, no velocity feed-forward) and global/world mode (track_velocity
with feed-forward).

This scenario also pins the reference's association semantics: with
``minAcceptedSimilarityScore = 0`` the tracker never declares the target
lost on a multi-box frame (tracker.h:41) — a stricter gate drops the
follower into wait/search mid-run and the target walks away.
"""

import math

import numpy as np
import pytest

from kompass_core_tpu.control.vision_followers import (
    RGBDFollowerCore,
    VisionRGBDFollowerConfig,
)
from kompass_core_tpu.datatypes.tracking import Bbox3D
from kompass_core_tpu.models import (
    AngularCtrlLimits,
    LinearCtrlLimits,
    RobotCtrlLimits,
    RobotGeometry,
    RobotType,
)

DT = 0.1
CONTROL_HORIZON = 2  # vision_follower_test.cpp:71 (controlHorizon)
PRED_HORIZON = 20
TARGET_DISTANCE = 0.2  # edge-to-edge desired gap (:30)
DIST_TOL = 0.1
ROBOT_RADIUS = 0.1
BOX_SIZE = np.array([0.5, 0.5, 1.0], np.float32)  # (:117)
TARGET_RADIUS = 0.25  # 0.5 * max(size.x, size.y)


def _make_boxes(centers, ts):
    # three boxes: the target at centers[0] plus two decoys (:118-128)
    return [
        Bbox3D(
            center=np.asarray(c, np.float32),
            size=BOX_SIZE.copy(),
            center_img_frame=np.array([150 + 50 * i, 150 + 50 * i]),
            size_img_frame=np.array([25, 25]),
            timestamp=ts,
        )
        for i, c in enumerate(centers)
    ]


def _world_to_local(boxes, rx, ry, ryaw):
    # world_in_robot_tf * center, |R| * size (:252-270)
    out = []
    c, s = math.cos(ryaw), math.sin(ryaw)
    for b in boxes:
        bx, by, bz = (float(v) for v in b.center)
        sx, sy, sz = (float(v) for v in b.size)
        out.append(
            Bbox3D(
                center=np.array(
                    [
                        c * (bx - rx) + s * (by - ry),
                        -s * (bx - rx) + c * (by - ry),
                        bz,
                    ],
                    np.float32,
                ),
                size=np.array(
                    [abs(c) * sx + abs(s) * sy, abs(s) * sx + abs(c) * sy, sz],
                    np.float32,
                ),
                center_img_frame=b.center_img_frame.copy(),
                size_img_frame=b.size_img_frame.copy(),
                timestamp=b.timestamp,
            )
        )
    return out


@pytest.mark.parametrize("use_local", [True, False], ids=["local", "global"])
def test_rgbd_follower_converges_on_moving_target(use_local):
    limits = RobotCtrlLimits(
        vx_limits=LinearCtrlLimits(max_vel=2.0, max_acc=5.0, max_decel=10.0),
        omega_limits=AngularCtrlLimits(
            max_vel=4.0, max_acc=3.0, max_decel=3.0, max_steer=1.57
        ),
    )
    cfg = VisionRGBDFollowerConfig(
        control_time_step=DT,
        control_horizon=CONTROL_HORIZON,
        prediction_horizon=PRED_HORIZON,
        use_local_coordinates=use_local,
        target_distance_m=TARGET_DISTANCE,
        target_orientation=0.0,
        distance_tolerance=DIST_TOL,
        min_vel=0.0,
    )
    core = RGBDFollowerCore(
        RobotType.DIFFERENTIAL_DRIVE,
        limits,
        RobotGeometry.Type.CYLINDER,
        np.array([ROBOT_RADIUS, 0.4]),
        cfg,
    )

    rx, ry, ryaw = -0.8, 0.0, 0.0  # robotState (:81)
    t_x, t_y, boxes_ori = 0.0, 0.0, 0.0
    t_vx, t_omega = 0.1, 0.1  # tracked_vel (:81)
    box_centers = [(0.7 * i, 0.7 * i, 0.0) for i in range(3)]
    ts = 0.0

    core.set_current_state(rx, ry, ryaw)
    init = _make_boxes(box_centers, ts)
    if use_local:
        init = _world_to_local(init, rx, ry, ryaw)
    assert core.set_initial_tracking_boxes_3d(150, 150, init)

    start_dist = math.hypot(rx - t_x, ry - t_y)
    for _step in range(100):
        core.set_current_state(rx, ry, ryaw)
        seen = _make_boxes(box_centers, ts)
        if use_local:
            seen = _world_to_local(seen, rx, ry, ryaw)
        vels = core.get_tracking_ctrl_3d(seen, None)
        assert vels, "follower lost the target (wait/search/give-up)"
        for k in range(min(CONTROL_HORIZON, len(vels))):
            vx, vy, om = vels[k]
            rx += (vx * math.cos(ryaw) - vy * math.sin(ryaw)) * DT
            ry += (vx * math.sin(ryaw) + vy * math.cos(ryaw)) * DT
            ryaw += om * DT
            # advance target + decoy boxes in sync (:131-141,170-178)
            dx = t_vx * math.cos(boxes_ori) * DT
            dy = t_vx * math.sin(boxes_ori) * DT
            boxes_ori += t_omega * DT
            t_x += dx
            t_y += dy
            box_centers = [(c[0] + dx, c[1] + dy, c[2]) for c in box_centers]
            ts += DT
        # divergence guard (:181-184)
        assert math.hypot(rx - t_x, ry - t_y) <= 3.0 * start_dist

    end_dist = math.hypot(rx - t_x, ry - t_y)
    err = end_dist - ROBOT_RADIUS - TARGET_DISTANCE - TARGET_RADIUS
    assert abs(err) < 2.0 * DIST_TOL, f"settle error {err:+.3f}"
