"""Vision target-following demo: RGB (image-space) and RGBD (3D) loops.

Simulates a target walking across the camera's view and a robot that
must keep it centered and at range — the reference's `rgb_follower` /
`rgbd_follower` scenario (``controllers/rgb_follower.cpp:151-222``,
``rgbd_follower.cpp:77-146``) driven through this package's public
controllers:

* **RGB stage**: a 2D bounding box drifts off-center; the follower's
  P-control on (size-ratio, center error) must steer it back and report
  shrinking errors.
* **Target-lost stage**: detections stop; the follower must enter its
  rotate/pause search state machine and emit nonzero angular commands.
* **RGBD stage**: 3D detections with a Kalman-tracked pose; the
  pure-tracking control must close distance toward the standoff range.

Run: PYTHONPATH=. python examples/vision_follow_demo.py
"""

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

from kompass_core_tpu.control import (
    VisionRGBDFollower,
    VisionRGBDFollowerConfig,
    VisionRGBFollower,
    VisionRGBFollowerConfig,
)
from kompass_core_tpu.datatypes.tracking import Bbox2D, Bbox3D
from kompass_core_tpu.models import (
    AngularCtrlLimits,
    LinearCtrlLimits,
    Robot,
    RobotCtrlLimits,
    RobotGeometry,
    RobotType,
)


def make_robot():
    robot = Robot(
        robot_type=RobotType.DIFFERENTIAL_DRIVE,
        geometry_type=RobotGeometry.Type.CYLINDER,
        geometry_params=np.array([0.2, 0.4]),
    )
    limits = RobotCtrlLimits(
        vx_limits=LinearCtrlLimits(max_vel=1.0, max_acc=5.0, max_decel=10.0),
        omega_limits=AngularCtrlLimits(max_vel=1.5, max_acc=3.0, max_decel=3.0),
    )
    return robot, limits


def box(cx, cy=240.0, size=120):
    b = Bbox2D(
        top_left_corner=np.array([cx - size / 2, cy - size / 2]),
        size=np.array([size, size]),
    )
    b.set_img_size(np.array([640, 480]))
    return b


def rgb_stage():
    robot, limits = make_robot()
    follower = VisionRGBFollower(
        robot=robot,
        ctrl_limits=limits,
        config=VisionRGBFollowerConfig(control_time_step=0.1),
    )
    follower.set_initial_tracking_2d_target(box(320, 240))

    # target drifts to the right of the image; the follower must produce
    # a command turning toward it (negative omega for right-of-center
    # under the image-frame convention) and shrink the error over time
    cx = 440.0
    errs = []
    for _ in range(25):
        ok = follower.loop_step(detections_2d=[box(cx)])
        assert ok, "target visible but follower reported failure"
        omega = follower.angular_control[0]
        # close the loop: camera pans with the robot's rotation
        cx += omega * 0.1 * (640 / 1.5)
        errs.append(abs(follower.orientation_error))
    print(
        f"[rgb] off-center target recentred: orientation error "
        f"{errs[0]:.3f} -> {errs[-1]:.3f} (omega now "
        f"{follower.angular_control[0]:+.3f})"
    )
    assert errs[-1] < errs[0] * 0.5, "error did not shrink"

    # lost target -> search state machine must emit rotation commands
    search_cmds = []
    for _ in range(10):
        found = follower.loop_step(detections_2d=None)
        if found:
            search_cmds.append(follower.angular_control[0])
    assert any(abs(w) > 1e-3 for w in search_cmds), "no search rotation"
    print(
        f"[rgb] target lost -> search state machine issued "
        f"{len(search_cmds)} rotate/pause commands"
    )


def rgbd_stage():
    robot, limits = make_robot()
    cfg = VisionRGBDFollowerConfig(
        control_time_step=0.1, target_distance=1.0
    )
    follower = VisionRGBDFollower(robot=robot, ctrl_limits=limits, config=cfg)
    follower.set_camera_intrinsics(500.0, 500.0, 320.0, 240.0)

    from kompass_core_tpu.models import RobotState

    def target_at(x, y, t=0.0):
        return Bbox3D(
            center=np.array([x, y, 0.0], np.float32),
            size=np.array([0.4, 0.4, 1.6], np.float32),
            center_img_frame=np.array([320.0, 240.0]),
            size_img_frame=np.array([120, 240]),
            timestamp=t,
            label="person",
        )

    assert follower.set_initial_tracking_3d(320, 240, [target_at(3.0, 0.0)])
    x_rel = 3.0
    dists = [x_rel]
    for k in range(40):
        ok = follower.loop_step(
            detections_3d=[target_at(x_rel, 0.0, t=0.1 * (k + 1))],
            current_state=RobotState(x=0.0, y=0.0, yaw=0.0, speed=0.0),
        )
        assert ok
        vx = follower.linear_x_control[0]
        x_rel -= vx * 0.1  # robot closes on a static target
        dists.append(x_rel)
    print(
        f"[rgbd] distance to target {dists[0]:.2f} m -> {dists[-1]:.2f} m "
        f"(standoff {cfg.target_distance} m)"
    )
    assert dists[-1] < 1.6, "did not approach the standoff range"


if __name__ == "__main__":
    rgb_stage()
    rgbd_stage()
    print("VISION FOLLOW DEMO PASSED")
