"""Serial transcription of the reference RGB follower servo law.

Transcribed from ``rgb_follower.cpp:151-223`` (trackTarget): bbox-area
distance ratio, normalized image-center errors, deadband on all three
errors, P-control v/omega with min-velocity flooring and limit clamps.
"""

__all__ = ["rgb_track_target"]


def rgb_track_target(
    *,
    box_center_x: float,
    box_center_y: float,
    box_size_x: float,
    box_size_y: float,
    img_size_x: float,
    img_size_y: float,
    target_distance: float,
    tolerance: float,
    k_omega: float,
    k_v: float,
    min_vel: float,
    max_vel: float,
    max_omega: float,
):
    """Returns ((v, vy, omega), dist_error, orientation_error)."""
    current_dist = float(box_size_x * box_size_y) / float(
        img_size_x * img_size_y
    )
    dist_error = target_distance - current_dist
    distance_tolerance = tolerance * target_distance

    error_y = 2.0 * (float(box_center_y) / float(img_size_y) - 0.5)
    error_x = 2.0 * (float(box_center_x) / float(img_size_x) - 0.5)
    orientation_error = error_x

    if (
        abs(dist_error) < distance_tolerance
        and abs(error_y) < tolerance
        and abs(error_x) < tolerance
    ):
        return (0.0, 0.0, 0.0), dist_error, orientation_error

    dist_speed = (
        (dist_error / target_distance) * max_vel
        if abs(dist_error) > distance_tolerance
        else 0.0
    )
    omega = -k_omega * error_x * max_omega
    v = k_v * dist_speed

    omega = omega if abs(omega) >= min_vel else 0.0
    omega = min(max(omega, -max_omega), max_omega)
    v = v if abs(v) >= min_vel else 0.0
    v = min(max(v, -max_vel), max_vel)
    return (v, 0.0, omega), dist_error, orientation_error


def _norm_pi(a: float) -> float:
    import math as _m

    a = _m.fmod(a + _m.pi, 2.0 * _m.pi)
    if a < 0:
        a += 2.0 * _m.pi
    return a - _m.pi


def rgbd_pure_tracking(
    *,
    track_velocity: bool,
    target_x: float,
    target_y: float,
    target_yaw: float,
    target_v: float,
    robot_x: float,
    robot_y: float,
    robot_yaw: float,
    robot_radius: float,
    target_radius: float,
    target_distance: float,
    target_orientation: float,
    dist_tolerance: float,
    ang_tolerance: float,
    k_v: float,
    k_omega: float,
    min_vel: float,
    max_vel: float,
    max_omega: float,
):
    """Transcription of ``RGBDFollower::getPureTrackingCtrl``
    (``rgbd_follower.cpp:77-146``): tanh distance/bearing feedback with
    optional velocity feed-forward in world-frame tracking mode.
    Returns ((v, omega), dist_error, angle_error)."""
    import math as _m

    if track_velocity:
        distance = (
            _m.hypot(target_x - robot_x, target_y - robot_y)
            - robot_radius
            - target_radius
        )
        psi = _norm_pi(
            _m.atan2(target_y - robot_y, target_x - robot_x) - robot_yaw
        )
        gamma = _norm_pi(target_yaw - robot_yaw)
    else:
        distance = _m.hypot(target_x, target_y) - robot_radius - target_radius
        psi = _norm_pi(_m.atan2(target_y, target_x))
        gamma = 0.0
    distance = max(distance, 0.001)

    dist_error = target_distance - distance
    angle_error = _norm_pi(target_orientation - psi)

    angle_diff = gamma - psi
    sin_diff, cos_diff = _m.sin(angle_diff), _m.cos(angle_diff)
    tv = 1.0 if track_velocity else 0.0

    v = omega = 0.0
    if abs(dist_error) > dist_tolerance or abs(angle_error) > ang_tolerance:
        v = tv * (target_v * cos_diff) - k_v * max_vel * _m.tanh(dist_error)
        v = min(max(v, -max_vel), max_vel)
        if abs(v) < min_vel:
            v = 0.0
        omega = (
            tv * target_v * sin_diff / distance
            + v * _m.sin(psi) / distance
            - k_omega * max_omega * _m.tanh(angle_error)
        )
        omega = min(max(omega, -max_omega), max_omega)
        if abs(omega) < min_vel:
            omega = 0.0
    return (v, omega), dist_error, angle_error


def depth_box_to_3d(
    *,
    depth_img,
    top_x: int,
    top_y: int,
    size_x: int,
    size_y: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    min_depth: float,
    max_depth: float,
    conversion: float,
    cam_R,
    cam_t,
    body_R,
    body_t,
):
    """Transcription of ``DepthDetector::convert2Dboxto3Dbox``
    (``depth_detector.cpp:84-151``): serial depth harvest over the crop,
    MAD-filtered min/max extent, pinhole center, optical->body-aligned
    axis swap, world registration with |R|-transformed size. Returns
    (center_world, size_world) or None."""
    import math as _m

    import numpy as _np

    depth_values = []
    # the reference crop is INCLUSIVE of [top, top+size] on both axes
    # (tracking.h:123-129 limits, <= loops in depth_detector.cpp:91-92)
    for row_idx in range(top_y, top_y + size_y + 1):
        for col_idx in range(top_x, top_x + size_x + 1):
            d = float(depth_img[row_idx, col_idx]) * conversion
            if min_depth <= d <= max_depth:
                depth_values.append(d)
    if len(depth_values) <= 1:
        return None

    def median(vals):
        s = sorted(vals)
        n = len(s)
        if n % 2 == 0:
            return 0.5 * (s[n // 2 - 1] + s[n // 2])
        return s[n // 2]

    med = median(depth_values)
    mad = median([abs(v - med) for v in depth_values])
    minimum_d, maximum_d = max_depth, min_depth
    for d in depth_values:
        if d < minimum_d and d >= med - 1.5 * mad:
            minimum_d = d
        if d > maximum_d and d <= med + 1.5 * mad:
            maximum_d = d

    x_opt = (top_x + 0.5 * size_x - cx) * med / fx
    y_opt = (top_y + 0.5 * size_y - cy) * med / fy
    center_cam = _np.array([med, -x_opt, -y_opt])
    size_cam = _np.array(
        [maximum_d - minimum_d, size_x * med / fx, size_y * med / fy]
    )
    R = _np.asarray(body_R) @ _np.asarray(cam_R)
    t = _np.asarray(body_R) @ _np.asarray(cam_t) + _np.asarray(body_t)
    center_world = R @ center_cam + t
    size_world = _np.abs(R) @ size_cam
    return center_world, size_world
