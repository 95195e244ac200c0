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
