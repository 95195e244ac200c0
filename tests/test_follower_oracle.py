"""Follower target-determination parity vs the serial oracle.

Drives `control/follower.Follower` (which delegates its closest-point scans
to the native host library when built) and the independent
`tests/oracle/reference_impl.OracleFollower` transcription of
``follower.cpp:149-353`` over identical simulated runs, asserting the
sticky target state machines stay in lockstep: closest global index,
segment index, normalized segment position, signed crosstrack, heading
error, and the exponential speed-regulation factor.
"""

import math

import numpy as np
import pytest

from kompass_core_tpu.control.follower import Follower, FollowerConfig
from kompass_core_tpu.datatypes.path import InterpolationType, ReferencePath

from oracle.reference_impl import OracleFollower


def _random_path(rng, n=24, step=0.5):
    heading = rng.uniform(-math.pi, math.pi)
    pts = [(rng.uniform(-1, 1), rng.uniform(-1, 1), 0.0)]
    for _ in range(n - 1):
        heading += rng.uniform(-0.5, 0.5)
        pts.append(
            (
                pts[-1][0] + step * math.cos(heading),
                pts[-1][1] + step * math.sin(heading),
                0.0,
            )
        )
    return pts


@pytest.mark.parametrize("seed", [11, 22, 33, 44])
@pytest.mark.parametrize(
    "interp",
    [InterpolationType.LINEAR, InterpolationType.HERMITE_SPLINE],
)
def test_follower_target_lockstep(seed, interp):
    rng = np.random.default_rng(seed)
    cfg = FollowerConfig(
        max_point_interpolation_distance=0.05,
        path_segment_length=1.0,
        lookahead_distance=1.0,
    )
    follower = Follower(config=cfg)
    follower.set_interpolation_type(interp)
    path = ReferencePath(_random_path(rng))
    follower.set_current_path(path, interpolate=True)

    # hand the oracle the same interpolated/segmented arrays — the machinery
    # under test is the closest-point/sticky-target logic, not interpolation
    o = OracleFollower(
        path.xs, path.ys, list(path.segment_starts), curvature=path.curvature
    )

    # simulate: walk roughly along the path with lateral noise + loops back
    n = path.size()
    for tick in range(60):
        frac = min(tick / 50.0, 1.0)
        idx = int(frac * (n - 1))
        x = float(path.xs[idx] + rng.uniform(-0.2, 0.2))
        y = float(path.ys[idx] + rng.uniform(-0.2, 0.2))
        yaw = rng.uniform(-math.pi, math.pi)
        follower.set_current_state(x, y, yaw)
        target = follower.determine_target()
        closest, heading_error = o.determine_target((x, y, yaw))

        assert follower._closest.index == closest.index, (
            f"tick {tick}: closest index {follower._closest.index} != "
            f"{closest.index}"
        )
        assert follower._closest.segment_index == closest.segment_index
        np.testing.assert_allclose(
            follower._closest.segment_length,
            closest.segment_length,
            rtol=1e-9,
        )
        np.testing.assert_allclose(
            target.crosstrack_error, closest.parallel_distance, rtol=1e-5,
            atol=1e-7,
        )
        np.testing.assert_allclose(
            target.heading_error, heading_error, rtol=1e-5, atol=1e-7
        )

        sf = follower.exponential_speed_factor(0.7)
        osf = o.speed_factor(
            0.7,
            cfg.lookahead_distance,
            cfg.speed_regulation_curvature,
            cfg.speed_regulation_angular,
            cfg.min_speed_regulation_factor,
        )
        np.testing.assert_allclose(sf, osf, rtol=1e-6)
