"""Blocked-robot (no-movement) detection.

The reference declares ``enable_check_blocked`` / ``max_blocked_duration``
(controller.h:37-44) but ships no logic; this build implements the
detector on the follower state. Deterministic via an injected clock.
"""

import numpy as np

from kompass_core_tpu.control.follower import Follower, FollowerConfig
from kompass_core_tpu.datatypes.path import ReferencePath


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def _follower(**cfg):
    f = Follower(config=FollowerConfig(**cfg))
    clock = FakeClock()
    f._clock = clock
    f.set_current_path(ReferencePath(np.array([[0.0, 0.0], [2.0, 0.0]])))
    return f, clock


def test_blocked_after_max_duration():
    f, clock = _follower(enable_check_blocked=True, max_blocked_duration=1.0)
    f.set_current_state(0.0, 0.0, 0.0)
    assert not f.is_robot_blocked()
    clock.t = 0.9
    f.set_current_state(0.0, 0.0, 0.0)
    assert not f.is_robot_blocked()
    clock.t = 1.1
    f.set_current_state(0.0, 0.0, 0.0)
    assert f.is_robot_blocked()


def test_movement_resets_detector():
    f, clock = _follower(enable_check_blocked=True, max_blocked_duration=1.0)
    f.set_current_state(0.0, 0.0, 0.0)
    clock.t = 1.5
    f.set_current_state(0.5, 0.0, 0.0)  # moved: window restarts
    assert not f.is_robot_blocked()
    clock.t = 2.4
    f.set_current_state(0.5, 0.0, 0.0)
    assert not f.is_robot_blocked()
    clock.t = 2.6
    f.set_current_state(0.5, 0.0, 0.0)
    assert f.is_robot_blocked()


def test_rotation_counts_as_movement():
    f, clock = _follower(enable_check_blocked=True, max_blocked_duration=1.0)
    f.set_current_state(0.0, 0.0, 0.0)
    clock.t = 1.5
    f.set_current_state(0.0, 0.0, 0.5)  # rotating in place is movement
    assert not f.is_robot_blocked()


def test_disabled_by_default():
    f, clock = _follower()  # enable_check_blocked defaults False (parity)
    f.set_current_state(0.0, 0.0, 0.0)
    clock.t = 100.0
    f.set_current_state(0.0, 0.0, 0.0)
    assert not f.is_robot_blocked()


def test_no_path_never_blocked():
    f, clock = _follower(enable_check_blocked=True, max_blocked_duration=1.0)
    f.clear_current_path()
    f.set_current_state(0.0, 0.0, 0.0)
    clock.t = 10.0
    f.set_current_state(0.0, 0.0, 0.0)
    assert not f.is_robot_blocked()


def test_config_surface_matches_reference_bounds():
    import pytest

    with pytest.raises(Exception):
        FollowerConfig(max_blocked_duration=0.01)  # below 0.1 s min
    with pytest.raises(Exception):
        FollowerConfig(max_blocked_duration=500.0)  # above 360 s max


def test_stalled_pose_stream_does_not_report_blocked():
    """A silent pose stream must not manufacture a blocked report: only
    OBSERVED non-movement counts (the robot may be driving while
    localization hiccups)."""
    f, clock = _follower(enable_check_blocked=True, max_blocked_duration=1.0)
    f.set_current_state(0.0, 0.0, 0.0)
    clock.t = 50.0  # no new pose observations arrive
    assert not f.is_robot_blocked()
