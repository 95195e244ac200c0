"""Global planner tests.

Modeled on the reference's ``test_ompl.py`` structure: a known map with
obstacles, multiple planners solving the same problem, solution validity
(start/goal endpoints, collision-free, finite cost) and repeatability.
"""

import numpy as np
import pytest

from kompass_core_tpu.models import Robot, RobotGeometry, RobotType
from kompass_core_tpu.planning import (
    GlobalPlanner,
    GlobalPlannerConfig,
    planner_registry,
)


def make_wall_map():
    """10x10 m map with a wall across the middle and a gap on the right."""
    meta = {
        "resolution": 0.1,
        "width": 100,
        "height": 100,
        "origin_x": 0.0,
        "origin_y": 0.0,
    }
    xs = np.arange(0.0, 7.0, 0.05)  # wall y=5 from x=0..7, gap x>7
    wall = np.stack([xs, np.full_like(xs, 5.0), np.zeros_like(xs)], axis=1)
    return meta, wall


@pytest.fixture
def robot():
    return Robot(
        robot_type=RobotType.DIFFERENTIAL_DRIVE,
        geometry_type=RobotGeometry.Type.CYLINDER,
        geometry_params=np.array([0.2, 0.5]),
    )


def _path_is_collision_free(planner, path):
    for a, b in zip(path[:-1], path[1:]):
        if not planner._segment_free_host(a, b):
            return False
    return True


@pytest.mark.parametrize(
    "planner_id",
    ["PRM", "PRMstar", "RRT", "RRTstar", "RRTConnect", "InformedRRTstar"],
)
def test_planner_solves_around_wall(robot, planner_id):
    meta, wall = make_wall_map()
    cfg = GlobalPlannerConfig(
        planner_id=planner_id, num_samples=256, seed=3,
        connection_radius=4.0, max_iterations=1024, step_size=0.8,
    )
    planner = GlobalPlanner(robot, config=cfg)
    planner.setup_problem(meta, 2.0, 2.0, 0.0, 2.0, 8.0, 0.0, wall)
    path = planner.solve()
    assert path is not None, f"{planner_id} found no path"
    np.testing.assert_allclose(path[0], [2.0, 2.0], atol=0.3)
    np.testing.assert_allclose(path[-1], [2.0, 8.0], atol=0.9)
    # straight line is blocked -> must detour via the gap (x > 7) or around
    assert planner.path_cost > 6.0  # straight distance would be 6.0
    assert planner.path_cost < 30.0
    assert _path_is_collision_free(planner, path)


@pytest.mark.parametrize(
    "planner_id", ["PRM", "RRTConnect", "InformedRRTstar", "PRMstar"]
)
def test_prm_deterministic(robot, planner_id):
    meta, wall = make_wall_map()
    cfg = GlobalPlannerConfig(
        planner_id=planner_id, num_samples=256, seed=7,
        connection_radius=4.0, max_iterations=512, step_size=0.8,
    )
    p1 = GlobalPlanner(robot, config=cfg)
    p1.setup_problem(meta, 2.0, 2.0, 0.0, 2.0, 8.0, 0.0, wall)
    path1 = p1.solve()
    p2 = GlobalPlanner(robot, config=cfg)
    p2.setup_problem(meta, 2.0, 2.0, 0.0, 2.0, 8.0, 0.0, wall)
    path2 = p2.solve()
    np.testing.assert_allclose(path1, path2)


def test_unreachable_goal_returns_none(robot):
    meta = {
        "resolution": 0.1,
        "width": 100,
        "height": 100,
        "origin_x": 0.0,
        "origin_y": 0.0,
    }
    # full wall, no gap
    xs = np.arange(-1.0, 11.0, 0.04)
    wall = np.stack([xs, np.full_like(xs, 5.0), np.zeros_like(xs)], axis=1)
    cfg = GlobalPlannerConfig(planner_id="PRM", num_samples=256, seed=0)
    planner = GlobalPlanner(robot, config=cfg)
    planner.setup_problem(meta, 2.0, 2.0, 0.0, 2.0, 8.0, 0.0, wall)
    assert planner.solve() is None


def test_empty_map_gives_near_straight_path(robot):
    meta = {
        "resolution": 0.1,
        "width": 100,
        "height": 100,
        "origin_x": 0.0,
        "origin_y": 0.0,
    }
    cfg = GlobalPlannerConfig(planner_id="PRM", num_samples=256, seed=1)
    planner = GlobalPlanner(robot, config=cfg)
    planner.setup_problem(meta, 1.0, 1.0, 0.0, 9.0, 9.0, 0.0, None)
    path = planner.solve()
    assert path is not None
    # simplification should get close to the straight-line cost
    assert planner.path_cost == pytest.approx(np.hypot(8, 8), rel=0.15)


def test_registry_covers_reference_planner_families():
    for name in ["PRM", "PRMstar", "RRT", "RRTstar", "RRTConnect",
                 "InformedRRTstar", "LazyPRM"]:
        assert name in planner_registry


def test_unknown_planner_raises(robot):
    with pytest.raises(ValueError):
        GlobalPlanner(robot, config=GlobalPlannerConfig(planner_id="FOO"))
