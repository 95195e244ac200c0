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


def test_unreachable_goal_returns_none_after_timeout(robot):
    import time

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
    cfg = GlobalPlannerConfig(
        planner_id="PRM", num_samples=256, seed=0, planning_timeout=0.4
    )
    planner = GlobalPlanner(robot, config=cfg)
    planner.setup_problem(meta, 2.0, 2.0, 0.0, 2.0, 8.0, 0.0, wall)
    t0 = time.monotonic()
    assert planner.solve() is None
    # the timeout must have driven >= 1 retry round before giving up
    assert time.monotonic() - t0 >= 0.4


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
                 "InformedRRTstar", "LazyPRM", "LazyPRMstar", "EST",
                 "KPIECE1", "SST", "FMTstar", "BITstar"]:
        assert name in planner_registry
    assert len(planner_registry) >= 12


def test_numpy_edt_matches_scipy():
    """The scipy-free exact EDT fallback must agree with
    scipy.ndimage.distance_transform_edt everywhere."""
    from scipy.ndimage import distance_transform_edt

    from kompass_core_tpu.planning.planners_trees import _edt_numpy

    rng = np.random.default_rng(11)
    for shape in [(40, 40), (23, 57)]:
        free = rng.random(shape) > 0.1
        if not (~free).any():
            free[0, 0] = False
        got = _edt_numpy(free, 0.1)
        want = distance_transform_edt(free, sampling=0.1)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_default_planner_is_trrt(robot):
    """The reference front-end defaults to TRRT
    (third_party/ompl/planner.py:34); so does this one."""
    assert GlobalPlannerConfig().planner_id == "TRRT"


def test_configure_from_file_switches_planner(robot, tmp_path):
    """configure() mirrors the reference's file layout: planner config
    under [root.]ompl, per-planner params under [root.]ompl.<Planner>."""
    import yaml

    cfg_file = tmp_path / "planner.yaml"
    cfg_file.write_text(yaml.safe_dump({
        "nav": {"ompl": {
            "planner_id": "ompl.geometric.RRTstar",
            "num_samples": 128,
            "RRTstar": {"goal_bias": 0.25, "rewire_factor": 1.4},
        }},
    }))
    planner = GlobalPlanner(robot)
    planner.configure(str(cfg_file), root_name="nav")
    assert planner.planner_id == "RRTstar"
    assert planner._config.num_samples == 128
    assert planner.planner_params.goal_bias == pytest.approx(0.25)
    assert planner.planner_params.rewire_factor == pytest.approx(1.4)
    # explicit planner_id overrides the file's
    planner.configure(str(cfg_file), root_name="nav", planner_id="PRM")
    assert planner.planner_id == "PRM"
    with pytest.raises(ValueError):
        planner.configure(str(cfg_file), root_name="nav", planner_id="NOPE")
    # a rejected configure leaves the planner untouched and usable
    assert planner.planner_id == "PRM"
    meta, wall = make_wall_map()
    planner.setup_problem(meta, 2.0, 2.0, 0.0, 2.0, 8.0, 0.0, wall)
    assert planner.solve() is not None


def test_unknown_planner_raises(robot):
    with pytest.raises(ValueError):
        GlobalPlanner(robot, config=GlobalPlannerConfig(planner_id="FOO"))


# --- extended planner family -------------------------------------------------


@pytest.mark.parametrize(
    "planner_id", ["EST", "KPIECE1", "SST", "FMTstar", "BITstar",
                   "LazyPRMstar"]
)
def test_extended_planners_solve_around_wall(robot, planner_id):
    meta, wall = make_wall_map()
    # EST/KPIECE/SST are slow explorers by design (no Voronoi pull toward
    # unexplored space) — they need more expansions to round the wall
    iters = {"EST": 6144, "KPIECE1": 3072, "SST": 3072}.get(planner_id, 768)
    cfg = GlobalPlannerConfig(
        planner_id=planner_id, num_samples=256, seed=3,
        connection_radius=4.0, max_iterations=iters, step_size=0.8,
        planning_timeout=30.0,
    )
    planner = GlobalPlanner(robot, config=cfg)
    if planner_id == "FMTstar":
        planner.planner_params.num_samples = 512
        planner.planner_params.radius_multiplier = 1.5
    if planner_id == "BITstar":
        planner.planner_params.samples_per_batch = 96
        planner.planner_params.batches = 3
    if planner_id in ("EST", "KPIECE1", "SST"):
        planner.planner_params.goal_bias = 0.1
    if planner_id == "EST":
        planner.planner_params.density_radius = 1.5
    if planner_id == "SST":
        planner.planner_params.selection_radius = 1.5
        planner.planner_params.pruning_radius = 0.25
    planner.setup_problem(meta, 2.0, 2.0, 0.0, 2.0, 8.0, 0.0, wall)
    path = planner.solve()
    assert path is not None, f"{planner_id} found no path"
    np.testing.assert_allclose(path[0], [2.0, 2.0], atol=0.9)
    np.testing.assert_allclose(path[-1], [2.0, 8.0], atol=0.9)
    assert planner.path_cost > 6.0
    assert planner.path_cost < 40.0
    assert _path_is_collision_free(planner, path)


@pytest.mark.parametrize(
    "planner_id",
    ["TRRT", "BiEST", "SBL", "BKPIECE1", "LBKPIECE1", "ProjEST", "PDST",
     "STRIDE", "BFMT", "ABITstar", "AITstar", "LazyRRT", "LBTRRT",
     "LazyLBTRRT", "RRTsharp", "RRTXstatic"],
)
def test_tree_family_planners_solve_around_wall(robot, planner_id):
    meta, wall = make_wall_map()
    # density/projection explorers lack RRT's Voronoi pull — more expansions
    iters = {
        "TRRT": 4096, "BiEST": 4096, "SBL": 4096, "BKPIECE1": 4096,
        "LBKPIECE1": 4096, "ProjEST": 6144, "PDST": 6144, "STRIDE": 6144,
    }.get(planner_id, 1024)
    cfg = GlobalPlannerConfig(
        planner_id=planner_id, num_samples=256, seed=3,
        connection_radius=4.0, max_iterations=iters, step_size=0.8,
        planning_timeout=30.0,
    )
    planner = GlobalPlanner(robot, config=cfg)
    if planner_id == "BFMT":
        planner.planner_params.num_samples = 512
        planner.planner_params.radius_multiplier = 1.5
    if planner_id in ("ABITstar", "AITstar"):
        planner.planner_params.samples_per_batch = 96
        planner.planner_params.batches = 3
    planner.setup_problem(meta, 2.0, 2.0, 0.0, 2.0, 8.0, 0.0, wall)
    path = planner.solve()
    assert path is not None, f"{planner_id} found no path"
    np.testing.assert_allclose(path[0], [2.0, 2.0], atol=0.9)
    np.testing.assert_allclose(path[-1], [2.0, 8.0], atol=0.9)
    assert planner.path_cost > 6.0
    assert planner.path_cost < 40.0
    assert _path_is_collision_free(planner, path)


def test_registry_covers_all_reference_bound_planners():
    """Every planner the reference binds (ompl_bindings/bindings.cpp:63-444,
    enumerated in tests/resources/reference/ompl/test_results_geometric_ref.csv)
    has a registry entry, and reference-style dotted ids resolve."""
    import csv
    import pathlib

    from kompass_core_tpu.planning.params import PLANNER_PARAMS
    from kompass_core_tpu.planning.planner import normalize_planner_id

    csv_path = (pathlib.Path(__file__).parent / "resources" / "reference"
                / "ompl" / "test_results_geometric_ref.csv")
    with open(csv_path) as f:
        ref_ids = [row["method"] for row in csv.DictReader(f)]
    assert len(ref_ids) >= 28
    for dotted in ref_ids:
        name = normalize_planner_id(dotted)
        assert name in planner_registry, f"{dotted} unbound"
        assert name in PLANNER_PARAMS, f"{dotted} has no param map"


def test_fleet_planner_solves_all_robots(robot):
    """N start->goal queries over one shared roadmap in one dispatch:
    every robot solved, endpoints right, every edge collision-free."""
    meta, wall = make_wall_map()
    cfg = GlobalPlannerConfig(
        planner_id="PRM", num_samples=256, seed=3, connection_radius=4.0,
    )
    planner = GlobalPlanner(robot, config=cfg)
    planner.setup_problem(meta, 2.0, 2.0, 0.0, 2.0, 8.0, 0.0, wall)
    starts = np.array([[2.0, 2.0], [4.0, 2.0], [8.0, 2.0], [2.0, 8.0]])
    goals = np.array([[2.0, 8.0], [4.0, 8.0], [8.0, 8.0], [8.0, 2.0]])
    paths = planner.solve_fleet(starts, goals)
    assert len(paths) == 4
    for i, path in enumerate(paths):
        assert path is not None, f"robot {i} unsolved"
        np.testing.assert_allclose(path[0], starts[i], atol=1e-5)
        np.testing.assert_allclose(path[-1], goals[i], atol=1e-5)
        for a, b in zip(path[:-1], path[1:]):
            assert planner._segment_free_host(a, b)
    # robots 0/1 cross the wall -> must detour (cost > straight 6.0)
    for i in (0, 1):
        cost = float(np.hypot(*np.diff(paths[i], axis=0).T).sum())
        assert cost > 6.0
    # robot 2 goes through the gap column (x=8): near-straight
    cost2 = float(np.hypot(*np.diff(paths[2], axis=0).T).sum())
    assert cost2 == pytest.approx(6.0, rel=0.15)


def test_fleet_planner_idle_robot_gets_trivial_path(robot):
    """A robot already at its goal must get the zero-length path, not an
    out-and-back detour through a roadmap sample."""
    meta, wall = make_wall_map()
    cfg = GlobalPlannerConfig(
        planner_id="PRM", num_samples=256, seed=3, connection_radius=4.0,
        simplify=False,
    )
    planner = GlobalPlanner(robot, config=cfg)
    planner.setup_problem(meta, 2.0, 2.0, 0.0, 2.0, 8.0, 0.0, wall)
    moving, idle = planner.solve_fleet(
        [[2.0, 2.0], [4.0, 2.0]], [[2.0, 8.0], [4.0, 2.0]]
    )
    assert moving is not None
    assert idle is not None
    assert float(np.hypot(*np.diff(idle, axis=0).T).sum()) == 0.0


def test_fleet_planner_matches_single_robot_quality(robot):
    """A fleet-of-one solve is as good as the single-robot PRM solve on
    the same problem (same map, same sample budget)."""
    meta, wall = make_wall_map()
    cfg = GlobalPlannerConfig(
        planner_id="PRM", num_samples=256, seed=3, connection_radius=4.0,
    )
    planner = GlobalPlanner(robot, config=cfg)
    planner.setup_problem(meta, 2.0, 2.0, 0.0, 2.0, 8.0, 0.0, wall)
    single = planner.solve()
    assert single is not None
    (fleet_path,) = planner.solve_fleet([[2.0, 2.0]], [[2.0, 8.0]])
    assert fleet_path is not None
    fleet_cost = float(np.hypot(*np.diff(fleet_path, axis=0).T).sum())
    assert fleet_cost <= planner.path_cost * 1.2


def test_per_planner_params_surface(robot):
    """available_planners exposes OMPL-style param maps; the setter
    type-checks; params are honored (RRT range drives step size)."""
    from kompass_core_tpu.planning.params import (
        PLANNER_PARAMS,
        create_config_class,
    )

    cfg = GlobalPlannerConfig(planner_id="RRT", seed=5, max_iterations=512)
    planner = GlobalPlanner(robot, config=cfg)
    plans = planner.available_planners
    assert "kompass.geometric.RRT" in plans
    assert "goal_bias" in plans["kompass.geometric.RRT"]
    # every registry id carries a param map entry
    for key, params in plans.items():
        for name, tup in params.items():
            assert len(tup) == 4  # (display, type, range, default)

    # default instance exists and is the generated class
    rrt_cls = create_config_class("RRT", PLANNER_PARAMS["RRT"])
    assert isinstance(planner.planner_params, rrt_cls)
    # wrong class rejected
    est_cls = create_config_class("EST", PLANNER_PARAMS["EST"])
    with pytest.raises(ValueError):
        planner.planner_params = est_cls()
    # validation on generated fields
    with pytest.raises(ValueError):
        rrt_cls(goal_bias=2.0)

    # the `range` param is honored: a tiny step bounds consecutive points
    meta, wall = make_wall_map()
    pp = rrt_cls(range=0.3, goal_bias=0.2)
    planner.planner_params = pp
    planner.setup_problem(meta, 2.0, 2.0, 0.0, 2.0, 8.0, 0.0, wall)
    path = planner.solve()
    assert path is not None
    raw = planner.solution  # simplified; check pre-goal hops instead
    # re-solve without simplification to observe raw steps
    cfg2 = GlobalPlannerConfig(
        planner_id="RRT", seed=5, max_iterations=512, simplify=False
    )
    p2 = GlobalPlanner(robot, config=cfg2)
    p2.planner_params = rrt_cls(range=0.3, goal_bias=0.2)
    p2.setup_problem(meta, 2.0, 2.0, 0.0, 2.0, 8.0, 0.0, wall)
    path2 = p2.solve()
    assert path2 is not None
    steps = np.hypot(*np.diff(np.asarray(path2[:-1]), axis=0).T)
    assert np.max(steps) <= 0.3 + 1e-5


def test_lazy_prm_range_caps_edge_length(robot):
    """LazyPRM's `range` param (OMPL: max edge length) is honored: with
    simplification off, no solution edge exceeds it."""
    meta = {
        "resolution": 0.1, "width": 100, "height": 100,
        "origin_x": 0.0, "origin_y": 0.0,
    }
    cfg = GlobalPlannerConfig(
        planner_id="LazyPRM", num_samples=512, seed=1,
        connection_radius=4.0, simplify=False,
    )
    planner = GlobalPlanner(robot, config=cfg)
    planner.planner_params.range = 1.2
    planner.planner_params.max_nearest_neighbors = 0
    planner.setup_problem(meta, 1.0, 1.0, 0.0, 9.0, 9.0, 0.0, None)
    path = planner.solve()
    assert path is not None
    steps = np.hypot(*np.diff(np.asarray(path), axis=0).T)
    assert np.max(steps) <= 1.2 + 1e-5


def test_optimize_rounds_keep_best(robot):
    meta, wall = make_wall_map()
    base = dict(
        planner_id="RRT", num_samples=256, max_iterations=768, step_size=0.8
    )
    costs_single = []
    for seed in (3, 4, 5):
        p = GlobalPlanner(
            robot, config=GlobalPlannerConfig(seed=seed, **base)
        )
        p.setup_problem(meta, 2.0, 2.0, 0.0, 2.0, 8.0, 0.0, wall)
        if p.solve() is not None:
            costs_single.append(p.path_cost)
    p = GlobalPlanner(
        robot,
        config=GlobalPlannerConfig(seed=3, optimize_rounds=3, **base),
    )
    p.setup_problem(meta, 2.0, 2.0, 0.0, 2.0, 8.0, 0.0, wall)
    assert p.solve() is not None
    assert p.path_cost <= min(costs_single) + 1e-6


def test_use_fcl_false_skips_collision(robot):
    meta, wall = make_wall_map()
    cfg = GlobalPlannerConfig(planner_id="PRM", num_samples=256, seed=1)
    planner = GlobalPlanner(robot, config=cfg, use_fcl=False)
    planner.setup_problem(meta, 2.0, 2.0, 0.0, 2.0, 8.0, 0.0, wall)
    path = planner.solve()
    assert path is not None
    # without collision checking the straight line through the wall wins
    assert planner.path_cost == pytest.approx(6.0, rel=0.1)


def test_shortcut_cannot_tunnel_thin_wall(robot):
    """Shortcut segments are checked at resolution-scaled density — a
    fixed 32-sample check let long shortcuts step clean over a thin wall
    (review-fix regression)."""
    meta = {
        "resolution": 0.1,
        "width": 400,
        "height": 400,
        "origin_x": 0.0,
        "origin_y": 0.0,
    }
    xs = np.arange(0.0, 36.0, 0.05)  # thin wall y=20, gap x>36
    wall = np.stack([xs, np.full_like(xs, 20.0), np.zeros_like(xs)], axis=1)
    cfg = GlobalPlannerConfig(planner_id="PRM", num_samples=128, seed=3)
    planner = GlobalPlanner(robot, config=cfg)
    planner.setup_problem(
        meta.copy(), 2.0, 2.0, 0.0, 2.2, 38.0, 0.0, wall
    )
    a = np.array([2.0, 2.0], np.float32)
    b = np.array([2.2, 38.0], np.float32)
    assert not planner._segment_free_host(a, b)
    shortened = planner._shortcut(
        np.array([[2.0, 2.0], [37.0, 19.0], [37.0, 21.0], [2.2, 38.0]])
    )
    assert len(shortened) > 2  # must keep routing around the wall


def test_ctor_accepts_configure_format_file(robot, tmp_path):
    """A configure()-format file (config under 'ompl' + per-planner
    sections) passed as config_file= must load instead of silently
    no-op'ing (review-fix regression)."""
    import yaml

    cfg_file = tmp_path / "planner.yaml"
    cfg_file.write_text(
        yaml.safe_dump(
            {"ompl": {"planner_id": "RRT", "num_samples": 128,
                      "RRT": {"goal_bias": 0.3}}}
        )
    )
    planner = GlobalPlanner(robot, config_file=str(cfg_file))
    assert planner._config.planner_id == "RRT"
    assert planner._config.num_samples == 128
    assert planner._planner_params.goal_bias == pytest.approx(0.3)
    flat = tmp_path / "flat.yaml"
    flat.write_text(yaml.safe_dump({"planner_id": "PRM"}))
    planner2 = GlobalPlanner(robot, config_file=str(flat))
    assert planner2._config.planner_id == "PRM"


def test_planner_params_validate_on_setattr(robot):
    """Out-of-range per-planner params are rejected at assignment, not
    just construction (review-fix regression: configure()/from_file set
    via plain setattr)."""
    cfg = GlobalPlannerConfig(planner_id="RRT")
    planner = GlobalPlanner(robot, config=cfg)
    with pytest.raises(ValueError):
        planner._planner_params.goal_bias = 5.0
    planner._planner_params.goal_bias = 0.2
    assert planner._planner_params.goal_bias == pytest.approx(0.2)


def test_ompl_geometric_config_surface(robot):
    """The reference OMPLGeometricConfig fields construct and are honored
    (third_party/ompl/planner.py:19-41)."""
    from kompass_core_tpu.planning import OMPLGeometricConfig

    cfg = OMPLGeometricConfig(
        planner_id="PRM",
        planning_timeout=5.0,
        simplification_timeout=1.0,
        goal_tolerance=1e-3,
        optimization_objective="PathLengthOptimizationObjective",
        optimization_objective_threshold=1.0,
        num_samples=256,
        connection_radius=4.0,
        seed=3,
    )
    meta, wall = make_wall_map()
    planner = GlobalPlanner(robot, config=cfg)
    planner.setup_problem(meta, 2.0, 2.0, 0.0, 2.0, 8.0, 0.0, wall)
    path = planner.solve()
    assert path is not None
    # goal_tolerance honored: the endpoint lands on the goal
    assert np.hypot(*(np.asarray(path)[-1] - [2.0, 8.0])) <= 1e-3


def test_objective_threshold_stops_refinement(robot):
    """With a huge length threshold, multi-round refinement must stop
    after the first successful round (OMPL objective-threshold
    semantics); with a tiny one it runs all rounds."""
    meta, wall = make_wall_map()
    base = dict(
        planner_id="RRT", num_samples=256, seed=3, connection_radius=4.0,
        max_iterations=1024, step_size=0.8, optimize_rounds=4,
    )
    calls = []

    def counting_solver(orig):
        def run(planner, prob, seed=0):
            calls.append(seed)
            return orig(planner, prob, seed=seed)

        return run

    orig = planner_registry["RRT"]
    planner_registry["RRT"] = counting_solver(orig)
    try:
        cfg = GlobalPlannerConfig(
            **base, optimization_objective_threshold=1e3
        )
        p = GlobalPlanner(robot, config=cfg)
        p.setup_problem(meta, 2.0, 2.0, 0.0, 2.0, 8.0, 0.0, wall)
        assert p.solve() is not None
        early = len(calls)
        calls.clear()
        # default (None): never satisfied -> the full optimize_rounds
        # budget runs, matching the reference where the knob is declared
        # but never consumed by OMPL
        cfg2 = GlobalPlannerConfig(**base)
        p2 = GlobalPlanner(robot, config=cfg2)
        p2.setup_problem(meta, 2.0, 2.0, 0.0, 2.0, 8.0, 0.0, wall)
        assert p2.solve() is not None
        assert early == 1
        assert len(calls) == 4  # no threshold -> all rounds run
    finally:
        planner_registry["RRT"] = orig


def test_clearance_objective_prefers_wider_berth(robot):
    """max_min_clearance round selection keeps the solution with the
    larger minimum obstacle clearance, not the shorter one."""
    meta, wall = make_wall_map()
    base = dict(
        planner_id="PRM", num_samples=256, connection_radius=4.0,
        optimize_rounds=3, seed=3,
    )
    cfg_len = GlobalPlannerConfig(**base, optimization_objective="length")
    cfg_clr = GlobalPlannerConfig(
        **base,
        optimization_objective="max_min_clearance",
        optimization_objective_threshold=100.0,  # unattainable: all rounds
    )
    p_len = GlobalPlanner(robot, config=cfg_len)
    p_len.setup_problem(meta, 2.0, 2.0, 0.0, 2.0, 8.0, 0.0, wall)
    path_len = p_len.solve()
    p_clr = GlobalPlanner(robot, config=cfg_clr)
    p_clr.setup_problem(meta, 2.0, 2.0, 0.0, 2.0, 8.0, 0.0, wall)
    path_clr = p_clr.solve()
    assert path_len is not None and path_clr is not None
    assert p_clr._min_clearance(path_clr) >= p_clr._min_clearance(path_len)


def test_rewire_edge_check_density_covers_rewire_radius(robot, monkeypatch):
    """RRT*-family choose-parent/rewire edges span up to
    rewire_factor * 2 * step — the edge-check density must be sized for
    THAT span, not the steering step, or a rewire edge crossing a
    one-cell inflated wall can sample right past it (round-5 review)."""
    from kompass_core_tpu.planning import planners_ext

    seen = []
    orig = planners_ext._edge_checks_for_radius

    def spy(cfg, res, radius):
        seen.append(float(radius))
        return orig(cfg, res, radius)

    monkeypatch.setattr(planners_ext, "_edge_checks_for_radius", spy)
    meta, wall = make_wall_map()
    cfg = GlobalPlannerConfig(
        planner_id="RRTstar", num_samples=128, seed=3,
        max_iterations=256, step_size=0.8,
    )
    planner = GlobalPlanner(robot, config=cfg)
    planner.setup_problem(meta, 2.0, 2.0, 0.0, 2.0, 8.0, 0.0, wall)
    planner.solve()
    # default rewire_factor=1.0 -> checked span 2 * step
    assert seen and max(seen) >= 2.0 * 0.8 - 1e-6
    # plain RRT keeps the step-sized span (no rewire edges exist)
    seen.clear()
    cfg2 = GlobalPlannerConfig(
        planner_id="RRT", num_samples=128, seed=3,
        max_iterations=256, step_size=0.8,
    )
    p2 = GlobalPlanner(robot, config=cfg2)
    p2.setup_problem(meta, 2.0, 2.0, 0.0, 2.0, 8.0, 0.0, wall)
    p2.solve()
    assert seen and max(seen) <= 0.8 + 1e-6
