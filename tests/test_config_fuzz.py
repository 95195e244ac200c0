"""Config-space fuzz: randomized solver/controller configurations compile
and produce sane commands.

Sweeps the static compile space the shape-specialized device programs
must serve — sample-grid sizes, horizons, drop vs truncate, kinematics,
robot geometries (incl. exact-box collision), scan sizes — running one
closed-loop step each on tiny shapes. Guards the packed-buffer layout and
masking logic against shape-dependent regressions that fixed-size tests
cannot see."""

import math

import numpy as np
import pytest

from kompass_core_tpu.control import DWA, DWAConfig, TrajectoryCostsWeights
from kompass_core_tpu.datatypes import LaserScanData
from kompass_core_tpu.models import (
    AngularCtrlLimits,
    LinearCtrlLimits,
    Robot,
    RobotCtrlLimits,
    RobotGeometry,
    RobotState,
    RobotType,
)

CASES = [
    # (seed, robot_type, geometry, lin_samples, ang_samples, horizon, drop)
    (0, RobotType.DIFFERENTIAL_DRIVE, ("CYLINDER", [0.2, 0.3]), 3, 5, 4, True),
    (1, RobotType.DIFFERENTIAL_DRIVE, ("CYLINDER", [0.2, 0.3]), 7, 3, 7, False),
    (2, RobotType.ACKERMANN, ("BOX", [0.5, 0.3, 0.2]), 4, 4, 5, True),
    (3, RobotType.OMNI, ("CYLINDER", [0.15, 0.3]), 5, 4, 6, True),
    (4, RobotType.OMNI, ("SPHERE", [0.25]), 4, 6, 3, False),
    (5, RobotType.ACKERMANN, ("CYLINDER", [0.1, 0.4]), 9, 2, 8, True),
]


@pytest.mark.parametrize(
    "seed,robot_type,geometry,lin,ang,horizon,drop", CASES
)
def test_random_config_one_step(
    seed, robot_type, geometry, lin, ang, horizon, drop
):
    rng = np.random.default_rng(seed)
    geom_type, geom_params = geometry
    robot = Robot(
        robot_type=robot_type,
        geometry_type=RobotGeometry.Type[geom_type],
        geometry_params=np.asarray(geom_params),
    )
    limits = RobotCtrlLimits(
        vx_limits=LinearCtrlLimits(
            max_vel=float(rng.uniform(0.5, 1.5)), max_acc=3.0, max_decel=5.0
        ),
        omega_limits=AngularCtrlLimits(
            max_vel=float(rng.uniform(1.0, 2.5)),
            max_acc=5.0,
            max_decel=5.0,
            max_steer=math.pi,
        ),
        vy_limits=LinearCtrlLimits(max_vel=0.8, max_acc=3.0, max_decel=5.0),
    )
    cfg = DWAConfig(
        max_linear_samples=lin,
        max_angular_samples=ang,
        prediction_horizon=horizon,
        control_horizon=min(2, horizon),
        control_time_step=0.1,
        drop_samples=drop,
        costs_weights=TrajectoryCostsWeights(
            reference_path_distance_weight=2.0,
            goal_distance_weight=1.0,
            obstacles_distance_weight=1.0,
            smoothness_weight=0.2,
            jerk_weight=0.1,
        ),
    )
    ctrl = DWA(robot=robot, ctrl_limits=limits, config=cfg)
    # short wiggly path ahead of the robot
    xs = np.linspace(0.0, 1.5, 12)
    ys = 0.1 * np.sin(xs * 3.0)
    ctrl.set_path(list(zip(xs.tolist(), ys.tolist())))

    # scan with a clutter point off to the side (non-blocking)
    n_rays = int(rng.integers(32, 128))
    angles = np.linspace(-math.pi, math.pi, n_rays, endpoint=False)
    ranges = np.full(n_rays, 8.0)
    side = np.abs(np.mod(angles - math.pi / 2 + math.pi, 2 * math.pi) - math.pi) < 0.3
    ranges[side] = 1.5
    scan = LaserScanData(angles=angles, ranges=ranges)

    state = RobotState(x=0.0, y=0.0, yaw=0.0, speed=0.2, vx=0.2)
    ok = ctrl.loop_step(current_state=state, laser_scan=scan)
    assert ok, "solver found no command on an open path"
    result = ctrl._result
    assert result.is_found
    assert np.isfinite(result.cost)
    vx0 = float(ctrl.linear_x_control[0])
    w0 = float(ctrl.angular_control[0])
    assert abs(vx0) <= limits.vx_limits.max_vel + 1e-5
    assert abs(w0) <= limits.omega_limits.max_vel + 1e-5
    if robot_type == RobotType.OMNI:
        assert abs(float(ctrl.linear_y_control[0])) <= (
            limits.vy_limits.max_vel + 1e-5
        )
    # the winner must carry a finite rollout
    assert np.all(np.isfinite(result.trajectory.path_x))
    assert np.all(np.isfinite(result.trajectory.path_y))


MAPPER_CASES = [
    # (width, height, resolution, n_rays, bayesian, range_val)
    (3.0, 3.0, 0.05, 48, False, 1.0),
    (6.0, 4.0, 0.1, 72, True, 1.8),
    (2.0, 5.0, 0.2, 36, False, 0.9),
    (8.0, 8.0, 0.25, 180, True, 3.5),
]


@pytest.mark.parametrize(
    "width,height,resolution,n_rays,bayesian,range_val", MAPPER_CASES
)
def test_mapper_config_fuzz(
    width, height, resolution, n_rays, bayesian, range_val
):
    """Mapper compile-space sweep: asymmetric grids, coarse/fine
    resolutions, small/large scans, plain + Bayesian — every config must
    stamp an occupied ring at the scan radius and free space inside it."""
    from kompass_core_tpu.datatypes.pose import PoseData
    from kompass_core_tpu.datatypes.scan_model import ScanModelConfig
    from kompass_core_tpu.mapping import LocalMapper, MapConfig
    from kompass_core_tpu.mapping.local_mapper import EMPTY, OCCUPIED

    config = MapConfig(
        width=width,
        height=height,
        resolution=resolution,
        baysian_update=bayesian,
    )
    mapper = LocalMapper(config, ScanModelConfig(p_prior=0.5))
    angles = np.linspace(0, 2 * np.pi, n_rays, endpoint=False)
    scan = LaserScanData(ranges=np.full(n_rays, range_val), angles=angles)
    mapper.update_from_scan(PoseData(), scan)
    occ = (
        mapper.probabilistic_occupancy if bayesian else mapper.occupancy
    )
    assert occ.shape == mapper.occupancy.shape
    assert np.sum(occ == OCCUPIED) > 0, "scan ring must stamp occupied"
    assert np.sum(occ == EMPTY) > 0, "interior must be free"
    # the robot cell itself is free space
    ci, cj = mapper._spec.central_point
    assert occ[ci, cj] == EMPTY
