"""Measured cost of fleet mutual avoidance (PARITY.md beyond-reference row).

Slope-times the 64-robot fleet tick without peers, with
``peer_avoidance=True``, and with ``peer_prediction=True`` on top, at
BASELINE solve shapes (2025 samples x 30 steps, 512-ray scans).
2026-08-20 AM: 33.5 -> 45.5 ms e2e per tick (+36%) — the obstacle axis
grows 512 -> 1088 -> 2048 pow2-padded points (ring=8). Same-day PM
three-way run: 36.3 / 44.9 / 51.6 ms — prediction adds +15% over plain
peers (the moving sweep's 2 FMAs over the enlarged axis). e2e includes
host packing + tunnel transfers, which all variants pay identically;
the deltas are device-side sweep growth.

Run on the real TPU: python -m kompass_core_tpu.benchmark.peer_bench
"""

import json

import numpy as np


def main(n: int = 64, rays: int = 512):
    from ..control import DWAConfig, TrajectoryCostsWeights
    from ..models import (
        AngularCtrlLimits,
        LinearCtrlLimits,
        Robot,
        RobotCtrlLimits,
        RobotGeometry,
        RobotType,
    )
    from ..parallel.fleet_v2 import DeviceFleet
    from ..utils.runtime import enable_persistent_compilation_cache
    from .runner import measure_throughput_slope, slope_variants_needed

    enable_persistent_compilation_cache()
    out = {}
    for peer, predict in ((False, False), (True, False), (True, True)):
        robots = [
            Robot(
                robot_type=RobotType.DIFFERENTIAL_DRIVE,
                geometry_type=RobotGeometry.Type.CYLINDER,
                geometry_params=np.array([0.3, 0.4]),
            )
            for _ in range(n)
        ]
        limits = RobotCtrlLimits(
            vx_limits=LinearCtrlLimits(
                max_vel=1.0, max_acc=5.0, max_decel=10.0
            ),
            omega_limits=AngularCtrlLimits(
                max_vel=4.0, max_acc=3.0, max_decel=3.0, max_steer=np.pi
            ),
        )
        config = DWAConfig(
            max_linear_samples=45,
            max_angular_samples=45,
            costs_weights=TrajectoryCostsWeights(
                reference_path_distance_weight=3.0,
                goal_distance_weight=1.0,
                smoothness_weight=1.0,
                jerk_weight=1.0,
                obstacles_distance_weight=2.0,
            ),
            prediction_horizon=30,
            control_horizon=2,
            control_time_step=0.1,
        )
        fleet = DeviceFleet(
            robots, limits, config, scan_rays=rays, path_capacity=512,
            max_segments=16, peer_avoidance=peer,
            peer_prediction=predict,
        )
        paths, states = [], []
        for i in range(n):
            x0 = 2.0 * i
            paths.append(np.array([[x0, 0.0], [x0, 5.0]]))
            states.append([x0, 0.0, np.pi / 2, 0.0])
        fleet.set_paths(paths)
        states = np.array(states, np.float32)
        angles = np.linspace(0, 2 * np.pi, rays, endpoint=False)
        rng = np.random.default_rng(0)
        variants = [
            states
            + np.float32(1e-4)
            * rng.standard_normal(states.shape).astype(np.float32)
            for _ in range(slope_variants_needed())
        ]
        vels = np.zeros((n, 3), np.float32)
        ranges = np.full((n, rays), 10.0, np.float32)
        name = f"fleet{n}_peer_{peer}" + ("_predict" if predict else "")
        r = measure_throughput_slope(
            name,
            lambda s: fleet.tick(s, vels, ranges, angles),
            variants,
            lambda o: float(o["cost"][0]),
        )
        out[name] = {
            "ms_per_tick": r["mean_ms"],
            "us_per_robot": 1e3 * r["mean_ms"] / n,
        }
        print(name, round(r["mean_ms"], 3), "ms/tick", flush=True)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
