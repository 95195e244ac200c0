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


def mesh_collective_cost(n: int = 16, rays: int = 128, reps: int = 10):
    """Per-tick cost of the peer all-gather on the 8-device VIRTUAL mesh
    (VERDICT r4 #1 'measure the collective on the virtual mesh').

    Times the peer tick three ways on the CPU mesh — single-device,
    mesh-sharded with peers (1 all-gather/tick), mesh-sharded without
    peers (0 collectives) — so the mesh-vs-single delta separates into
    shard_map overhead (visible in the no-peer pair) and the gather
    itself. A virtual mesh shares one host's cores, so these are
    host-contention-bounded UPPER bounds on the real-ICI cost; the
    gathered block is N*28 bytes (64 robots -> 1.8 kB), which on v5e
    ICI is ~microseconds.

    Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
         python -m kompass_core_tpu.benchmark.peer_bench --mesh
    """
    import time

    import jax

    # the session sitecustomize pins jax_platforms to the remote TPU
    # backend via jax.config (env vars alone do not win); this harness
    # is defined on the virtual CPU mesh, so force CPU the same way the
    # test conftest does
    jax.config.update("jax_platforms", "cpu")

    from ..control import DWAConfig, TrajectoryCostsWeights
    from ..models import (
        AngularCtrlLimits,
        LinearCtrlLimits,
        Robot,
        RobotCtrlLimits,
        RobotGeometry,
        RobotType,
    )
    from ..parallel import build_fleet_mesh
    from ..parallel.fleet_v2 import DeviceFleet

    assert len(jax.devices()) >= 8, "needs the 8-device virtual mesh"

    def build(peer, mesh):
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
            max_linear_samples=10,
            max_angular_samples=10,
            costs_weights=TrajectoryCostsWeights(
                reference_path_distance_weight=3.0,
                goal_distance_weight=1.0,
                obstacles_distance_weight=2.0,
            ),
            prediction_horizon=10,
            control_horizon=2,
            control_time_step=0.1,
        )
        fleet = DeviceFleet(
            robots, limits, config, scan_rays=rays, path_capacity=512,
            max_segments=16, peer_avoidance=peer, mesh=mesh,
        )
        fleet.set_paths(
            [np.array([[2.0 * i, 0.0], [2.0 * i, 5.0]]) for i in range(n)]
        )
        return fleet

    states = np.array(
        [[2.0 * i, 0.0, np.pi / 2, 0.0] for i in range(n)], np.float32
    )
    vels = np.zeros((n, 3), np.float32)
    ranges = np.full((n, rays), 10.0, np.float32)
    angles = np.linspace(0, 2 * np.pi, rays, endpoint=False)

    out = {}
    for name, peer, mesh in (
        ("peer_single_device", True, None),
        ("peer_mesh8", True, build_fleet_mesh()),
        ("nopeer_mesh8", False, build_fleet_mesh()),
    ):
        fleet = build(peer, mesh)
        fleet.tick(states, vels, ranges, angles)  # compile
        t0 = time.perf_counter()
        for _ in range(reps):
            fleet.tick(states, vels, ranges, angles)
        ms = 1e3 * (time.perf_counter() - t0) / reps
        out[name] = round(ms, 3)
        print(name, out[name], "ms/tick", flush=True)
    out["note"] = (
        "virtual 8-device CPU mesh (host-contention-bounded upper "
        "bounds); gathered peer block is n*28 bytes/tick"
    )
    out["n_robots"] = n
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    import sys

    if "--mesh" in sys.argv:
        mesh_collective_cost()
    else:
        main()
