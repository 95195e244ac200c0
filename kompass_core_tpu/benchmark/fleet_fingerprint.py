"""Tunnel-free fingerprint of the fleet-v2 tick program (VERDICT r4 #3).

Builds the BASELINE-headline DeviceFleet (n robots, 45x45 grid, 30-step
horizon, 512 rays) from the repo tree given as argv[1], lowers the tick
program (no compile, no backend), strips location metadata, and prints a
SHA-256 of the normalized StableHLO. Identical hashes across two trees
prove the traced program — and therefore the compiled TPU executable
under the same jaxlib — is unchanged.

Usage: python fleet_fingerprint.py <repo_root> [n_robots]
"""

import hashlib
import re
import sys

repo = sys.argv[1]
n_robots = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
sys.path.insert(0, repo)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from kompass_core_tpu.control import (  # noqa: E402
    DWAConfig,
    TrajectoryCostsWeights,
)
from kompass_core_tpu.models import (  # noqa: E402
    AngularCtrlLimits,
    LinearCtrlLimits,
    Robot,
    RobotCtrlLimits,
    RobotGeometry,
    RobotType,
)
from kompass_core_tpu.parallel.fleet_v2 import DeviceFleet  # noqa: E402

scan_rays = 512
robots = [
    Robot(
        robot_type=RobotType.DIFFERENTIAL_DRIVE,
        geometry_type=RobotGeometry.Type.CYLINDER,
        geometry_params=np.array([0.3, 0.4]),
    )
    for _ in range(n_robots)
]
limits = RobotCtrlLimits(
    vx_limits=LinearCtrlLimits(max_vel=1.0, max_acc=5.0, max_decel=10.0),
    omega_limits=AngularCtrlLimits(max_vel=2.0, max_acc=3.0, max_decel=3.0),
)
config = DWAConfig(
    max_linear_samples=45,
    max_angular_samples=44,
    prediction_horizon=30,
    control_horizon=6,
    control_time_step=0.1,
    max_point_interpolation_distance=0.01,
    costs_weights=TrajectoryCostsWeights(
        reference_path_distance_weight=2.0,
        goal_distance_weight=1.0,
        obstacles_distance_weight=1.0,
        smoothness_weight=0.1,
        jerk_weight=0.05,
    ),
)
fleet = DeviceFleet(
    robots, limits, config, scan_rays=scan_rays, path_capacity=1024,
    max_segments=16,
)
paths = []
for i in range(n_robots):
    x0 = 0.1 * i
    paths.append(np.array([[x0, 0.0], [x0 + 4.0, 0.5]]))
fleet.set_paths(paths)
angles = np.linspace(-np.pi, np.pi, scan_rays, endpoint=False)
fleet.set_scan_angles(angles)

inputs = np.zeros((fleet._n, 4 + 3 + scan_rays), np.float32)
low = fleet._tick_fn.lower(
    fleet._paths, fleet._cfg, fleet._carry, fleet._angles, inputs
)
text = low.as_text()
# normalize: drop loc(...) refs and #loc lines (file paths / line numbers
# differ across trees), and trailing whitespace
text = re.sub(r"\s*loc\(#?loc\d*\)", "", text)
text = "\n".join(
    ln.rstrip() for ln in text.splitlines()
    if not ln.lstrip().startswith("#loc")
)
h = hashlib.sha256(text.encode()).hexdigest()
print(f"repo={repo} n={n_robots} lines={len(text.splitlines())}")
print(f"stablehlo_sha256={h}")
