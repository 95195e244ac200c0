"""Collision-model calibration vs an exact voxel-box reference.

The reference checks a robot circle against octree voxel boxes built from
scan points (``collision_check.cpp:149-163``: point snapped to a voxel
center, box of side = octree resolution). This engine uses a point-robot
model: distance(raw point, robot center) < radius + margin, with margin
defaulting to COLLISION_MARGIN_FACTOR * resolution (SURVEY §7 "tune
inflation to octree resolution").

This test implements the voxel model exactly (2D circle-vs-AABB on the
snapped voxel) in numpy and measures per-pose keep/drop agreement of the
point model across random scenes — pinning that the default margin stays
a faithful substitute and guarding future regressions.
"""

import numpy as np
import pytest


def voxel_model_collides(points, cx, cy, radius, res):
    """Exact: snap each point to its voxel center, test circle vs the
    voxel's AABB (side = res)."""
    vox = (np.floor(points / res) + 0.5) * res  # voxel centers
    half = res / 2.0
    # closest point on each AABB to the circle center
    qx = np.clip(cx, vox[:, 0] - half, vox[:, 0] + half)
    qy = np.clip(cy, vox[:, 1] - half, vox[:, 1] + half)
    d2 = (qx - cx) ** 2 + (qy - cy) ** 2
    return bool(np.any(d2 < radius * radius))


def point_model_collides(points, cx, cy, radius, margin):
    d2 = (points[:, 0] - cx) ** 2 + (points[:, 1] - cy) ** 2
    r = radius + margin
    return bool(np.any(d2 < r * r))


@pytest.mark.parametrize("res", [0.05, 0.1, 0.2])
def test_point_model_agreement_with_voxel_model(res):
    from kompass_core_tpu.ops.solver import COLLISION_MARGIN_FACTOR

    rng = np.random.default_rng(0)
    radius = 0.3
    margin = res * COLLISION_MARGIN_FACTOR
    n_scenes = 200
    poses_per_scene = 50
    agree = 0
    total = 0
    false_free = 0  # point model says free, voxel model says collide
    for _ in range(n_scenes):
        n_pts = rng.integers(20, 120)
        pts = rng.uniform(-2, 2, (n_pts, 2))
        for _ in range(poses_per_scene):
            cx, cy = rng.uniform(-1.5, 1.5, 2)
            v = voxel_model_collides(pts, cx, cy, radius, res)
            p = point_model_collides(pts, cx, cy, radius, margin)
            agree += v == p
            false_free += v and not p
            total += 1
    agreement = agree / total
    # dense random clutter is the worst case; real scan surfaces agree
    # better. Calibrated values for factor 0.7: >=96% agreement, ~1% unsafe
    assert agreement > 0.95, f"agreement {agreement:.3f} at res={res}"
    # unsafe disagreements (missing a contact the voxel model reports)
    assert false_free / total < 0.02


def test_margin_zero_is_too_permissive():
    """Sanity: without the voxel margin, the point model misses contacts
    the voxel model reports (justifies the default)."""
    rng = np.random.default_rng(1)
    res = 0.1
    radius = 0.3
    misses = 0
    total = 0
    for _ in range(300):
        pts = rng.uniform(-1, 1, (40, 2))
        cx, cy = rng.uniform(-0.8, 0.8, 2)
        v = voxel_model_collides(pts, cx, cy, radius, res)
        p0 = point_model_collides(pts, cx, cy, radius, 0.0)
        misses += v and not p0
        total += 1
    assert misses > 0  # margin-less model provably diverges
