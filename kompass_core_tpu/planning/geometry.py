"""Shared planning-space geometry: occupancy field + validity checks.

The planning analog of the engine's point-robot + margin collision model
(replacing the reference's per-state FCL callback, ``ompl.cpp:87-100``):
obstacle points are rasterized into an occupancy grid inflated by the
robot's circumscribed radius with a disc dilation, and state/edge validity
are dense tensor lookups against it.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np


def build_inflated_grid(
    obstacle_points: np.ndarray,
    origin_xy,
    width: int,
    height: int,
    resolution: float,
    inflation_radius: float,
):
    """Rasterize obstacle points and inflate by the robot radius.

    Returns a bool grid [H, W] where True = blocked. Inflation is a disc
    dilation via ``lax.conv_general_dilated``.
    """
    pts = np.asarray(obstacle_points, np.float64)
    pts = pts.reshape(-1, pts.shape[-1])
    # floor, not int-truncation: truncation would pull points up to one
    # cell left/below the origin into row/column 0 (point_free floors too)
    gx = np.floor((pts[:, 0] - origin_xy[0]) / resolution).astype(np.int64)
    gy = np.floor((pts[:, 1] - origin_xy[1]) / resolution).astype(np.int64)
    ok = (gx >= 0) & (gx < width) & (gy >= 0) & (gy < height)
    occ = np.zeros((height, width), dtype=bool)
    occ[gy[ok], gx[ok]] = True

    r_cells = int(math.ceil(inflation_radius / resolution))
    if r_cells == 0:
        return jnp.asarray(occ)

    yy, xx = np.mgrid[-r_cells : r_cells + 1, -r_cells : r_cells + 1]
    disc = (xx * xx + yy * yy) <= r_cells * r_cells

    occ_f = jnp.asarray(occ, jnp.float32)
    blocked = (
        jax.lax.conv_general_dilated(
            occ_f[None, None, :, :],
            jnp.asarray(disc, jnp.float32)[None, None, :, :],
            window_strides=(1, 1),
            padding=((r_cells, r_cells), (r_cells, r_cells)),
        )[0, 0]
        > 0.5
    )
    return blocked


def point_free(blocked, origin_xy, resolution, xy):
    """True if the world point lies in free, in-bounds space."""
    gx = jnp.floor((xy[..., 0] - origin_xy[0]) / resolution).astype(jnp.int32)
    gy = jnp.floor((xy[..., 1] - origin_xy[1]) / resolution).astype(jnp.int32)
    H, W = blocked.shape
    in_bounds = (gx >= 0) & (gx < W) & (gy >= 0) & (gy < H)
    gx = jnp.clip(gx, 0, W - 1)
    gy = jnp.clip(gy, 0, H - 1)
    return in_bounds & ~blocked[gy, gx]


def segment_free(blocked, origin_xy, resolution, a, b, num_check: int):
    """All ``num_check`` interpolation points of segment a->b free.
    a, b: [..., 2]."""
    t = jnp.linspace(0.0, 1.0, num_check)
    pts = a[..., None, :] + t[:, None] * (b[..., None, :] - a[..., None, :])
    return jnp.all(point_free(blocked, origin_xy, resolution, pts), axis=-1)
