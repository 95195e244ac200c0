"""Pallas TPU kernels for the solver's hot distance reductions.

The DWA tick's dominant cost is two batched min-distance sweeps
(rollout points vs obstacle points, rollout points vs tracked-segment
points — the TPU analog of the reference's ``obstaclesDistCostKernel`` and
``refPathCostKernel`` SYCL kernels, ``cost_evaluator_gpu.cpp:397-544,
848-972``). At the BASELINE workload the two sweeps are ~88% of the
batch-64 solve, so this is the kernel that decides the headline number.

Two hand-written formulations, both computing BOTH sweeps in ONE kernel
launch (shared point loads, one pass over the [S*T] point axis):

  * ``mxu``: d2(p,o) = |p|^2 + |o|^2 - 2 p.o — the cross term for an
    (obstacle-tile x point-block) is a small K=2 matmul on the systolic
    array; obstacle tiles stream through a running min held in registers
    (the round-1 kernel's loss came from streaming the whole [O, BLK]
    product; tiling + fusion fix that).
  * ``vpu``: pure elementwise broadcast-FMA per obstacle tile:
    t = fma(-2px, ox, fma(-2py, oy, |o|^2)), acc = min(acc, t) — 3 VPU
    ops per (point, obstacle) pair vs ~6 for XLA's fused
    subtract/square/add/min, with no MXU K-padding waste.

Orientation: obstacles on sublanes, points on lanes — per-point minima
land along lanes, so the per-tile reduce is (TO/8 - 1) vectorized [8, BLK]
mins + one intra-tile sublane fold, and results write straight out with
no transpose.

The public entries are numerically within float32 tolerance of the XLA
path (`ops/solver._min_obstacle_dist_sq`); the solver selects the backend
via ``SolverSpec.backend`` ("xla" | "pallas" | "pallas_vpu").
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 512  # points per grid step (lane-dim multiples of 128)
_TO = 256  # obstacle/segment rows per VMEM tile

_BIG = 1e8


def _round_up(n, m):
    return ((n + m - 1) // m) * m


# ---------------------------------------------------------------------------
# fused two-sweep kernel
# ---------------------------------------------------------------------------


def _fused_kernel_mxu(o_tiles, s_tiles, pt_ref, obs_ref, onorm_ref, seg_ref,
                      snorm_ref, outo_ref, outs_ref):
    """One point block [2, BLK] vs all obstacle + segment tiles (MXU
    cross-term)."""
    pts = pt_ref[:]  # [2, BLK]
    pnorm = pts[0, :] * pts[0, :] + pts[1, :] * pts[1, :]  # [BLK]

    def sweep(src_ref, norm_ref, n_tiles):
        def body(t, acc):
            tile = src_ref[pl.ds(t * _TO, _TO), :]  # [TO, 2]
            ntile = norm_ref[pl.ds(t * _TO, _TO), :]  # [TO, 1]
            # HIGHEST precision: the TPU's default f32 matmul runs single-
            # pass bf16, whose ~8-bit mantissa puts O(0.5 m^2) errors into
            # d^2 at O(8 m) coordinates — unusable for collision margins
            cross = jax.lax.dot(
                tile, pts,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # [TO, BLK]
            d = ntile - 2.0 * cross
            return jnp.minimum(acc, jnp.min(d, axis=0))

        acc0 = jnp.full((_BLK,), jnp.inf, jnp.float32)
        return jax.lax.fori_loop(0, n_tiles, body, acc0, unroll=True)

    mo = sweep(obs_ref, onorm_ref, o_tiles)
    ms = sweep(seg_ref, snorm_ref, s_tiles)
    # |p|^2 + |o|^2 - 2 p.o can round slightly negative when p ~ o; a
    # negative d^2 would NaN the sqrt downstream
    outo_ref[0, :] = jnp.maximum(mo + pnorm, 0.0)
    outs_ref[0, :] = jnp.maximum(ms + pnorm, 0.0)


def _fused_kernel_vpu(o_tiles, s_tiles, pt_ref, obs_ref, onorm_ref, seg_ref,
                      snorm_ref, outo_ref, outs_ref):
    """One point block vs all tiles, elementwise broadcast-FMA running min
    (no MXU: 3 VPU ops per pair)."""
    pts = pt_ref[:]  # [2, BLK]
    xd = (-2.0 * pts[0, :])[None, :]  # [1, BLK]
    yd = (-2.0 * pts[1, :])[None, :]
    pnorm = pts[0, :] * pts[0, :] + pts[1, :] * pts[1, :]

    def sweep(src_ref, norm_ref, n_tiles):
        def body(t, acc):
            tile = src_ref[pl.ds(t * _TO, _TO), :]  # [TO, 2]
            ntile = norm_ref[pl.ds(t * _TO, _TO), :]  # [TO, 1]
            ox = tile[:, 0:1]  # [TO, 1]
            oy = tile[:, 1:2]
            d = ntile + xd * ox + yd * oy  # [TO, BLK] via broadcast
            return jnp.minimum(acc, jnp.min(d, axis=0))

        acc0 = jnp.full((_BLK,), jnp.inf, jnp.float32)
        return jax.lax.fori_loop(0, n_tiles, body, acc0, unroll=True)

    mo = sweep(obs_ref, onorm_ref, o_tiles)
    ms = sweep(seg_ref, snorm_ref, s_tiles)
    outo_ref[0, :] = jnp.maximum(mo + pnorm, 0.0)
    outs_ref[0, :] = jnp.maximum(ms + pnorm, 0.0)


def _fused_kernel_mxu_moving(o_tiles, s_tiles, ptf_ref, obs_ref, seg_ref,
                             snorm_ref, outo_ref, outs_ref):
    """Moving-obstacle form of the fused kernel (MXU cross term).

    The constant-velocity track ``o + v*tau`` expands to a 7-feature dot
    per (point, obstacle) pair::

        d2 = |p|^2 + f(o) . g(p)
        f(o) = [|o|^2, |v|^2, 2 v.o, -2ox, -2oy, -2vx, -2vy]
        g(p) = [1, tau^2, tau, px, py, tau*px, tau*py]

    (expand ``(px - ox - vx*tau)^2 + (py - oy - vy*tau)^2`` and collect
    by feature). So the moving sweep is the SAME streaming-tile kernel
    with the MXU contraction at K=8 (7 features zero-padded) instead of
    K=2; zero velocity makes features 1, 2, 5, 6 zero and reduces
    exactly to the static expansion. The segment sweep (static by
    nature) keeps its K=2 form on rows 3:5 (px, py)."""
    g = ptf_ref[:]  # [8, BLK] point features (row 7 zero)
    pts = g[3:5, :]  # [2, BLK] px, py
    pnorm = pts[0, :] * pts[0, :] + pts[1, :] * pts[1, :]

    def sweep_obs(src_ref, n_tiles):
        def body(t, acc):
            tile = src_ref[pl.ds(t * _TO, _TO), :]  # [TO, 8] features
            d = jax.lax.dot(
                tile, g,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # [TO, BLK] = f(o) . g(p)
            return jnp.minimum(acc, jnp.min(d, axis=0))

        acc0 = jnp.full((_BLK,), jnp.inf, jnp.float32)
        return jax.lax.fori_loop(0, n_tiles, body, acc0, unroll=True)

    def sweep_seg(src_ref, norm_ref, n_tiles):
        def body(t, acc):
            tile = src_ref[pl.ds(t * _TO, _TO), :]  # [TO, 2]
            ntile = norm_ref[pl.ds(t * _TO, _TO), :]  # [TO, 1]
            cross = jax.lax.dot(
                tile, pts,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            d = ntile - 2.0 * cross
            return jnp.minimum(acc, jnp.min(d, axis=0))

        acc0 = jnp.full((_BLK,), jnp.inf, jnp.float32)
        return jax.lax.fori_loop(0, n_tiles, body, acc0, unroll=True)

    mo = sweep_obs(obs_ref, o_tiles)
    ms = sweep_seg(seg_ref, snorm_ref, s_tiles)
    outo_ref[0, :] = jnp.maximum(mo + pnorm, 0.0)
    outs_ref[0, :] = jnp.maximum(ms + pnorm, 0.0)


def _fused_kernel_vpu_moving(o_tiles, s_tiles, ptf_ref, obs_ref, seg_ref,
                             snorm_ref, outo_ref, outs_ref):
    """Moving-obstacle form, VPU broadcast-FMA tiles: the same 7-feature
    expansion as ``_fused_kernel_mxu_moving`` accumulated as 6
    broadcast FMAs onto the |o|^2 base per obstacle tile (vs 2 FMAs for
    the static kernel) — no MXU, no K padding."""
    g = ptf_ref[:]  # [8, BLK]
    px = g[3, :]
    py = g[4, :]
    pnorm = px * px + py * py

    def sweep_obs(src_ref, n_tiles):
        def body(t, acc):
            tile = src_ref[pl.ds(t * _TO, _TO), :]  # [TO, 8] features
            d = tile[:, 0:1] * g[0:1, :]  # |o|^2 (row 0 of g is ones)
            for k in range(1, 7):
                d = d + tile[:, k : k + 1] * g[k : k + 1, :]
            return jnp.minimum(acc, jnp.min(d, axis=0))

        acc0 = jnp.full((_BLK,), jnp.inf, jnp.float32)
        return jax.lax.fori_loop(0, n_tiles, body, acc0, unroll=True)

    xd = (-2.0 * px)[None, :]
    yd = (-2.0 * py)[None, :]

    def sweep_seg(src_ref, norm_ref, n_tiles):
        def body(t, acc):
            tile = src_ref[pl.ds(t * _TO, _TO), :]  # [TO, 2]
            ntile = norm_ref[pl.ds(t * _TO, _TO), :]  # [TO, 1]
            d = ntile + xd * tile[:, 0:1] + yd * tile[:, 1:2]
            return jnp.minimum(acc, jnp.min(d, axis=0))

        acc0 = jnp.full((_BLK,), jnp.inf, jnp.float32)
        return jax.lax.fori_loop(0, n_tiles, body, acc0, unroll=True)

    mo = sweep_obs(obs_ref, o_tiles)
    ms = sweep_seg(seg_ref, snorm_ref, s_tiles)
    outo_ref[0, :] = jnp.maximum(mo + pnorm, 0.0)
    outs_ref[0, :] = jnp.maximum(ms + pnorm, 0.0)


def fused_min_dist_sq_moving_pallas(ptf_8n, obsf_o8, seg_g2, snorm,
                                    variant="mxu", interpret=False):
    """[8, N] point features vs [O, 8] obstacle features (moving sweep)
    + [G, 2] static segment points -> ([N], [N]) min squared distances.
    N % _BLK == 0; O, G % _TO == 0 (caller pads; obstacle pads sit at
    +1e8 positions with ZERO velocity so their features stay huge)."""
    n = ptf_8n.shape[1]
    O = obsf_o8.shape[0]
    G = seg_g2.shape[0]
    kern = (
        _fused_kernel_mxu_moving if variant == "mxu"
        else _fused_kernel_vpu_moving
    )
    outo, outs = pl.pallas_call(
        partial(kern, O // _TO, G // _TO),
        grid=(n // _BLK,),
        in_specs=[
            pl.BlockSpec((8, _BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, _BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        interpret=interpret,  # CPU parity tests run the kernel body
    )(ptf_8n, obsf_o8, seg_g2, snorm)
    return outo[0], outs[0]


def fused_min_dist_sq_pallas(pts_2n, obs_o2, onorm, seg_g2, snorm,
                             variant="mxu", interpret=False):
    """[2, N] points vs [O, 2] obstacles and [G, 2] segment points ->
    ([N], [N]) min squared distances. N % _BLK == 0; O, G % _TO == 0
    (caller pads with +1e8 sentinels)."""
    n = pts_2n.shape[1]
    O = obs_o2.shape[0]
    G = seg_g2.shape[0]
    kern = _fused_kernel_mxu if variant == "mxu" else _fused_kernel_vpu
    outo, outs = pl.pallas_call(
        partial(kern, O // _TO, G // _TO),
        grid=(n // _BLK,),
        in_specs=[
            pl.BlockSpec((2, _BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, _BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        interpret=interpret,  # CPU parity tests run the kernel body
    )(pts_2n, obs_o2, onorm, seg_g2, snorm)
    return outo[0], outs[0]


def fused_min_dist_sq(px, py, obs_xy, seg_x, seg_y, pt_mask, variant="mxu",
                      obs_vel=None, time_step=None, interpret=False):
    """Both solver sweeps in one kernel: px, py [S, T]; obs_xy [O, 2];
    seg_x, seg_y [G]; pt_mask [T] -> (d2_obs [S, T], d2_seg [S, T]),
    +inf at masked points.

    Replaces the reference GPU backend's separate ``obstaclesDistCost`` and
    ``refPathCost`` tiled kernels (``cost_evaluator_gpu.cpp:397-544,
    848-972``) with one fused pass over the point axis.

    With ``obs_vel`` ([O, 2] world velocities) + ``time_step``, the
    obstacle sweep evaluates each obstacle at its constant-velocity
    predicted position ``obs + v * t * dt`` for rollout step t — the
    Pallas form of ``ops/solver._min_obstacle_dist_sq_moving`` via the
    7-feature expansion (see ``_fused_kernel_mxu_moving``)."""
    S, T = px.shape
    n = S * T
    n_pad = _round_up(n, _BLK)

    def prep(xy, vel=None):
        rows = _round_up(xy.shape[0], _TO)
        pad = rows - xy.shape[0]
        xy = jnp.pad(xy, ((0, pad), (0, 0)), constant_values=_BIG)
        if vel is None:
            norm = (xy[:, 0] * xy[:, 0] + xy[:, 1] * xy[:, 1])[:, None]
            return xy, norm
        # velocity pads are ZERO: a pad slot must stay parked at +1e8,
        # not march through the workspace (ops/solver moving-sweep rule)
        vel = jnp.pad(vel, ((0, pad), (0, 0)))
        ox, oy = xy[:, 0], xy[:, 1]
        vx, vy = vel[:, 0], vel[:, 1]
        feats = jnp.stack(
            [
                ox * ox + oy * oy,  # |o|^2
                vx * vx + vy * vy,  # |v|^2        (x tau^2)
                2.0 * (vx * ox + vy * oy),  # 2 v.o (x tau)
                -2.0 * ox,  # (x px)
                -2.0 * oy,  # (x py)
                -2.0 * vx,  # (x tau*px)
                -2.0 * vy,  # (x tau*py)
                jnp.zeros_like(ox),
            ],
            axis=1,
        )  # [O_pad, 8]
        return feats, None

    seg_p, snorm = prep(jnp.stack([seg_x, seg_y], axis=1))
    if obs_vel is None:
        pts = jnp.stack([px.reshape(-1), py.reshape(-1)], axis=0)  # [2, N]
        pts = jnp.pad(pts, ((0, 0), (0, n_pad - n)))
        obs_p, onorm = prep(obs_xy)
        d2o, d2s = fused_min_dist_sq_pallas(
            pts, obs_p, onorm, seg_p, snorm, variant=variant,
            interpret=interpret,
        )
    else:
        tau = jnp.broadcast_to(
            (jnp.arange(T, dtype=jnp.float32) * time_step)[None, :], (S, T)
        ).reshape(-1)
        pxf = px.reshape(-1)
        pyf = py.reshape(-1)
        ptf = jnp.stack(
            [
                jnp.ones_like(pxf),
                tau * tau,
                tau,
                pxf,
                pyf,
                tau * pxf,
                tau * pyf,
                jnp.zeros_like(pxf),
            ],
            axis=0,
        )  # [8, N]
        ptf = jnp.pad(ptf, ((0, 0), (0, n_pad - n)))
        obsf, _ = prep(obs_xy, vel=obs_vel)
        d2o, d2s = fused_min_dist_sq_moving_pallas(
            ptf, obsf, seg_p, snorm, variant=variant, interpret=interpret
        )
    d2o = d2o[:n].reshape(S, T)
    d2s = d2s[:n].reshape(S, T)
    inf = jnp.inf
    return (
        jnp.where(pt_mask[None, :], d2o, inf),
        jnp.where(pt_mask[None, :], d2s, inf),
    )


def fused_min_dist_sq_reference(px, py, obs_xy, seg_x, seg_y, pt_mask):
    """Interpret-equivalent math of the fused kernel (for CPU tests)."""
    S, T = px.shape

    def one(xy):
        d2 = jnp.min(
            (px[:, :, None] - xy[None, None, :, 0]) ** 2
            + (py[:, :, None] - xy[None, None, :, 1]) ** 2,
            axis=-1,
        )
        return jnp.where(pt_mask[None, :], d2, jnp.inf)

    return one(obs_xy), one(jnp.stack([seg_x, seg_y], axis=1))


# ---------------------------------------------------------------------------
# single-sweep kernel (round-1 design, kept for comparison benches)
# ---------------------------------------------------------------------------


def _min_dist_kernel(pt_ref, obs_ref, onorm_ref, out_ref):
    """One block: [2, BLK] points vs all [O, 2] obstacles.

    cross = OBS @ P  -> [O, BLK] on the MXU; then the VPU folds
    min over the obstacle axis of (|o|^2 - 2 cross) and adds |p|^2.
    """
    pts = pt_ref[:]  # [2, BLK]
    obs = obs_ref[:]  # [O, 2]
    onorm = onorm_ref[:]  # [O, 1]
    cross = jax.lax.dot(
        obs, pts,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [O, BLK]
    partial_d2 = onorm - 2.0 * cross  # [O, BLK]
    m = jnp.min(partial_d2, axis=0)  # [BLK]
    pnorm = pts[0, :] * pts[0, :] + pts[1, :] * pts[1, :]
    out_ref[0, :] = jnp.maximum(m + pnorm, 0.0)


def min_point_dist_sq_pallas(points_xy2n, obs_o2, obs_norm):
    """[2, N] points, [O, 2] obstacles, [O, 1] |o|^2 -> [N] min d^2.

    N must be a multiple of _BLK (caller pads)."""
    n = points_xy2n.shape[1]
    grid = n // _BLK
    out = pl.pallas_call(
        _min_dist_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((2, _BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _BLK), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
    )(points_xy2n, obs_o2, obs_norm)
    return out[0]


def min_obstacle_dist_sq_mxu(px, py, obs_xy, pt_mask, interpret=False):
    """Drop-in MXU-path replacement for ``_min_obstacle_dist_sq``:
    px, py [S, T]; obs_xy [O, 2]; pt_mask [T] -> [S, T] min squared
    distance (+inf at masked points)."""
    S, T = px.shape
    n = S * T
    n_pad = ((n + _BLK - 1) // _BLK) * _BLK
    pts = jnp.stack([px.reshape(-1), py.reshape(-1)], axis=0)  # [2, N]
    pts = jnp.pad(pts, ((0, 0), (0, n_pad - n)))
    onorm = (obs_xy[:, 0] ** 2 + obs_xy[:, 1] ** 2)[:, None]
    if interpret:
        cross = obs_xy @ pts
        d2 = jnp.maximum(
            jnp.min(onorm - 2.0 * cross, axis=0) + jnp.sum(pts * pts, axis=0),
            0.0,
        )
    else:
        d2 = min_point_dist_sq_pallas(pts, obs_xy, onorm)
    d2 = d2[:n].reshape(S, T)
    return jnp.where(pt_mask[None, :], d2, jnp.inf)
