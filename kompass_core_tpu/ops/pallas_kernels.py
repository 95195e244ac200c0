"""Pallas TPU kernels for the solver's hot distance reductions.

The DWA tick's dominant cost is two batched min-distance sweeps
(rollout points vs obstacle points, rollout points vs tracked-segment
points — the TPU analog of the reference's ``obstaclesDistCostKernel`` and
``refPathCostKernel`` SYCL kernels, ``cost_evaluator_gpu.cpp:397-544,
848-972``). XLA's fused elementwise+reduce runs these on the VPU at ~6 ops
per (point, obstacle) pair.

This kernel restructures the computation to ride the MXU:

    d2(p, o) = |p|^2 + |o|^2 - 2 p.o

The cross term for a whole (obstacle-tile x point-block) is ONE small
matmul (K=2) on the systolic array; the VPU then only does an add and a
running min per pair (~2 ops), with everything resident in VMEM — the
[N, O] distance matrix never exists in HBM.

The public entry `min_point_dist_sq_pallas` is numerically within float32
matmul tolerance of the XLA path (`ops/solver._min_obstacle_dist_sq`); the
solver selects the backend via ``SolverSpec.backend``.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 512  # points per grid step (lane-dim multiples of 128)


def _min_dist_kernel(pt_ref, obs_ref, onorm_ref, out_ref):
    """One block: [2, BLK] points vs all [O, 2] obstacles.

    cross = OBS @ P  -> [O, BLK] on the MXU; then the VPU folds
    min over the obstacle axis of (|o|^2 - 2 cross) and adds |p|^2.
    """
    pts = pt_ref[:]  # [2, BLK]
    obs = obs_ref[:]  # [O, 2]
    onorm = onorm_ref[:]  # [O, 1]
    cross = jnp.dot(obs, pts, preferred_element_type=jnp.float32)  # [O, BLK]
    partial_d2 = onorm - 2.0 * cross  # [O, BLK]
    m = jnp.min(partial_d2, axis=0)  # [BLK]
    pnorm = pts[0, :] * pts[0, :] + pts[1, :] * pts[1, :]
    # |p|^2 + |o|^2 - 2 p.o can round slightly negative when p ~ o; a
    # negative d^2 would NaN the sqrt downstream
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
