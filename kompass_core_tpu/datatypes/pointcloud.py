"""3D point cloud container.

Covers the role of the reference's ``datatypes/pointcloud.py`` +
``utils/pointcloud.h`` (raw PointCloud2-style byte decoding). The decoded
representation is a dense ``[N, 3]`` float32 array — the layout every TPU
kernel in this package consumes.
"""

from typing import Optional

import numpy as np
from attrs import define, field

# PointField datatype codes (sensor_msgs/PointField convention)
_DTYPES = {
    1: np.int8,
    2: np.uint8,
    3: np.int16,
    4: np.uint16,
    5: np.int32,
    6: np.uint32,
    7: np.float32,
    8: np.float64,
}


@define
class PointCloudData:
    """Point cloud, stored dense as ``points [N, 3] float32``."""

    points: np.ndarray = field(default=np.zeros((0, 3), dtype=np.float32))

    @property
    def data(self) -> np.ndarray:
        return self.points

    @classmethod
    def from_bytes(
        cls,
        data: bytes,
        point_step: int,
        x_offset: int = 0,
        y_offset: int = 4,
        z_offset: int = 8,
        dtype_code: int = 7,
        row_step: Optional[int] = None,
        height: int = 1,
    ) -> "PointCloudData":
        """Decode raw PointCloud2-style bytes into an [N, 3] array.

        Equivalent behavior to the reference's raw-byte decode
        (``utils/pointcloud.h:49-116``): per-point strided field reads with
        configurable offsets and datatype, cast to float32.
        """
        dt = _DTYPES[dtype_code]
        buf = np.frombuffer(data, dtype=np.uint8)
        itemsize = np.dtype(dt).itemsize
        # mirror the reference's row walk (``pointcloud.h:135-146``):
        # point k of row r starts at r*row_step + k*point_step, for
        # k*point_step < row_step — row_step is the ROW STRIDE, so rows
        # with padding stay aligned; a final point overlapping the pad is
        # kept iff it fits in the buffer (the reference's max_offset
        # guard, same semantics)
        if row_step is None:
            row_step = buf.size
            height = 1
        cols = np.arange(0, row_step, point_step, dtype=np.int64)
        starts = (
            np.arange(height, dtype=np.int64)[:, None] * row_step
            + cols[None, :]
        ).ravel()
        max_off = max(x_offset, y_offset, z_offset) + itemsize
        starts = starts[starts + max_off <= buf.size]

        def read_field(offset):
            idx = starts[:, None] + offset + np.arange(itemsize)
            return (
                np.ascontiguousarray(buf[idx])
                .view(dt)
                .reshape(len(starts))
                .astype(np.float32)
            )

        pts = np.stack(
            [read_field(x_offset), read_field(y_offset), read_field(z_offset)],
            axis=1,
        )
        return cls(points=pts)

    def filtered(
        self,
        z_min: float = -np.inf,
        z_max: float = np.inf,
        drop_nonfinite: bool = True,
    ) -> np.ndarray:
        pts = self.points
        mask = (pts[:, 2] >= z_min) & (pts[:, 2] <= z_max)
        if drop_nonfinite:
            mask &= np.isfinite(pts).all(axis=1)
        return pts[mask]
