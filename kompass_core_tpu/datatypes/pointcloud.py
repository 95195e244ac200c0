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
        if row_step is not None and height > 1:
            rows = buf.reshape(height, -1)[:, :row_step]
            buf = rows.reshape(-1)
        n = buf.size // point_step
        buf = buf[: n * point_step].reshape(n, point_step)
        itemsize = np.dtype(dt).itemsize

        def read_field(offset):
            raw = buf[:, offset : offset + itemsize].copy()
            return raw.view(dt).reshape(n).astype(np.float32)

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
