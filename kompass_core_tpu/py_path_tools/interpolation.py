"""Standalone path interpolation helpers.

Role of the reference's ``py_path_tools/interpolation.py``: thin wrappers
over the engine's spline machinery for offline use on PathSample data.
"""

import numpy as np

from ..datatypes.path import InterpolationType, ReferencePath
from ..datatypes.path_sample import PathSample


def interpolate_path(
    path: PathSample,
    max_point_distance: float = 0.01,
    interpolation_type: InterpolationType = InterpolationType.CUBIC_SPLINE,
) -> PathSample:
    """Resample a PathSample at uniform arc-length spacing."""
    ref = ReferencePath(np.stack([path.x_points, path.y_points], axis=1))
    ref.interpolate(max_point_distance, interpolation_type)
    out = PathSample(ref.size())
    headings = np.arctan2(np.gradient(ref.ys), np.gradient(ref.xs))
    out.set_path(ref.xs.astype(float), ref.ys.astype(float), headings)
    return out


def resample_path(path: PathSample, num_points: int) -> PathSample:
    """Resample to a fixed number of points by arc length."""
    seg = np.hypot(np.diff(path.x_points), np.diff(path.y_points))
    arc = np.concatenate([[0.0], np.cumsum(seg)])
    s = np.linspace(0.0, arc[-1], num_points)
    out = PathSample(num_points)
    # unwrap before interpolating: a raw interp across the ±pi wrap would
    # yield bogus intermediate headings (e.g. ~0 between pi and -pi)
    heading = np.interp(s, arc, np.unwrap(path.heading_points))
    heading = np.mod(heading + np.pi, 2 * np.pi) - np.pi
    out.set_path(
        np.interp(s, arc, path.x_points),
        np.interp(s, arc, path.y_points),
        heading,
    )
    return out
