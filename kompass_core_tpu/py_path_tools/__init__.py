from .executor import PathExecutor, PathRecorder  # noqa: F401
from .interpolation import (  # noqa: F401
    Spline,
    SplineInterpolatedPath,
    interpolate_path,
    resample_path,
)
