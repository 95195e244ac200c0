from .executor import PathExecutor, PathRecorder  # noqa: F401
from .interpolation import interpolate_path, resample_path  # noqa: F401
