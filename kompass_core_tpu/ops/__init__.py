from .solver import (  # noqa: F401
    SolverParams,
    SolverSpec,
    dwa_solve,
    make_dwa_solver,
)
from .window import MIN_VEL, sample_velocity_window  # noqa: F401
