from .fleet import (  # noqa: F401
    FleetPlanner,
    make_fleet_solver,
    make_sample_parallel_solver,
)
