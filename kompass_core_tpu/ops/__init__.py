from .critical_zone import (  # noqa: F401
    build_critical_zone,
    critical_zone_check,
    get_critical_zone_checker,
)
from .fleet_solver import (  # noqa: F401
    FleetSafety,
    FleetSpec,
    build_fleet_safety,
    make_fleet_tick,
)
from .mapping import (  # noqa: F401
    MapperSpec,
    get_scan_to_grid,
    get_scan_to_grid_bayesian,
    pointcloud_to_scan,
)
from .solver import (  # noqa: F401
    SolverParams,
    SolverSpec,
    dwa_solve,
    evaluate_trajectory_costs,
    get_cost_evaluator,
    get_packed_dwa_solver,
    make_dwa_solver,
    make_packed_dwa_solver,
    pack_solver_input,
    packed_input_size,
    unpack_solver_output,
)
from .window import MIN_VEL, sample_velocity_window  # noqa: F401
