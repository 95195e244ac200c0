"""Single source of truth for the BASELINE flagship workload spec.

2025 velocity samples (45x45 grid, the closest odd-bumped grid to the
2000-sample BASELINE config) x 30-step horizon, 512-ray scan, 384-point
tracked-segment capacity. Consumed by bench.py, __graft_entry__, and the
benchmark runner so the published numbers always measure one workload.
(benchmark/scaling.py deliberately uses a smaller spec: its virtual-mesh
compiles run on CPU.)
"""

from ..ops.solver import SolverSpec


def baseline_solver_spec() -> SolverSpec:
    return SolverSpec(
        is_omni=False,
        n_vx=45,
        n_vy=1,
        n_omega=45,
        max_points=30,
        num_ctrl_points=6,
        scan_size=512,
        seg_size=384,
        drop_samples=True,
    )
