"""Production-serving utilities: AOT artifact export / load.

``export_packed_solver`` / ``export_fleet_tick`` serialize the compiled
solver programs (StableHLO via ``jax.export``) into hermetic, versioned
artifact files; ``load_artifact`` / ``load_packed_solver`` run them in a
serving process without importing any tracing path. See
``serving/export.py`` for the container format.
"""

from .export import (
    LoadedArtifact,
    export_callable,
    export_fleet_tick,
    export_fleet_ticks_on_device,
    export_packed_solver,
    load_artifact,
    load_packed_solver,
    read_artifact_header,
    shard_fleet_args,
    sharded_fleet_call,
)

__all__ = [
    "LoadedArtifact",
    "export_callable",
    "export_fleet_tick",
    "export_fleet_ticks_on_device",
    "export_packed_solver",
    "load_artifact",
    "load_packed_solver",
    "read_artifact_header",
    "shard_fleet_args",
    "sharded_fleet_call",
]
