"""Two-process jax.distributed fleet test (CPU backend, localhost).

Validates the real multi-host code path of ``parallel/multihost.py``:
``initialize_multihost`` + a global mesh spanning both processes' devices,
with the robot axis sharded across processes and each process feeding its
local shard — the structure of a pod-slice deployment, executed as two
OS processes over TCP.
"""

import os
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.getcwd())
from kompass_core_tpu.parallel import initialize_multihost
initialize_multihost(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=num_procs,
    process_id=proc_id,
)
assert jax.process_count() == num_procs, jax.process_count()
assert len(jax.devices()) == 2 * num_procs  # global view of all devices

import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from kompass_core_tpu.ops.solver import SolverSpec, packed_input_size
from kompass_core_tpu.parallel.fleet import make_fleet_solver

spec = SolverSpec(is_omni=False, n_vx=5, n_vy=1, n_omega=5, max_points=8,
                  num_ctrl_points=2, scan_size=64, seg_size=64)
mesh = Mesh(np.array(jax.devices()).reshape(-1), axis_names=("robots",))
solver = make_fleet_solver(spec, mesh=mesh)

# each process contributes its local shard of the global [N, L] batch
from __graft_entry__ import _scenario_buffer
n_global = 8
n_local = n_global // num_procs
local = np.stack([
    _scenario_buffer(spec, proc_id * n_local + i) for i in range(n_local)
])
sharding = NamedSharding(mesh, P("robots"))
global_batch = jax.make_array_from_process_local_data(
    sharding, local, (n_global, packed_input_size(spec))
)
out = solver(global_batch)
local_out = np.concatenate(
    [s.data for s in out.addressable_shards], axis=0
)
assert np.all(local_out[:, 0] > 0.5), "some local robots found no command"
print(f"proc {proc_id}: OK, {len(local_out)} local robots solved", flush=True)
"""


def test_two_process_fleet(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker_file = tmp_path / "worker.py"
    worker_file.write_text(WORKER)
    env = dict(os.environ)
    # the environment's sitecustomize (remote-TPU registration on
    # PYTHONPATH) initializes the XLA backend at interpreter start, which
    # forbids jax.distributed.initialize — strip it for the CPU workers
    env["PYTHONPATH"] = os.getcwd()
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_file), str(i), "2", str(port)],
            cwd=os.getcwd(),
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multiprocess worker timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "OK" in out
