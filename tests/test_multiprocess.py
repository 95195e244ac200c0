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


WORKER_SCALE = r"""
import os, sys
proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.getcwd())
from kompass_core_tpu.parallel import initialize_multihost
initialize_multihost(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=num_procs,
    process_id=proc_id,
)
n_dev = len(jax.devices())
assert n_dev == 4 * num_procs  # 8 global devices

import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from kompass_core_tpu.ops.solver import SolverSpec, packed_input_size
from kompass_core_tpu.parallel.fleet import make_fleet_solver

spec = SolverSpec(is_omni=False, n_vx=5, n_vy=1, n_omega=5, max_points=8,
                  num_ctrl_points=2, scan_size=64, seg_size=64)
L = packed_input_size(spec)
mesh = Mesh(np.array(jax.devices()).reshape(-1), axis_names=("robots",))
sharded_solver = make_fleet_solver(spec, mesh=mesh)

from __graft_entry__ import _scenario_buffer

# the BASELINE north star: 100+ robots across >=2 hosts. Two fleet
# sizes: 128 (even shards: 16 robots/device) and 100 padded to 104
# (uneven robot count: 13 rows/device, 4 of them zero-pad rows that
# must solve to found=False). Every process also runs the FULL fleet
# through the single-process chunked path (chunk_size=64 -> the 104
# case exercises chunking's own pad-to-full-chunk tail against shard
# padding) and asserts its local shard rows match bit-for-bit.
base = _scenario_buffer(spec, 0)
for n_real, n_padded in ((128, 128), (100, 104)):
    full = np.zeros((n_padded, L), np.float32)
    for i in range(n_real):
        full[i] = base
        # distinct robot states along the path (buf[0] = state x); the
        # _scenario_buffer robot_index spacing (0.1 m/robot) would walk
        # robots 7+ off the 0.63 m tiny-spec path
        full[i, 0] += 1e-3 * i
    n_local = n_padded // num_procs
    local = full[proc_id * n_local : (proc_id + 1) * n_local]
    sharding = NamedSharding(mesh, P("robots"))
    global_batch = jax.make_array_from_process_local_data(
        sharding, local, (n_padded, L)
    )
    out = sharded_solver(global_batch)

    single = np.asarray(make_fleet_solver(spec, mesh=None)(full))
    assert single.shape[0] == n_padded
    # found flag: every real robot solved, every pad row rejected
    assert np.all(single[:n_real, 0] > 0.5), "real robot found no command"
    assert np.all(single[n_real:, 0] < 0.5), "pad row reported found"

    checked = 0
    for shard in out.addressable_shards:
        rows = np.asarray(shard.data)
        idx = shard.index[0]
        expected = single[idx]
        assert np.array_equal(rows, expected), (
            f"proc {proc_id} N={n_real}: shard rows {idx} diverge from"
            " the single-process fleet"
        )
        checked += rows.shape[0]
    assert checked == n_padded // num_procs
    print(f"proc {proc_id}: N={n_real} OK ({checked} local rows bit-equal)",
          flush=True)
"""


def _run_workers(tmp_path, source, num_procs=2, timeout=420):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker_file = tmp_path / "worker.py"
    worker_file.write_text(source)
    env = dict(os.environ)
    # the environment's sitecustomize (remote-TPU registration on
    # PYTHONPATH) initializes the XLA backend at interpreter start, which
    # forbids jax.distributed.initialize — strip it for the CPU workers
    env["PYTHONPATH"] = os.getcwd()
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_file), str(i), str(num_procs),
             str(port)],
            cwd=os.getcwd(),
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(num_procs)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multiprocess worker timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "OK" in out
    return outs


def test_128_robots_two_process_bit_parity(tmp_path):
    """BASELINE north star at test scale: 128 robots (and an uneven 100)
    sharded over 2 processes x 4 devices, every local shard bit-equal to
    the single-process chunked fleet."""
    outs = _run_workers(tmp_path, WORKER_SCALE)
    for out in outs:
        assert "N=128 OK" in out and "N=100 OK" in out


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
