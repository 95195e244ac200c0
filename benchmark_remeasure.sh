#!/usr/bin/env bash
# One-shot TPU re-measurement for the strict one-variant-per-dispatch
# protocol (CLAUDE.md CAVEAT 2026-08-18): run when the axon tunnel is back.
# Produces BENCH_LOCAL.json (runner suite), KERNEL_BENCH.json (sweep
# shoot-out), and the bench.py headline line. A fresh 120 s watchdog probe
# runs BEFORE EACH step (the tunnel can drop mid-run and backend init then
# blocks forever — only bench.py itself has an internal watchdog).
set -uo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="$(pwd):${PYTHONPATH:-}"

probe() {
  timeout 120 python -c "import jax; print(jax.devices())" || {
    echo "tunnel down before step: $1"; exit 1; }
}

probe "runner suite"
echo "== benchmark runner suite (reference-schema workloads) =="
timeout 3000 python -m kompass_core_tpu.benchmark.runner BENCH_LOCAL.json 5 \
  || echo "runner suite FAILED"

probe "kernel bench"
echo "== kernel shoot-out (xla vs pallas backends) =="
timeout 3000 python -m kompass_core_tpu.benchmark.kernel_bench \
  | tee KERNEL_BENCH.json || echo "kernel bench FAILED"

probe "device loop"
echo "== device-loop cross-check (tunnel-immune single-solve time) =="
timeout 2000 python -m kompass_core_tpu.benchmark.device_loop \
  | tee DEVICE_LOOP.json || echo "device loop FAILED"

probe "bench.py"
echo "== bench.py headline =="
timeout 3000 python bench.py || echo "bench.py FAILED"

echo "== done — update CLAUDE.md numbers and commit =="
