#!/usr/bin/env bash
# One-shot TPU re-measurement for the strict one-variant-per-dispatch
# protocol (CLAUDE.md CAVEAT 2026-08-18): run when the axon tunnel is back.
# Produces BENCH_LOCAL.json (runner suite), KERNEL_BENCH.json (sweep
# shoot-out), and the bench.py headline line; each step probes the backend
# via bench.py's watchdog path so a dead tunnel fails fast, not forever.
set -uo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="$(pwd):${PYTHONPATH:-}"

echo "== backend probe =="
timeout 120 python -c "import jax; print(jax.devices())" || {
  echo "tunnel still down"; exit 1; }

echo "== benchmark runner suite (reference-schema workloads) =="
timeout 3000 python -m kompass_core_tpu.benchmark.runner BENCH_LOCAL.json \
  || echo "runner suite FAILED"

echo "== kernel shoot-out (xla vs pallas backends) =="
timeout 3000 python -m kompass_core_tpu.benchmark.kernel_bench \
  | tee KERNEL_BENCH.json || echo "kernel bench FAILED"

echo "== bench.py headline =="
timeout 3000 python bench.py || echo "bench.py FAILED"

echo "== done — update CLAUDE.md numbers and commit =="
