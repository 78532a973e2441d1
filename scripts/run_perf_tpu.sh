#!/usr/bin/env bash
# Sweep every registered kernel version in performance mode — the TPU
# analogue of the reference's scripts/run_perf_cuda.sh (which loops the
# gridder v1..v8 and degridder v1..v6 executables).
#
# Env: OUTPUT_PATH (CSV destination, default ./res), plus the usual
# GRID_SIZE / NR_STATIONS / ... problem-size vars.
set -euo pipefail
cd "$(dirname "$0")/.."
export OUTPUT_PATH="${OUTPUT_PATH:-res}"
mkdir -p "$OUTPUT_PATH"
python -m idg_tpu sweep --workloads gridder,degridder --versions all --mode perf "$@"
