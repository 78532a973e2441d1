#!/usr/bin/env bash
# Sweep every registered kernel version in correctness mode (the reference's
# `-c` flag across all executables).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m idg_tpu sweep --workloads gridder,degridder --versions all --mode check "$@"
