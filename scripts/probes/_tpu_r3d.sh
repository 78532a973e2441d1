#!/bin/bash
# Round-3 batch D: restructured DMA grid-add (tiny gate, then fullsize +
# lofar4096 CSVs), degridder lofar4096 re-bench with the fixed timing
# path, 16384^2 scatter with per-pol planes (OOM-fix validation).
# Sequential: only one process may hold the TPU.
set -u
cd /root/repo
export OUTPUT_PATH=res
export NR_ITERATIONS=3
export NR_WARM_UP_RUNS=1
log=/tmp/r3d.log
: > $log

run() {
  echo "=== $* [$(date +%H:%M:%S)] ===" >> $log
  timeout 2400 "$@" >> $log 2>&1
  echo "EXIT=$? [$(date +%H:%M:%S)]" >> $log
}

run python _tpu_probe8.py
if ! grep -q "PASS" $log; then
  echo "GATE FAILED - skipping pallas CLI runs" >> $log
else
  run python -m idg_tpu.cli grid --method pallas
  export GRID_SIZE=4096 NR_STATIONS=27
  run python -m idg_tpu.cli grid --method pallas --suffix _lofar4096
  unset GRID_SIZE NR_STATIONS
fi

export GRID_SIZE=4096 NR_STATIONS=27
run python -m idg_tpu.cli run --workload degridder --version pallas_v7 --suffix _lofar4096
unset NR_STATIONS

export GRID_SIZE=16384
run python -m idg_tpu.cli grid --method scatter --suffix _16384
unset GRID_SIZE
echo "ALL DONE [$(date +%H:%M:%S)]" >> $log
