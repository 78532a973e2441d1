#!/bin/bash
# Round-3 batch F: VMEM-resident piece-scatter grid-add (tiny gate via
# probe8, fullsize CSV refresh), 8192^2 gather-kernel CSV.
set -u
cd /root/repo
export OUTPUT_PATH=res
export NR_ITERATIONS=3
export NR_WARM_UP_RUNS=1
log=/tmp/r3f.log
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
  export GRID_SIZE=8192
  run python -m idg_tpu.cli grid --method pallas --suffix _8192
  unset GRID_SIZE
fi
echo "ALL DONE [$(date +%H:%M:%S)]" >> $log
