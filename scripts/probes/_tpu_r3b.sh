#!/bin/bash
# Round-3 batch B: degridder fullsize re-bench with the committed OOM fix
# (the r3 batch ran these steps BEFORE the fix landed), plus the default-size
# windowed grid-add number. Sequential: one process may hold the TPU.
set -u
cd /root/repo
export OUTPUT_PATH=res
export NR_ITERATIONS=3
export NR_WARM_UP_RUNS=1
log=/tmp/r3b.log
: > $log

run() {
  echo "=== $* [$(date +%H:%M:%S)] ===" >> $log
  timeout 2400 "$@" >> $log 2>&1
  echo "EXIT=$? [$(date +%H:%M:%S)]" >> $log
}

run python -m idg_tpu.cli run --workload degridder --version pallas_v7 --suffix _fullsize
run python -m idg_tpu.cli run --workload degridder --version pallas_v8 --suffix _fullsize
run python -m idg_tpu.cli run --workload degridder --version pallas_v7 --w-obs --suffix _wobs
run python -m idg_tpu.cli grid
echo "ALL DONE" >> $log
