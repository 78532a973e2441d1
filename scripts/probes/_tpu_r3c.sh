#!/bin/bash
# Round-3 batch C: degridder fullsize re-bench with the x[:1] slim fix,
# then the grid-add attribution probe. Sequential (one TPU holder).
set -u
cd /root/repo
export OUTPUT_PATH=res
export NR_ITERATIONS=3
export NR_WARM_UP_RUNS=1
log=/tmp/r3c.log
: > $log

run() {
  echo "=== $* [$(date +%H:%M:%S)] ===" >> $log
  timeout 2400 "$@" >> $log 2>&1
  echo "EXIT=$? [$(date +%H:%M:%S)]" >> $log
}

run python -m idg_tpu.cli run --workload degridder --version pallas_v7 --suffix _fullsize
run python -m idg_tpu.cli run --workload degridder --version pallas_v8 --suffix _fullsize
run python -m idg_tpu.cli run --workload degridder --version pallas_v7 --w-obs
run python _tpu_probe6.py
echo "ALL DONE" >> $log
