#!/bin/bash
# Round-5 batch D: LOFAR-4096 re-bench on the new single-chunk AOT
# layout-matched degridder dispatch (the 740 row predates it), the
# po-column entry-layout probe, and a degrid-pipeline LOFAR row.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export OUTPUT_PATH=res
export NR_ITERATIONS=${NR_ITERATIONS:-3}
export NR_WARM_UP_RUNS=${NR_WARM_UP_RUNS:-1}
log=/tmp/r5d.log
: > $log

run() {
  echo "=== $* $(date +%H:%M:%S)" >> $log
  timeout 2400 "$@" >> $log 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> $log
}

run env GRID_SIZE=4096 NR_STATIONS=27 python -m idg_tpu run \
  --workload degridder --version pallas_v7 --suffix _lofar4096
run python scripts/probes/_tpu_r5_polayout.py
run env GRID_SIZE=4096 NR_STATIONS=27 python -m idg_tpu pipeline \
  --direction degrid --version pallas_v7 --suffix _lofar4096

echo "ALL DONE $(date)" >> $log

# 16384^2 trace at merge=64 for the issue-rate floor statement
run env GRID_SIZE=16384 IDG_GRID_MERGE=64 IDG_PROFILE_DIR=/tmp/r5_trace_16k \
  python -m idg_tpu.cli grid --method ranges --suffix _16384_m64
