#!/bin/bash
# Round-5 batch C: pipeline fused/no-fuse CSVs in BOTH directions (the
# rescued batched-epilogue gridder + the new fused-prologue degridder),
# then the 16384^2 merged-group width sweep (IDG_GRID_MERGE A/B).
# Sequential: only one process may hold the TPU.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export OUTPUT_PATH=res
export NR_ITERATIONS=${NR_ITERATIONS:-3}
export NR_WARM_UP_RUNS=${NR_WARM_UP_RUNS:-1}
log=/tmp/r5c.log
: > $log

run() {
  echo "=== $* $(date +%H:%M:%S)" >> $log
  timeout 2400 "$@" >> $log 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> $log
}

# 1. grid-direction pipeline: fused (rescued epilogue) + no-fuse A/B
run python -m idg_tpu pipeline --version pallas_v6
run python -m idg_tpu pipeline --version pallas_v6 --no-fuse --suffix _nofuse

# 2. degrid-direction pipeline: fused prologue (new default) + no-fuse
run python -m idg_tpu pipeline --direction degrid --version pallas_v7
run python -m idg_tpu pipeline --direction degrid --version pallas_v7 \
  --no-fuse --suffix _nofuse

# 3. 16384^2 merged-group width sweep (committed row: 353.7 ms @ merge 16)
run env GRID_SIZE=16384 IDG_GRID_MERGE=32 python -m idg_tpu.cli grid \
  --method ranges --suffix _16384_m32
run env GRID_SIZE=16384 IDG_GRID_MERGE=64 python -m idg_tpu.cli grid \
  --method ranges --suffix _16384_m64

echo "ALL DONE $(date)" >> $log
