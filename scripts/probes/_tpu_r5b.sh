#!/bin/bash
# Round-5 batch B: the non-pipeline half of _tpu_r5a.sh (stale-CSV
# re-bench, flagship traces, sustained-window rows). The pipeline
# fused/no-fuse CSVs wait for the epilogue-rescue decision.
# Sequential: only one process may hold the TPU.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export OUTPUT_PATH=res
export NR_ITERATIONS=${NR_ITERATIONS:-3}
export NR_WARM_UP_RUNS=${NR_WARM_UP_RUNS:-1}
log=/tmp/r5b.log
: > $log

run() {
  echo "=== $* $(date +%H:%M:%S)" >> $log
  timeout 2400 "$@" >> $log 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> $log
}

# 2a. degridder v7 w!=0 re-bench on the kmerge schedule
run python -m idg_tpu run --workload degridder --version pallas_v7 --w-obs

# 2b. LOFAR-4096 re-bench (committed 537 row predates kmerge)
run env GRID_SIZE=4096 NR_STATIONS=27 python -m idg_tpu run \
  --workload degridder --version pallas_v7 --suffix _lofar4096
run env GRID_SIZE=4096 NR_STATIONS=27 python -m idg_tpu run \
  --workload gridder --version pallas_v6 --suffix _lofar4096

# 2c. mesh(1) hardware parity + CSV on the kmerge schedule
run python scripts/mesh1_parity_tpu.py
run python -m idg_tpu run --workload degridder --version pallas_v7 --mesh 1

# 3. flagship traces for the MXU extractor
run env IDG_PROFILE_DIR=/tmp/r5_trace_gridder python -m idg_tpu run \
  --workload gridder --version pallas_v6
run env IDG_PROFILE_DIR=/tmp/r5_trace_degridder python -m idg_tpu run \
  --workload degridder --version pallas_v7

# 4. sustained-window vs min-of-windows comparison rows (VERDICT item 8)
run python -m idg_tpu run --workload gridder --version pallas_v6 \
  --sustain 10 --suffix _sustain
run python -m idg_tpu run --workload degridder --version pallas_v7 \
  --sustain 10 --suffix _sustain

echo "ALL DONE $(date)" >> $log
