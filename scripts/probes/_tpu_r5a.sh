#!/bin/bash
# Round-5 batch A: hardware validation + stale-CSV re-bench (VERDICT
# round-4 directives 1-3, 5):
#   1. fused-pieces gridded pipeline (the CLI default, hardware-proven by
#      scripts/probes/_tpu_r5_fusedpipe.py just before this) — perf CSVs
#      for fused and --no-fuse
#   2. K-merge stale rows re-benched: degridder v7 _wobs (w!=0 on the new
#      schedule), _lofar4096 (the suspected-stale 537 row), mesh1
#   3. profiler traces of the two flagships for the MXU-busy extraction
#      (scripts/xplane_tools.py --mxu)
# Sequential: only one process may hold the TPU.
set -u
cd /root/repo
# script-file invocations (mesh1_parity) don't get cwd on sys.path; the
# axon plugin site must stay FIRST when overriding PYTHONPATH
export PYTHONPATH=/root/.axon_site:/root/repo
export OUTPUT_PATH=res
export NR_ITERATIONS=${NR_ITERATIONS:-3}
export NR_WARM_UP_RUNS=${NR_WARM_UP_RUNS:-1}
log=/tmp/r5a.log
: > $log

run() {
  echo "=== $* $(date +%H:%M:%S)" >> $log
  timeout 2400 "$@" >> $log 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> $log
}

# 1. pipeline: fused default + no-fuse A/B (fullsize)
run python -m idg_tpu pipeline --version pallas_v6
run python -m idg_tpu pipeline --version pallas_v6 --no-fuse --suffix _nofuse

# 2a. degridder v7 w!=0 re-bench on the kmerge schedule
run python -m idg_tpu run --workload degridder --version pallas_v7 --w-obs

# 2b. LOFAR-4096 re-bench (committed 537 row predates kmerge AND matches
#     a pad-to-chunk the single-chunk path no longer does)
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
