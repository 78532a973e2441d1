#!/bin/bash
# Round-3 batch K: combined recovery run of the queued batches g/h/i/j
# after the machine reboot killed the original watchdog chain. The TPU
# tunnel is confirmed back; run everything serialized in ONE process
# chain (only one process may hold the TPU; never kill -9 a holder).
set -u
cd /root/repo
export OUTPUT_PATH=res
export NR_ITERATIONS=3
export NR_WARM_UP_RUNS=1
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_idg
log=/tmp/r3k.log
: > $log

run() {
  echo "=== $* [$(date +%H:%M:%S)] ===" >> $log
  timeout 2400 "$@" >> $log 2>&1
  echo "EXIT=$? [$(date +%H:%M:%S)]" >> $log
}

# --- g: pipeline re-bench + 16384^2 ranges + probe16 + validate ---
run python -m idg_tpu.cli pipeline
run python -m idg_tpu.cli pipeline --direction degrid
run env GRID_SIZE=16384 python -m idg_tpu.cli grid --method ranges --suffix _16384
run python _tpu_probe16.py
run python scripts/validate_tpu.py

# --- h: headline re-bench (stage-pinning + vis_layout changes) ---
run python -m idg_tpu.cli run --workload gridder --version pallas_v6 --suffix _fullsize
run python -m idg_tpu.cli run --workload gridder --version pallas_v7 --suffix _fullsize
run python -m idg_tpu.cli run --workload degridder --version pallas_v7 --suffix _fullsize
run python -m idg_tpu.cli run --workload degridder --version pallas_v8 --suffix _fullsize
run python -m idg_tpu.cli run --workload gridder --version pallas_v6 --w-obs --suffix _wobs
run python -m idg_tpu.cli run --workload degridder --version pallas_v7 --w-obs --suffix _wobs
run env GRID_SIZE=4096 NR_STATIONS=27 python -m idg_tpu.cli run --workload gridder --version pallas_v6 --suffix _lofar4096
run env GRID_SIZE=4096 NR_STATIONS=27 python -m idg_tpu.cli run --workload degridder --version pallas_v7 --suffix _lofar4096

# --- i: degrid-pipeline per-chunk extraction A/B ---
run python -m idg_tpu.cli pipeline --direction degrid --whole-extract --suffix _whole

# --- j: large-grid extraction rows ---
run env GRID_SIZE=8192 python -m idg_tpu.cli grid --direction to-subgrids --method ranges --suffix _8192
run env GRID_SIZE=16384 python -m idg_tpu.cli grid --direction to-subgrids --method ranges --suffix _16384s

# --- final: headline bench (also warms the driver's compile cache) ---
run python bench.py
echo "ALL DONE [$(date +%H:%M:%S)]" >> $log
