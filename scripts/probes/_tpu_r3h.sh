#!/bin/bash
# Round-3 batch H: runs AFTER the r3g watchdog chain finishes (waits on
# its PID). Re-benches every committed headline CSV against the current
# tree — two staging changes since those CSVs were recorded:
#   * the stage-output row-major pinning is now actually applied (the
#     eval_shape TypeError silently disabled it for all of rounds 2-3),
#   * stage() now materializes only the per-kernel vis orientation
#     (halves staged visibility HBM; same kernel inputs).
# Plus the LOFAR-4096 degridder re-run: the committed 537 MVis/s row is
# exactly 8192/7020 (=1.17x) below the fullsize rate, matching a
# pad-to-MAX_CHUNK the current single-chunk path no longer does.
# Sequential: only one process may hold the TPU; never kill -9 a holder.
set -u
cd /root/repo
export OUTPUT_PATH=res
export NR_ITERATIONS=3
export NR_WARM_UP_RUNS=1
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_idg
log=/tmp/r3h.log
: > $log

# --- phase 0: wait for the r3g chain (bounded ~10 h) ---
R3G_PID=${R3G_PID:-21162}
for i in $(seq 1 1200); do
  kill -0 "$R3G_PID" 2>/dev/null || break
  sleep 30
done
if kill -0 "$R3G_PID" 2>/dev/null; then
  echo "r3g still running after wait budget; aborting $(date)" >> $log
  exit 1
fi
echo "r3g done $(date)" >> $log

# r3g may have given up on a dead tunnel — verify the TPU ourselves.
ok=0
for i in $(seq 1 20); do
  if timeout 1200 python -c "
import jax, jax.numpy as jnp
jax.devices(); x = jnp.ones((8,128)); assert float(x.sum()) == 1024.0
print('TPU OK')
" >> $log 2>&1; then
    ok=1
    break
  fi
  echo "wait attempt $i failed $(date); sleeping 300" >> $log
  sleep 300
done
if [ "$ok" != 1 ]; then
  echo "GAVE UP waiting $(date)" >> $log
  exit 1
fi
echo "TPU BACK $(date)" >> $log

run() {
  echo "=== $* [$(date +%H:%M:%S)] ===" >> $log
  timeout 2400 "$@" >> $log 2>&1
  echo "EXIT=$? [$(date +%H:%M:%S)]" >> $log
}

# 1. fullsize headline rows (perf defaults, S=24500)
run python -m idg_tpu.cli run --workload gridder --version pallas_v6 --suffix _fullsize
run python -m idg_tpu.cli run --workload gridder --version pallas_v7 --suffix _fullsize
run python -m idg_tpu.cli run --workload degridder --version pallas_v7 --suffix _fullsize
run python -m idg_tpu.cli run --workload degridder --version pallas_v8 --suffix _fullsize
# 2. the w!=0 observation rows
run python -m idg_tpu.cli run --workload gridder --version pallas_v6 --w-obs --suffix _wobs
run python -m idg_tpu.cli run --workload degridder --version pallas_v7 --w-obs --suffix _wobs
# 3. LOFAR 4096^2 re-run (the suspect 537 MVis/s row)
export GRID_SIZE=4096
export NR_STATIONS=27
run python -m idg_tpu.cli run --workload gridder --version pallas_v6 --suffix _lofar4096
run python -m idg_tpu.cli run --workload degridder --version pallas_v7 --suffix _lofar4096
unset GRID_SIZE NR_STATIONS
echo "ALL DONE [$(date +%H:%M:%S)]" >> $log
