#!/bin/bash
# Round-3 batch I: degrid-pipeline per-chunk extraction A/B (runs after
# batch H). The new default composition extracts each degridder chunk
# via a sliced plan (no full-S intermediate / slice copies); the
# --whole-extract flag restores the monolithic path for the comparison.
# Sequential: only one process may hold the TPU; never kill -9 a holder.
set -u
cd /root/repo
export OUTPUT_PATH=res
export NR_ITERATIONS=3
export NR_WARM_UP_RUNS=1
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_idg
log=/tmp/r3i.log
: > $log

R3H_PID=${R3H_PID:-28143}
for i in $(seq 1 1440); do
  kill -0 "$R3H_PID" 2>/dev/null || break
  sleep 30
done
if kill -0 "$R3H_PID" 2>/dev/null; then
  echo "r3h still running after wait budget; aborting $(date)" >> $log
  exit 1
fi
echo "r3h done $(date)" >> $log

ok=0
for i in $(seq 1 12); do
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

run python -m idg_tpu.cli pipeline --direction degrid
run python -m idg_tpu.cli pipeline --direction degrid --whole-extract --suffix _whole
echo "ALL DONE [$(date +%H:%M:%S)]" >> $log
