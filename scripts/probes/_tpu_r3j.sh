#!/bin/bash
# Round-3 batch J: large-grid EXTRACTION rows (runs after batch I).
#   1. 8192^2 extraction — the auto-tune below wc=8 keeps sparse plans
#      on the range kernel now (was: gather fallback)
#   2. 16384^2 extraction — memory guard routes to the new streamed
#      per-stripe formulation
# Sequential: only one process may hold the TPU; never kill -9 a holder.
set -u
cd /root/repo
export OUTPUT_PATH=res
export NR_ITERATIONS=3
export NR_WARM_UP_RUNS=1
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_idg
log=/tmp/r3j.log
: > $log

R3I_PID=${R3I_PID:-29241}
for i in $(seq 1 1680); do
  kill -0 "$R3I_PID" 2>/dev/null || break
  sleep 30
done
if kill -0 "$R3I_PID" 2>/dev/null; then
  echo "r3i still running after wait budget; aborting $(date)" >> $log
  exit 1
fi
echo "r3i done $(date)" >> $log

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

run env GRID_SIZE=8192 python -m idg_tpu.cli grid --direction to-subgrids --method ranges --suffix _8192
run env GRID_SIZE=16384 python -m idg_tpu.cli grid --direction to-subgrids --method ranges --suffix _16384s
echo "ALL DONE [$(date +%H:%M:%S)]" >> $log
