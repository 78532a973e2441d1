#!/bin/bash
# Round-3 batch G (post-outage recovery): waits for the TPU claim to come
# back, then runs the queued hardware work in ONE serialized process chain:
#   1. pipeline re-bench (grid + degrid) with the boundary relayout
#   2. 16384^2 ranges-streamed grid-add (+ extract) hardware numbers
#   3. validate_tpu.py regen (w!=0 + grid-stage parity sections)
#   4. bench.py headline check (also warms the driver's compile cache)
# Never kill -9 a TPU holder: every step runs under `timeout` (SIGTERM).
set -u
cd /root/repo
export OUTPUT_PATH=res
export NR_ITERATIONS=3
export NR_WARM_UP_RUNS=1
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_idg
log=/tmp/r3g.log
: > $log

# --- phase 0: wait for the tunnel (up to ~4 h, probing every 60 s) ---
ok=0
for i in $(seq 1 240); do
  if timeout 240 python -c "
import jax, jax.numpy as jnp
jax.devices(); x = jnp.ones((8,128)); assert float(x.sum()) == 1024.0
print('TPU OK')
" >> $log 2>&1; then
    echo "RECOVERED at attempt $i $(date)" >> $log
    ok=1
    break
  fi
  echo "wait attempt $i $(date)" >> $log
  sleep 60
done
if [ "$ok" != 1 ]; then
  echo "GAVE UP waiting $(date)" >> $log
  exit 1
fi

run() {
  echo "=== $* [$(date +%H:%M:%S)] ===" >> $log
  timeout 2400 "$@" >> $log 2>&1
  echo "EXIT=$? [$(date +%H:%M:%S)]" >> $log
}

run python -m idg_tpu.cli pipeline
run python -m idg_tpu.cli pipeline --direction degrid
run env GRID_SIZE=16384 python -m idg_tpu.cli grid --method ranges --suffix _16384
run env GRID_SIZE=16384 python -m idg_tpu.cli grid --direction to-subgrids --method ranges --suffix _16384
run python scripts/validate_tpu.py
run python bench.py
echo "ALL DONE [$(date +%H:%M:%S)]" >> $log
