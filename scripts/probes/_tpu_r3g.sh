#!/bin/bash
# Round-3 batch G (post-outage recovery): waits for the TPU claim to come
# back, then runs the queued hardware work in ONE serialized process chain:
#   1. pipeline re-bench (grid + degrid) with the boundary relayout
#   2. 16384^2 ranges-streamed grid-add (+ extract) hardware numbers
#   3. probe16: degridder hswap/sstore schedule A/B
#   4. validate_tpu.py regen (w!=0 + grid-stage parity sections)
#   5. bench.py headline check (also warms the driver's compile cache)
# Probe design: LONG-patience probes (a SIGTERM'd client can wedge the
# claim ~10 min, and a fresh remote compile can take >7 min), LONG gaps
# between attempts so a recovering tunnel is never re-wedged by the
# watchdog itself. Never kill -9 a TPU holder.
set -u
cd /root/repo
export OUTPUT_PATH=res
export NR_ITERATIONS=3
export NR_WARM_UP_RUNS=1
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_idg
log=/tmp/r3g.log
: > $log

ok=0
for i in $(seq 1 40); do
  if timeout 1200 python -c "
import jax, jax.numpy as jnp
jax.devices(); x = jnp.ones((8,128)); assert float(x.sum()) == 1024.0
print('TPU OK')
" >> $log 2>&1; then
    echo "RECOVERED at attempt $i $(date)" >> $log
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

run() {
  echo "=== $* [$(date +%H:%M:%S)] ===" >> $log
  timeout 2400 "$@" >> $log 2>&1
  echo "EXIT=$? [$(date +%H:%M:%S)]" >> $log
}

run python -m idg_tpu.cli pipeline
run python -m idg_tpu.cli pipeline --direction degrid
run env GRID_SIZE=16384 python -m idg_tpu.cli grid --method ranges --suffix _16384
run env GRID_SIZE=16384 python -m idg_tpu.cli grid --direction to-subgrids --method ranges --suffix _16384
run python _tpu_probe16.py
run python scripts/validate_tpu.py
run python bench.py
echo "ALL DONE [$(date +%H:%M:%S)]" >> $log
