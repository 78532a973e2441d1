#!/usr/bin/env python
"""Round-3 probe 14: grid-add gather-kernel rows_per_step sweep, clean
process (probe13's sweep OOMed because the degridder section's staged
observation was still resident)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_idg")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from idg_tpu.config import setup_compilation_cache

setup_compilation_cache()

import jax
import numpy as np

from idg_tpu import HarnessConfig, IDGParams, make_perf_observation
from idg_tpu.data import initialize_subgrids
from idg_tpu.ops.grid import plan_grid_add, subgrids_to_grid_pallas
from idg_tpu.types import split_complex
from idg_tpu.utils.timing import time_kernel


def main():
    print(f"devices: {jax.devices()}", flush=True)
    params = IDGParams.from_env()
    obs = make_perf_observation(params)
    cx_h = np.asarray(obs.metadata.coord_x)
    cy_h = np.asarray(obs.metadata.coord_y)
    g, n = params.grid_size, params.subgrid_size
    del obs
    sub = initialize_subgrids(params.nr_subgrids, params.nr_correlations, n)
    spair = jax.device_put(split_complex(sub))
    del sub
    cx = jax.device_put(cx_h)
    cy = jax.device_put(cy_h)
    plan = plan_grid_add(cx_h, cy_h, g, n)
    print(f"plan: cap {plan.cap}, inflation {plan.slot_inflation:.2f}",
          flush=True)
    h1 = HarnessConfig.from_env(nr_warm_up_runs=1, nr_iterations=2)
    for K in (8, 16, 32, 64):
        try:
            tj = time.time()
            fn = jax.jit(lambda s, x, y, _k=K: subgrids_to_grid_pallas(
                s, x, y, g, True, plan=plan, rows_per_step=_k))
            t = time_kernel(fn, spair, cx, cy, harness=h1)
            capp = -(-plan.cap // K) * K
            print(f"grid_add K={K:2d} (cap->{capp}): {t.seconds*1e3:8.3f} ms "
                  f"(±{t.seconds_std*1e3:.2f}) [{time.time()-tj:.0f}s]",
                  flush=True)
        except Exception as exc:
            print(f"grid_add K={K}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
