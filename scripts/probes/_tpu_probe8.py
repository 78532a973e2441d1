#!/usr/bin/env python
"""Round-3 probe 8: does the restructured (static-sublane) DMA grid-add
kernel compile on real Mosaic, and does it match the bucketed XLA
reduction on hardware? Tiny size — fast fail before the fullsize CLI runs.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_idg")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from idg_tpu.config import setup_compilation_cache

setup_compilation_cache()

import jax
import numpy as np

from idg_tpu.data import initialize_subgrids
from idg_tpu.ops.grid import (
    plan_grid_add, subgrids_to_grid_bucketed, subgrids_to_grid_pallas,
)
from idg_tpu.types import split_complex


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    s, p, n, g = 64, 4, 32, 256
    sub = split_complex(initialize_subgrids(s, p, n))
    cx = rng.integers(0, g, s).astype(np.int32)
    cy = rng.integers(0, g, s).astype(np.int32)
    plan = plan_grid_add(cx, cy, g, n)
    print(f"plan: {plan.nby}x{plan.nbx} blocks, cap {plan.cap}, "
          f"inflation {plan.slot_inflation:.2f}", flush=True)
    want = subgrids_to_grid_bucketed(sub, cx, cy, g, plan=plan)
    t0 = time.time()
    try:
        got = jax.jit(lambda su, x, y: subgrids_to_grid_pallas(
            su, x, y, g, plan=plan))(jax.device_put(sub), cx, cy)
        got = jax.tree.map(np.asarray, got)
    except Exception as exc:
        print(f"pallas DMA tiny: FAILED {type(exc).__name__}: "
              f"{str(exc)[:400]}", flush=True)
        return 1
    err = max(
        float(np.abs(np.asarray(a) - b).max()) for a, b in zip(want, got)
    )
    print(f"pallas DMA tiny: compiled+ran in {time.time()-t0:.0f}s, "
          f"max |diff| vs bucketed = {err:.3e} "
          f"({'PASS' if err < 1e-4 else 'FAIL'})", flush=True)
    return 0 if err < 1e-4 else 1


if __name__ == "__main__":
    sys.exit(main())
