#!/usr/bin/env python
"""Round-5: why is the LOFAR-4096 degridder still 2.77 us/subgrid?

The single-chunk AOT layout-matched dispatch landed but the re-bench
didn't move (19.44 ms before and after). Diagnose: (1) which dispatch
branch staged_runner actually returns, (2) a trace of the launch to see
whether per-launch relayouts remain or the kernel itself is slower at
S=7020.

Usage (TPU host):
  GRID_SIZE=4096 NR_STATIONS=27 python scripts/probes/_tpu_r5_lofardiag.py
"""

from __future__ import annotations

import sys

import jax
import numpy as np

from idg_tpu.config import HarnessConfig, IDGParams
from idg_tpu.data import initialize_subgrids, make_perf_observation
from idg_tpu.ops.api import staged_runner
from idg_tpu.utils.timing import time_kernel


def main() -> int:
    params = IDGParams.from_env()
    harness = HarnessConfig.from_env()
    obs = make_perf_observation(params)
    sub = initialize_subgrids(params.nr_subgrids, params.nr_correlations,
                              params.subgrid_size)
    print(f"devices: {jax.devices()}  S={params.nr_subgrids}")

    fn, args = staged_runner("degridder", "pallas_v7", params, obs,
                             subgrids=sub)
    kind = type(fn).__name__
    print(f"dispatch fn type: {kind} "
          f"({'AOT compiled' if kind == 'function' else 'plain jit'})")
    t = time_kernel(fn, *args, harness=harness)
    us = t.seconds * 1e6 / params.nr_subgrids
    print(f"launch {t.seconds*1e3:8.2f} ms (±{t.seconds_std*1e3:.2f}) "
          f"= {us:.3f} us/subgrid")

    import os

    tdir = os.environ.get("IDG_PROFILE_DIR")
    if tdir:
        with jax.profiler.trace(tdir):
            for _ in range(5):
                out = fn(*args)
            jax.block_until_ready(out)
        print(f"trace written to {tdir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
