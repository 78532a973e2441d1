#!/usr/bin/env python
"""Round-5: close the fused-pipeline composition gap.

Parts (rescued epilogue): pieces 68.1 ms + ranges 14.4 ms = 82.5, but
the two-jit composition measures 88.2 ms (~5.7 ms boundary). A/B:

  A  two-jit composed (the shipping default)         [baseline]
  B  SINGLE-jit composition (pieces kernel + range grid-add in one
     module: one dispatch, pieces stay XLA temps)
  C  B with batch=8 pieces steps (epilogue fixed costs amortize over
     8 subgrids; stage-1 RHS 1024 cols, stage-2 [512,128])

Usage (TPU host): python scripts/probes/_tpu_r5_fuseopt.py
"""

from __future__ import annotations

import sys
from functools import partial

import jax
import numpy as np

from idg_tpu.config import HarnessConfig, IDGParams
from idg_tpu.data import make_perf_observation
from idg_tpu.ops.api import _resolve, staged_gridder_pieces_runner
from idg_tpu.ops.grid import (plan_grid_add_ranges, sort_observation_blocks,
                              subgrids_to_grid_ranges)
from idg_tpu.ops.pallas.gridder import gridder_pallas_v6_pieces
from idg_tpu.utils.timing import time_kernel


def main() -> int:
    params = IDGParams.from_env()
    harness = HarnessConfig.from_env()
    g, n = params.grid_size, params.subgrid_size
    obs = make_perf_observation(params)
    obs, _ = sort_observation_blocks(obs, g, n)
    md = obs.metadata
    cx = jax.device_put(md.coord_x)
    cy = jax.device_put(md.coord_y)
    plan = plan_grid_add_ranges(md.coord_x, md.coord_y, g, n)
    print(f"devices: {jax.devices()}  S={params.nr_subgrids}")

    rversion, rw_rank = _resolve("gridder", "pallas_v6", params, obs, None)
    oyx = np.stack([
        (np.asarray(md.coord_y).astype(np.int64) % g % n),
        (np.asarray(md.coord_x).astype(np.int64) % g % n),
    ], axis=-1)
    pfn, pargs, _ = staged_gridder_pieces_runner(
        params, obs, rversion, oyx, w_rank=rw_rank
    )
    gfn_t = jax.jit(lambda t: subgrids_to_grid_ranges(
        None, cx, cy, g, apply_fft=True, plan=plan, tiles_pair=t))

    def two_jit(*a):
        return gfn_t(pfn(*a))

    t = time_kernel(two_jit, *pargs, harness=harness)
    print(f"A two-jit       {t.seconds*1e3:8.2f} ms (±{t.seconds_std*1e3:.2f})")

    _, stg, oyx_dev = pargs
    wr = rw_rank if rw_rank is not None else 2

    def one_jit_fn(batch):
        return jax.jit(
            lambda p, st, o: subgrids_to_grid_ranges(
                None, cx, cy, g, apply_fft=True, plan=plan,
                tiles_pair=gridder_pallas_v6_pieces(
                    p, st, o, w_rank=wr, batch=batch)),
            static_argnums=0,
        )

    one4 = one_jit_fn(4)
    t = time_kernel(one4, params, stg, oyx_dev, harness=harness)
    print(f"B one-jit b4    {t.seconds*1e3:8.2f} ms (±{t.seconds_std*1e3:.2f})")

    one8 = one_jit_fn(8)
    t = time_kernel(one8, params, stg, oyx_dev, harness=harness)
    print(f"C one-jit b8    {t.seconds*1e3:8.2f} ms (±{t.seconds_std*1e3:.2f})")

    # parity of B vs A on device (cheap sanity; the full gate ran in
    # _tpu_r5_fusedpipe.py)
    a = jax.tree_util.tree_map(np.asarray, two_jit(*pargs))
    b = jax.tree_util.tree_map(np.asarray, one4(params, stg, oyx_dev))
    for i in (0, 1):
        a0, b0 = np.asarray(a[i]), np.asarray(b[i])
        denom = max(1e-30, float(np.sqrt(np.mean(a0 ** 2))))
        rms = float(np.sqrt(np.mean((a0 - b0) ** 2))) / denom
        print(f"B-vs-A comp {i} rel-RMS {rms:.2e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
