#!/usr/bin/env python
"""Round-5: attribute the fused-pipeline regression (112.7 vs 97.9 ms).

Times each part separately on hardware:
  pieces   the fused-epilogue kernel alone (pfn)
  ranges   the range-kernel grid stage alone, fed pre-computed pieces
  composed pfn -> gfn_t (the shipping fused composition)
and the composition with IDG_STAGE_LAYOUT=off (plain jit dispatch) for a
layout-attribution A/B. Round-4 parts baseline: staged kernel 60.5 ms +
grid stage 31.0 ms; boundary A/B said composition should land 79-85 ms.

Usage (TPU host): python scripts/probes/_tpu_r5_fusedparts.py
"""

from __future__ import annotations

import sys

import jax
import numpy as np

from idg_tpu.config import HarnessConfig, IDGParams
from idg_tpu.data import make_perf_observation
from idg_tpu.ops.api import _resolve, staged_gridder_pieces_runner
from idg_tpu.ops.grid import (plan_grid_add_ranges, sort_observation_blocks,
                              subgrids_to_grid_ranges)
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

    # pieces kernel alone (full outputs; the serialized device queue
    # frees each launch's pieces as the next dequeues — transient, not
    # cumulative, unlike the window-buffer OOM the slim trick solves for
    # jit-dispatched kernels)
    t = time_kernel(pfn, *pargs, harness=harness)
    print(f"pieces alone   {t.seconds*1e3:8.2f} ms (±{t.seconds_std*1e3:.2f})")

    # range kernel alone on materialized pieces
    tiles = pfn(*pargs)
    tiles = jax.device_put(tuple(np.asarray(v) for v in tiles))
    t = time_kernel(gfn_t, tiles, harness=harness)
    print(f"ranges alone   {t.seconds*1e3:8.2f} ms (±{t.seconds_std*1e3:.2f})")
    del tiles

    def fused(*a):
        return gfn_t(pfn(*a))

    t = time_kernel(fused, *pargs, harness=harness)
    print(f"composed       {t.seconds*1e3:8.2f} ms (±{t.seconds_std*1e3:.2f})")

    # layout A/B: plain jit dispatch (no AOT input-format matching)
    import os

    os.environ["IDG_STAGE_LAYOUT"] = "off"
    pfn2, pargs2, _ = staged_gridder_pieces_runner(
        params, obs, rversion, oyx, w_rank=rw_rank
    )

    def fused_off(*a):
        return gfn_t(pfn2(*a))

    t = time_kernel(fused_off, *pargs2, harness=harness)
    print(f"composed(off)  {t.seconds*1e3:8.2f} ms (±{t.seconds_std*1e3:.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
