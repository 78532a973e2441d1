#!/usr/bin/env python
"""Round-5: zero-copy fused-pipeline boundary (rows_out form).

The round-5 trace attributed ~10.7 ms/pass of the composed fused
pipeline (88.8 ms) to the XLA copy->pad->copy chain converting the
pieces kernel's [S,4,32,32] output into the range kernel's padded
[S+tpad,8,512] row form. rows_out emits that form directly (staging
pre-padded once, outside the window). A/B on hardware:

  A  shipping 4-D composition      (~89 ms committed)
  B  rows-form composition         (expect ~78 ms)

Usage (TPU host): PYTHONPATH=/root/.axon_site:/root/repo python
scripts/probes/_tpu_r5_rowsform.py"""

from __future__ import annotations

import sys

import jax
import numpy as np

from idg_tpu.config import HarnessConfig, IDGParams
from idg_tpu.data import make_perf_observation
from idg_tpu.ops.api import _resolve, staged_gridder_pieces_runner
from idg_tpu.ops.grid import (plan_grid_add_ranges, sort_observation_blocks,
                              subgrids_to_grid_ranges, tile_pad_rows)
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
    print(f"devices: {jax.devices()}  S={params.nr_subgrids} "
          f"tpad={tile_pad_rows(plan)}")

    rversion, rw_rank = _resolve("gridder", "pallas_v6", params, obs, None)
    oyx = np.stack([
        (np.asarray(md.coord_y).astype(np.int64) % g % n),
        (np.asarray(md.coord_x).astype(np.int64) % g % n),
    ], axis=-1)

    # A: shipping 4-D composition
    pfn, pargs, _ = staged_gridder_pieces_runner(
        params, obs, rversion, oyx, w_rank=rw_rank
    )
    gfn_t = jax.jit(lambda t: subgrids_to_grid_ranges(
        None, cx, cy, g, apply_fft=True, plan=plan, tiles_pair=t))

    def comp_a(*a):
        return gfn_t(pfn(*a))

    t = time_kernel(comp_a, *pargs, harness=harness)
    print(f"A 4-D boundary   {t.seconds*1e3:8.2f} ms (±{t.seconds_std*1e3:.2f})")
    ga = jax.tree_util.tree_map(np.asarray, comp_a(*pargs))

    # B: rows-form (zero-copy boundary)
    rfn, rargs, _ = staged_gridder_pieces_runner(
        params, obs, rversion, oyx, w_rank=rw_rank,
        pad_rows=tile_pad_rows(plan),
    )
    gfn_r = jax.jit(lambda t: subgrids_to_grid_ranges(
        None, cx, cy, g, apply_fft=True, plan=plan, tiles_pair=t))

    def comp_b(*a):
        return gfn_r(rfn(*a))

    t = time_kernel(comp_b, *rargs, harness=harness)
    print(f"B rows-form      {t.seconds*1e3:8.2f} ms (±{t.seconds_std*1e3:.2f})")
    gb = jax.tree_util.tree_map(np.asarray, comp_b(*rargs))

    ok = True
    for i in (0, 1):
        a0, b0 = np.asarray(ga[i]), np.asarray(gb[i])
        denom = max(1e-30, float(np.sqrt(np.mean(a0 ** 2))))
        rms = float(np.sqrt(np.mean((a0 - b0) ** 2))) / denom
        mx = float(np.abs(a0 - b0).max())
        print(f"B-vs-A comp {i} rel-RMS {rms:.2e} max-abs {mx:.2e}")
        ok &= rms < 1e-5
    print("PARITY", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
