#!/usr/bin/env python
"""Round-5 directive 1: prove the fused-pieces gridded pipeline on TPU.

The fused grid-stage epilogue (gridder_pallas_v6_pieces: roll phases +
folded-shift iDFT on the MXU, row-major pieces straight into the range
kernel) landed in round 4 CPU-tested only, while already being the
`pipeline` CLI default. This probe runs BOTH cmd_pipeline compositions
at the fullsize perf problem on the real backend and asserts:

  (a) Mosaic compiles the pieces kernel on TPU,
  (b) fused and --no-fuse grids agree at the 1e-5 normalized-RMS gate
      ON DEVICE (CPU bit-parity does not transfer: qsplit/ROADMAP
      negative-result history),
  (c) both compositions timed (the committed CSVs come from the CLI).

Usage (TPU host): python scripts/probes/_tpu_r5_fusedpipe.py
"""

from __future__ import annotations

import sys

import jax
import numpy as np

from idg_tpu.config import HarnessConfig, IDGParams
from idg_tpu.data import make_perf_observation
from idg_tpu.ops.api import (_resolve, staged_gridder_pieces_runner,
                             staged_runner)
from idg_tpu.ops.grid import (plan_grid_add_ranges, sort_observation_blocks,
                              subgrids_to_grid_ranges)
from idg_tpu.utils.compare import check_error
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
    print(f"devices: {jax.devices()}  S={params.nr_subgrids}  grid {g}")

    rversion, rw_rank = _resolve("gridder", "pallas_v6", params, obs, None)

    # fused composition (cmd_pipeline default)
    oyx = np.stack([
        (np.asarray(md.coord_y).astype(np.int64) % g % n),
        (np.asarray(md.coord_x).astype(np.int64) % g % n),
    ], axis=-1)
    pfn, pargs, _ = staged_gridder_pieces_runner(
        params, obs, rversion, oyx, w_rank=rw_rank
    )
    assert pfn is not None, "pieces runner declined at the perf problem"
    gfn_t = jax.jit(lambda t: subgrids_to_grid_ranges(
        None, cx, cy, g, apply_fft=True, plan=plan, tiles_pair=t))

    def fused(*a):
        return gfn_t(pfn(*a))

    grid_f = fused(*pargs)  # (a) Mosaic compile + first run
    grid_f = tuple(np.asarray(v) for v in grid_f)
    print("fused: compiled and ran")

    # non-fused composition (cmd_pipeline --no-fuse)
    kfn, kargs = staged_runner("gridder", rversion, params, obs,
                               w_rank=rw_rank)
    gfn = jax.jit(lambda s: subgrids_to_grid_ranges(
        s, cx, cy, g, apply_fft=True, plan=plan))
    try:
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding

        sminor = Format(Layout(major_to_minor=(1, 2, 3, 0)),
                        SingleDeviceSharding(jax.devices()[0]))
    except Exception:
        sminor = None

    def nofuse(*a):
        sub = kfn(*a)
        if sminor is not None:
            sub = jax.device_put(sub, (sminor, sminor))
        return gfn(sub)

    grid_n = tuple(np.asarray(v) for v in nofuse(*kargs))

    # (b) on-device parity at the reference 1e-5 gate
    gz_f = grid_f[0] + 1j * grid_f[1]
    gz_n = grid_n[0] + 1j * grid_n[1]
    res = check_error(gz_f, gz_n, verbose=True)
    print(f"parity fused vs no-fuse: "
          f"{'PASSED' if res.passed else 'FAILED'} err {res.mean_error:.3e}")

    # (c) timings
    tf = time_kernel(fused, *pargs, harness=harness)
    tn = time_kernel(nofuse, *kargs, harness=harness)
    print(f"fused    {tf.seconds*1e3:8.2f} ms (±{tf.seconds_std*1e3:.2f})")
    print(f"no-fuse  {tn.seconds*1e3:8.2f} ms (±{tn.seconds_std*1e3:.2f})")
    return 0 if res.passed else 1


if __name__ == "__main__":
    sys.exit(main())
