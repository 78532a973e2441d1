#!/usr/bin/env python
"""Gridded-pipeline boundary A/B (round 4, VERDICT item 4).

The composed gridder pipeline measures 98.2 ms vs 60.5 (kernel) + 31.0
(grid stage) = 91.5 ms of parts — ~6.8 ms lost at the stage boundary
(the explicit S-minor device_put transpose + dispatch gaps). Candidates:

  base    kernel jit (row-major out) -> device_put S-minor -> grid jit
          (the shipping cmd_pipeline composition)
  pin     kernel jit WITH S-minor out_shardings -> grid jit directly
          (the relayout rides the kernel launch's output epilogue
          instead of a separate device_put dispatch)
  fused   one jit: grid-add body composed over the kernel body (XLA
          owns the boundary layout; round-3 measured ~15 ms of
          relayouts here, but that predates the stage-pinning fix)

Usage (TPU host): PYTHONPATH=/root/.axon_site:/root/repo python
scripts/probes/_tpu_r4_pipeab.py
"""

from __future__ import annotations

import jax
import numpy as np

from idg_tpu.config import HarnessConfig, IDGParams
from idg_tpu.data import make_perf_observation
from idg_tpu.ops.api import _resolve, staged_runner
from idg_tpu.ops.grid import (plan_grid_add_ranges, sort_observation_blocks,
                              subgrids_to_grid_ranges)
from idg_tpu.ops.pallas import STAGED
from idg_tpu.types import split_observation
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
    gfn = jax.jit(lambda s: subgrids_to_grid_ranges(
        s, cx, cy, g, apply_fft=True, plan=plan))

    rversion, rw_rank = _resolve("gridder", "pallas_v6", params, obs, None)
    kfn, kargs = staged_runner("gridder", rversion, params, obs,
                               w_rank=rw_rank)

    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    dev = SingleDeviceSharding(jax.devices()[0])
    sminor = Format(Layout(major_to_minor=(1, 2, 3, 0)), dev)

    def base(*a):
        sub = kfn(*a)
        sub = jax.device_put(sub, (sminor, sminor))
        return gfn(sub)

    t = time_kernel(base, *kargs, harness=harness)
    print(f"base  {t.seconds*1e3:8.2f} ms (±{t.seconds_std*1e3:.2f})")

    # pin: rebuild the run jit with S-minor outputs (staged_runner pins
    # row-major + AOT; redo its staging here with the layout flipped)
    from functools import partial

    from idg_tpu.ops.common import canonical_time_offsets

    stage_fn, run_fn = STAGED[("gridder", rversion)]
    import inspect

    if rw_rank is not None and "w_rank" in inspect.signature(run_fn).parameters:
        run_fn = partial(run_fn, w_rank=rw_rank)
    sobs = jax.device_put(split_observation(obs))
    canonical = canonical_time_offsets(obs.metadata,
                                       params.nr_timesteps_subgrid)
    stg = jax.jit(
        partial(stage_fn, canonical=canonical, with_vis=True),
        static_argnums=0,
    )(params, sobs)
    jax.block_until_ready(jax.tree_util.tree_leaves(stg))
    run_pin = jax.jit(run_fn, static_argnums=0,
                      out_shardings=(sminor, sminor))
    try:
        compiled = run_pin.lower(params, stg).compile()
        stg_pin = jax.device_put(stg, compiled.input_formats[0][0])
        jax.block_until_ready(jax.tree_util.tree_leaves(stg_pin))

        def pin(p, st):
            return gfn(compiled(st))

        t = time_kernel(pin, params, stg_pin, harness=harness)
        print(f"pin   {t.seconds*1e3:8.2f} ms (±{t.seconds_std*1e3:.2f})")
    except Exception as e:
        print(f"pin   FAILED: {type(e).__name__}: {e}")

    # fused: one module; XLA owns the boundary layout
    def fused_body(p, st):
        sub = run_fn(p, st)
        return subgrids_to_grid_ranges(sub, cx, cy, g, apply_fft=True,
                                       plan=plan)

    try:
        fused = jax.jit(fused_body, static_argnums=0)
        t = time_kernel(fused, params, stg, harness=harness)
        print(f"fused {t.seconds*1e3:8.2f} ms (±{t.seconds_std*1e3:.2f})")
    except Exception as e:
        print(f"fused FAILED: {type(e).__name__}: {e}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
