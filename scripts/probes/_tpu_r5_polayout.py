#!/usr/bin/env python
"""Round-5: kill the gridder's per-launch po-column relayouts.

res/MXU_TRACE.md: the AOT-matched gridder executable still carries
copy.3/copy.4 — 1.21 ms/launch re-laying the [S, N, 1] po_x/po_y
columns {0,2,1}->{2,1,0} INSIDE the executable (XLA's chosen entry
layout differs from the Mosaic kernel's required row-major operands).
A/B: the standard match dispatch vs a compile with the po columns'
ENTRY layout forced row-major (Layout.AUTO elsewhere).

Usage (TPU host): python scripts/probes/_tpu_r5_polayout.py
"""

from __future__ import annotations

import dataclasses as dc
import sys
from functools import partial

import jax
import numpy as np

from idg_tpu.config import HarnessConfig, IDGParams
from idg_tpu.data import make_perf_observation
from idg_tpu.ops.api import _resolve, staged_runner
from idg_tpu.utils.timing import time_kernel


def main() -> int:
    params = IDGParams.from_env()
    harness = HarnessConfig.from_env()
    obs = make_perf_observation(params)
    print(f"devices: {jax.devices()}  S={params.nr_subgrids}")

    # A: shipping match path
    fn, args = staged_runner("gridder", "pallas_v6", params, obs)
    t = time_kernel(fn, *args, harness=harness)
    print(f"A match         {t.seconds*1e3:8.2f} ms (±{t.seconds_std*1e3:.2f})")
    del fn, args  # drop A's staged copy: two fullsize stagings OOM the chip

    # B: force row-major ENTRY for po_x_col/po_y_col, AUTO elsewhere
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    from idg_tpu.ops.common import canonical_time_offsets
    from idg_tpu.ops.pallas import STAGED
    from idg_tpu.types import split_observation

    version, w_rank = _resolve("gridder", "pallas_v6", params, obs, None)
    stage_fn, run_fn = STAGED[("gridder", version)]
    if w_rank is not None:
        import inspect
        if "w_rank" in inspect.signature(run_fn).parameters:
            run_fn = partial(run_fn, w_rank=w_rank)
    sobs = jax.device_put(split_observation(obs))
    canonical = canonical_time_offsets(obs.metadata,
                                       params.nr_timesteps_subgrid)
    stg = jax.jit(
        partial(stage_fn, canonical=canonical, with_vis=True),
        static_argnums=0,
    )(params, sobs)
    jax.block_until_ready(jax.tree_util.tree_leaves(stg))

    dev = SingleDeviceSharding(jax.devices()[0])
    auto = Format(Layout.AUTO)
    fmt_tree = jax.tree.map(lambda _: auto, stg)

    def rm(a):
        return Format(Layout(major_to_minor=tuple(range(a.ndim))), dev)

    fmt_tree = dc.replace(fmt_tree, po_x_col=rm(stg.po_x_col),
                          po_y_col=rm(stg.po_y_col))
    out_rm = Format(Layout(major_to_minor=(0, 1, 2, 3)), dev)
    run_jit = jax.jit(run_fn, static_argnums=0,
                      in_shardings=(fmt_tree,),
                      out_shardings=(out_rm, out_rm))
    compiled = run_jit.lower(params, stg).compile()
    stg2 = jax.device_put(stg, compiled.input_formats[0][0])
    jax.block_until_ready(jax.tree_util.tree_leaves(stg2))
    del stg
    t = time_kernel(lambda p, st: compiled(st), params, stg2,
                    harness=harness)
    print(f"B po rowmajor   {t.seconds*1e3:8.2f} ms (±{t.seconds_std*1e3:.2f})")
    # (no on-device parity: B is the same traced program with a
    # different ENTRY layout for two inputs — values are unchanged by
    # construction; holding both stagings OOMed the first probe run)
    return 0


if __name__ == "__main__":
    sys.exit(main())
