#!/usr/bin/env python
"""Round-5: degrid fused-prologue ablation (the +17 ms mystery).

kernel-with-prologue 66.1 ms vs producer-fed 49.6: ablate
  full     fused prologue + consumption        [baseline 66.1]
  fuse_raw prologue computes + stores, but the main loop reads the raw
           refs (wrong results) — isolates prologue COMPUTE cost
  none     fuse off entirely, same pieces input shapes (wrong results)

Usage (TPU host): python scripts/probes/_tpu_r5_fuseablate.py
"""
from __future__ import annotations

import sys

import jax
import numpy as np

from idg_tpu.config import HarnessConfig, IDGParams
from idg_tpu.data import make_perf_observation
from idg_tpu.ops.api import _degridder_staged_chunks
from idg_tpu.ops.grid import plan_grid_extract_ranges, sort_observation_blocks
from idg_tpu.ops.pallas.degridder import (_degridder_polstack_batch_run,
                                          degridder_precisions)
from idg_tpu.utils.timing import time_kernel


def main() -> int:
    params = IDGParams.from_env()
    harness = HarnessConfig.from_env()
    g, n = params.grid_size, params.subgrid_size
    obs = make_perf_observation(params)
    obs, _ = sort_observation_blocks(obs, g, n)
    md = obs.metadata
    eplan = plan_grid_extract_ranges(md.coord_x, md.coord_y, g, n)
    run_fn, chunks, starts, chunk, _ = _degridder_staged_chunks(
        params, obs, "pallas_v7", None, align=eplan.wc)
    stg = chunks[0]
    rng = np.random.default_rng(11)
    pieces = jax.device_put(tuple(
        rng.normal(size=(chunk, params.nr_correlations, n, n))
        .astype(np.float32) for _ in range(2)))
    oyx = np.stack([
        (np.asarray(md.coord_y[:chunk]).astype(np.int64) % g % n),
        (np.asarray(md.coord_x[:chunk]).astype(np.int64) % g % n),
    ], axis=-1).astype(np.int32)
    print(f"devices: {jax.devices()}  chunk={chunk}")

    prec = degridder_precisions(2)
    cases = [
        ("full", dict(fuse_oyx=oyx)),
        ("fuse_raw", dict(fuse_oyx=oyx, ablate="fuse_raw")),
        ("none", dict()),
    ]
    for name, kw in cases:
        fn = jax.jit(
            lambda p, st, sub, kw=kw: jax.tree_util.tree_map(
                lambda x: x[:1],
                _degridder_polstack_batch_run(
                    p, st, sub, 2, prec, None, 8, cfold=True, kmerge=3,
                    **kw)),
            static_argnums=0,
        )
        t = time_kernel(fn, params, stg, pieces, harness=harness)
        print(f"{name:9s} {t.seconds*1e3:8.2f} ms (±{t.seconds_std*1e3:.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
