#!/usr/bin/env python
"""Round-5: degrid-pipeline parts attribution (fused prologue).

Pipeline split says degridder 59.3 ms + grid stage 17.4 = 76.7 composed,
while the standalone (producer-fed) degridder runs 49.6 ms. Parts:
  pieces-fed fused kernel alone (pre-staged pieces, all chunks)
  extraction alone
  composed (the shipping pipeline)

Usage (TPU host): python scripts/probes/_tpu_r5_degridparts.py
"""

from __future__ import annotations

import sys

import jax
import numpy as np

from idg_tpu.config import HarnessConfig, IDGParams
from idg_tpu.data import make_perf_observation
from idg_tpu.ops.api import staged_degridder_pieces_chunk_consumers
from idg_tpu.ops.grid import (GridExtractRangePlan, grid_to_subgrids_ranges,
                              plan_grid_extract_ranges, slice_extract_plan,
                              sort_observation_blocks)
from idg_tpu.utils.timing import time_kernel


def main() -> int:
    params = IDGParams.from_env()
    harness = HarnessConfig.from_env()
    g, n = params.grid_size, params.subgrid_size
    obs = make_perf_observation(params)
    obs, _ = sort_observation_blocks(obs, g, n)
    md = obs.metadata
    eplan = plan_grid_extract_ranges(md.coord_x, md.coord_y, g, n)
    rng = np.random.default_rng(11)
    grid_pair = jax.device_put(tuple(
        rng.normal(size=(params.nr_correlations, g, g)).astype(np.float32)
        for _ in range(2)
    ))
    print(f"devices: {jax.devices()}")

    oyx = np.stack([
        (np.asarray(md.coord_y).astype(np.int64) % g % n),
        (np.asarray(md.coord_x).astype(np.int64) % g % n),
    ], axis=-1)
    cxn = np.asarray(md.coord_x)
    cyn = np.asarray(md.coord_y)
    S = cxn.shape[0]

    def _sample_fn(bounds_):
        lo, hi = bounds_[0]
        mc_ = hi - lo
        sp = slice_extract_plan(eplan, lo, hi)

        def esh(gr, qb0, tmeta, cx_c, cy_c):
            p_ = GridExtractRangePlan(
                qb0, tmeta, eplan.k_span, eplan.wc, mc_ // eplan.wc,
                eplan.nby, eplan.nbx, mc_, g, n)
            return grid_to_subgrids_ranges(
                gr, cx_c, cy_c, n, apply_fft=True, plan=p_, pieces=True)

        out = jax.jit(esh)(grid_pair, sp.qb0, sp.tmeta,
                           cxn[lo:hi], cyn[lo:hi])
        jax.block_until_ready(out)
        return out

    fcons, bounds, _ = staged_degridder_pieces_chunk_consumers(
        params, obs, "pallas_v7", oyx, align=eplan.wc,
        sample_fn=_sample_fn)
    mc = bounds[0][1] - bounds[0][0]

    def eshim(gr, qb0, tmeta, cx_c, cy_c):
        sp = GridExtractRangePlan(
            qb0, tmeta, eplan.k_span, eplan.wc, mc // eplan.wc,
            eplan.nby, eplan.nbx, mc, g, n,
        )
        return grid_to_subgrids_ranges(
            gr, cx_c, cy_c, n, apply_fft=True, plan=sp, pieces=True)

    efn = jax.jit(eshim)
    echunks = []
    for lo, hi in bounds:
        sp = slice_extract_plan(eplan, lo, hi)
        pad = hi - min(hi, S)
        cx_c = np.concatenate([cxn[lo:hi], np.repeat(cxn[-1:], pad)])
        cy_c = np.concatenate([cyn[lo:hi], np.repeat(cyn[-1:], pad)])
        echunks.append(jax.device_put((sp.qb0, sp.tmeta, cx_c, cy_c)))

    # extraction alone (slimmed outputs)
    def extract_only(gr):
        out = None
        for ec in echunks:
            out = tuple(v[:1] for v in efn(gr, *ec))
        return out

    t = time_kernel(extract_only, grid_pair, harness=harness)
    print(f"extract alone  {t.seconds*1e3:8.2f} ms (±{t.seconds_std*1e3:.2f})")

    # fused kernel alone on pre-materialized pieces
    pieces = [jax.device_put(jax.tree_util.tree_map(
        np.asarray, efn(grid_pair, *ec))) for ec in echunks]

    def kernel_only(pcs):
        out = None
        for pc, kc in zip(pcs, fcons):
            out = kc(pc)
        return out

    t = time_kernel(kernel_only, pieces, harness=harness)
    print(f"kernel alone   {t.seconds*1e3:8.2f} ms (±{t.seconds_std*1e3:.2f})")
    del pieces

    def composed(gr):
        out = None
        for ec, kc in zip(echunks, fcons):
            out = kc(efn(gr, *ec))
        return out

    t = time_kernel(composed, grid_pair, harness=harness)
    print(f"composed       {t.seconds*1e3:8.2f} ms (±{t.seconds_std*1e3:.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
