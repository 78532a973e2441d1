#!/usr/bin/env python
"""Round-5: prove the fused degrid prologue on TPU.

The degridder's fused forward-DFT prologue (pieces from the range
extraction, constant pre-split factors, step-batched dots) is the
pipeline-degrid CLI default. This probe runs BOTH compositions at the
fullsize problem on the real backend and asserts:

  (a) Mosaic compiles the fused kernel on TPU,
  (b) fused and producer-path visibilities agree at the 1e-5
      normalized-RMS gate ON DEVICE,
  (c) both compositions timed.

Usage (TPU host): python scripts/probes/_tpu_r5_degridpipe.py
"""

from __future__ import annotations

import sys

import jax
import numpy as np

from idg_tpu.config import HarnessConfig, IDGParams
from idg_tpu.data import make_perf_observation
from idg_tpu.ops.api import (staged_degridder_chunk_consumers,
                             staged_degridder_pieces_chunk_consumers)
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
    print(f"devices: {jax.devices()}  S={np.asarray(md.coord_x).shape[0]}")

    oyx = np.stack([
        (np.asarray(md.coord_y).astype(np.int64) % g % n),
        (np.asarray(md.coord_x).astype(np.int64) % g % n),
    ], axis=-1)
    fcons, bounds, rversion = staged_degridder_pieces_chunk_consumers(
        params, obs, "pallas_v7", oyx, align=eplan.wc)
    assert fcons is not None, "pieces consumers declined"
    ncons, nbounds, _ = staged_degridder_chunk_consumers(
        params, obs, rversion, align=eplan.wc)
    assert bounds == nbounds, (bounds, nbounds)

    cxn = np.asarray(md.coord_x)
    cyn = np.asarray(md.coord_y)
    S = cxn.shape[0]
    mc = bounds[0][1] - bounds[0][0]

    def eshim(gr, qb0, tmeta, cx_c, cy_c, pieces):
        sp = GridExtractRangePlan(
            qb0, tmeta, eplan.k_span, eplan.wc, mc // eplan.wc,
            eplan.nby, eplan.nbx, mc, g, n,
        )
        return grid_to_subgrids_ranges(
            gr, cx_c, cy_c, n, apply_fft=True, plan=sp, pieces=pieces)

    efn_p = jax.jit(lambda gr, *a: eshim(gr, *a, pieces=True))
    efn_s = jax.jit(lambda gr, *a: eshim(gr, *a, pieces=False))
    echunks = []
    for lo, hi in bounds:
        sp = slice_extract_plan(eplan, lo, hi)
        pad = hi - min(hi, S)
        cx_c = np.concatenate([cxn[lo:hi], np.repeat(cxn[-1:], pad)])
        cy_c = np.concatenate([cyn[lo:hi], np.repeat(cyn[-1:], pad)])
        echunks.append(jax.device_put((sp.qb0, sp.tmeta, cx_c, cy_c)))

    # (a)+(b): on-device parity of the LAST chunk's full vis rows.
    # Consumers slim to [:1], so compare via direct staged calls instead:
    # run both compositions through the consumers and compare their
    # slimmed outputs per chunk (first row of every chunk exercises the
    # full kernel's first step), AND one full-chunk unslimmed check.
    errs = []
    for ec, kc, nc in zip(echunks, fcons, ncons):
        a = jax.tree_util.tree_map(np.asarray, nc(efn_s(grid_pair, *ec)))
        b = jax.tree_util.tree_map(np.asarray, kc(efn_p(grid_pair, *ec)))
        a0, b0 = np.asarray(a[0]), np.asarray(b[0])
        denom = max(1e-30, float(np.sqrt(np.mean(a0 ** 2))))
        errs.append(float(np.sqrt(np.mean((a0 - b0) ** 2))) / denom)
    print(f"slim-row parity per chunk: {['%.2e' % e for e in errs]}")
    assert max(errs) < 1e-5, errs

    # full unslimmed parity on chunk 0 via the staged entry directly
    from idg_tpu.ops.api import _degridder_staged_chunks

    run_fn, chunks, starts, chunk, _ = _degridder_staged_chunks(
        params, obs, rversion, None, align=eplan.wc)
    lo, hi = bounds[0]
    subs = efn_s(grid_pair, *echunks[0])
    pieces = efn_p(grid_pair, *echunks[0])
    ref = run_fn(params, chunks[0], subs)
    got = run_fn(params, chunks[0], pieces,
                 fuse_oyx=np.asarray(oyx[lo:hi], np.int32))
    rms = []
    for i in (0, 1):
        a0 = np.asarray(ref[i])
        b0 = np.asarray(got[i])
        denom = max(1e-30, float(np.sqrt(np.mean(a0 ** 2))))
        rms.append(float(np.sqrt(np.mean((a0 - b0) ** 2))) / denom)
    print(f"full chunk-0 parity: {['%.2e' % e for e in rms]}")
    assert max(rms) < 1e-5, rms

    # (c) timings of both full compositions
    def fused_pass(gr):
        out = None
        for ec, kc in zip(echunks, fcons):
            out = kc(efn_p(gr, *ec))
        return out

    def plain_pass(gr):
        out = None
        for ec, kc in zip(echunks, ncons):
            out = kc(efn_s(gr, *ec))
        return out

    t = time_kernel(plain_pass, grid_pair, harness=harness)
    print(f"producer path  {t.seconds*1e3:8.2f} ms (±{t.seconds_std*1e3:.2f})")
    t = time_kernel(fused_pass, grid_pair, harness=harness)
    print(f"fused path     {t.seconds*1e3:8.2f} ms (±{t.seconds_std*1e3:.2f})")
    print("DEGRID FUSED PIPELINE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
