#!/usr/bin/env python
"""Regenerate res/VALIDATION.md: every registered kernel vs the f64 golden
oracle on REAL TPU hardware, at the reference check-mode problem
(tests/gridder_common.cpp:54-64), for BOTH the standard w = 0 data and the
nonzero-w generator (make_w_observation: w_step != 0, coord_z != 0).

Run on the TPU machine (one process at a time):
    python scripts/validate_tpu.py [--out res/VALIDATION.md]
"""

from __future__ import annotations

import argparse
import os
import sys


def _cache():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from idg_tpu.config import setup_compilation_cache
    setup_compilation_cache()

_cache()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_section(params, obs, subgrids, lines, only=None):
    from idg_tpu.models.reference import degridder_reference, gridder_reference
    from idg_tpu.ops.api import run_degridder, run_gridder
    from idg_tpu.ops.registry import list_kernels
    from idg_tpu.utils.compare import check_error

    golden_g = gridder_reference(params, obs)
    golden_d = degridder_reference(params, obs, subgrids)
    for e in list_kernels():
        if only is not None and e.version not in only:
            continue
        try:
            if e.workload == "gridder":
                got = run_gridder(params, obs, version=e.version)
                r = check_error(got, golden_g, verbose=False)
            else:
                got = run_degridder(params, obs, subgrids, version=e.version)
                r = check_error(got, golden_d, verbose=False)
            verdict = "PASSED" if r.passed else "FAILED"
            err = f"{r.mean_error:.2e}"
        except Exception as exc:
            verdict = "ERROR"
            err = f"{type(exc).__name__}: {str(exc)[:60]}"
        line = f"| {e.workload} | {e.version} | {verdict} | {err} |"
        print(line, flush=True)
        lines.append(line)


def grid_stage_section(gate: float = 1e-4):
    """On-device parity rows: ranges grid-add / grid-extract vs the
    scatter / gather formulations at a mid-size problem."""
    import jax
    import numpy as np

    from idg_tpu import IDGParams
    from idg_tpu.data import initialize_subgrids, make_perf_observation
    from idg_tpu.ops.grid import (grid_to_subgrids, grid_to_subgrids_ranges,
                                  plan_grid_add_ranges,
                                  plan_grid_extract_ranges,
                                  sort_observation_blocks, subgrids_to_grid,
                                  subgrids_to_grid_ranges)
    from idg_tpu.types import split_complex

    params = IDGParams.from_env(nr_stations=14, grid_size=512)  # S=1820
    obs = make_perf_observation(params)
    g, n = params.grid_size, params.subgrid_size
    obs, order = sort_observation_blocks(obs, g, n)
    md = obs.metadata
    cx = jax.device_put(md.coord_x)
    cy = jax.device_put(md.coord_y)
    sub = split_complex(initialize_subgrids(
        params.nr_subgrids, params.nr_correlations, n))
    sub = tuple(jax.device_put(np.asarray(v)[order]) for v in sub)
    rows = []

    plan = plan_grid_add_ranges(md.coord_x, md.coord_y, g, n)
    a = jax.jit(lambda s: subgrids_to_grid(s, cx, cy, g, True))(sub)
    b = jax.jit(lambda s: subgrids_to_grid_ranges(
        s, cx, cy, g, True, plan=plan))(sub)
    scale = max(float(np.abs(np.asarray(a[0])).max()), 1e-30)
    err = max(float(np.abs(np.asarray(a[i]) - np.asarray(b[i])).max())
              for i in (0, 1)) / scale
    verdict = "PASSED" if err < gate else "FAILED"
    rows.append(f"| grid-add (to-grid) | {verdict} | {err:.2e} |")
    print(rows[-1], flush=True)

    rng = np.random.default_rng(3)
    grid_pair = jax.device_put(tuple(
        rng.normal(size=(params.nr_correlations, g, g)).astype(np.float32)
        for _ in range(2)))
    eplan = plan_grid_extract_ranges(md.coord_x, md.coord_y, g, n)
    a = jax.jit(lambda gr: grid_to_subgrids(gr, cx, cy, n, True))(grid_pair)
    b = jax.jit(lambda gr: grid_to_subgrids_ranges(
        gr, cx, cy, n, True, plan=eplan))(grid_pair)
    scale = max(float(np.abs(np.asarray(a[0])).max()), 1e-30)
    err = max(float(np.abs(np.asarray(a[i]) - np.asarray(b[i])).max())
              for i in (0, 1)) / scale
    verdict = "PASSED" if err < gate else "FAILED"
    rows.append(f"| grid-extract (to-subgrids) | {verdict} | {err:.2e} |")
    print(rows[-1], flush=True)

    # streamed formulations (HBM-capacity paths) vs their fused twins —
    # small stripes force chunk straddling and the wrap row
    from idg_tpu.ops.grid import (grid_to_subgrids_ranges_streamed,
                                  subgrids_to_grid_ranges_streamed)

    import numpy as _np

    b_add = jax.jit(lambda s: subgrids_to_grid_ranges(
        s, cx, cy, g, True, plan=plan))(sub)
    re_b, im_b = subgrids_to_grid_ranges_streamed(sub, cx, cy, g, True,
                                                  plan=plan)
    c = (_np.concatenate([_np.asarray(v) for v in re_b], axis=1),
         _np.concatenate([_np.asarray(v) for v in im_b], axis=1))
    scale = max(float(np.abs(np.asarray(b_add[0])).max()), 1e-30)
    err = max(float(np.abs(np.asarray(b_add[i]) - c[i]).max())
              for i in (0, 1)) / scale
    verdict = "PASSED" if err < gate else "FAILED"
    rows.append(f"| grid-add streamed (vs fused ranges) | {verdict} "
                f"| {err:.2e} |")
    print(rows[-1], flush=True)

    b = jax.jit(lambda gr: grid_to_subgrids_ranges(
        gr, cx, cy, n, True, plan=eplan))(grid_pair)
    c = grid_to_subgrids_ranges_streamed(grid_pair, cx, cy, n, True,
                                         plan=eplan, stripe_rows=5)
    scale = max(float(np.abs(np.asarray(b[0])).max()), 1e-30)
    err = max(float(np.abs(np.asarray(b[i]) - np.asarray(c[i])).max())
              for i in (0, 1)) / scale
    verdict = "PASSED" if err < gate else "FAILED"
    rows.append(f"| grid-extract streamed (vs fused ranges) | {verdict} "
                f"| {err:.2e} |")
    print(rows[-1], flush=True)
    return rows


def fused_section():
    """Fused pipeline compositions vs producer paths at the check problem."""
    import dataclasses as dc

    import jax
    import numpy as np

    from idg_tpu import IDGParams, make_observation
    from idg_tpu.ops.common import canonical_time_offsets
    from idg_tpu.ops.grid import (extract_ranges_eligible,
                                  grid_to_subgrids_ranges,
                                  plan_grid_extract_ranges,
                                  sort_observation_blocks,
                                  subgrids_to_grid_ranges)
    from idg_tpu.ops.pallas import STAGED
    from idg_tpu.ops.pallas.degridder import degridder_pallas_v7_staged
    from idg_tpu.ops.pallas.gridder import gridder_pallas_v6_pieces
    from idg_tpu.types import split_observation

    rows = []
    params = IDGParams.correctness_defaults()
    g, n = params.grid_size, params.subgrid_size
    obs, _ = make_observation(params)
    obs, _ = sort_observation_blocks(obs, g, n)
    md = obs.metadata
    oyx = np.stack([
        (np.asarray(md.coord_y).astype(np.int64) % g % n),
        (np.asarray(md.coord_x).astype(np.int64) % g % n),
    ], axis=-1)

    def rel_rms(a, b):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(1e-30, float(np.sqrt(np.mean(a ** 2))))
        return float(np.sqrt(np.mean((a - b) ** 2))) / denom

    # gridder: pieces epilogue -> range grid-add vs producer composition
    sobs = split_observation(obs)
    stage_fn, run_fn = STAGED[("gridder", "pallas_v6")]
    stg = jax.jit(
        lambda p, s: stage_fn(p, s, with_vis=True), static_argnums=0
    )(params, sobs)
    sub = run_fn(params, stg)
    exp = subgrids_to_grid_ranges(sub, md.coord_x, md.coord_y, g,
                                  apply_fft=True)
    pieces = gridder_pallas_v6_pieces(params, stg, oyx)
    got = subgrids_to_grid_ranges(None, md.coord_x, md.coord_y, g,
                                  apply_fft=True, tiles_pair=pieces)
    err = max(rel_rms(exp[0], got[0]), rel_rms(exp[1], got[1]))
    ok = err < 1e-5
    rows.append("| gridder pallas_v6 pieces -> range grid-add | "
                f"{'PASSED' if ok else 'FAILED'} | {err:.2e} |")
    del stg, sub, exp, pieces, got

    # degridder: range extraction pieces -> fused prologue vs producer
    eplan = plan_grid_extract_ranges(md.coord_x, md.coord_y, g, n)
    if extract_ranges_eligible(eplan, params.nr_correlations, g, n):
        rng = np.random.default_rng(7)
        grid_pair = tuple(
            rng.normal(size=(params.nr_correlations, g, g))
            .astype(np.float32) for _ in range(2)
        )
        subs = grid_to_subgrids_ranges(grid_pair, md.coord_x, md.coord_y,
                                       n, apply_fft=True, plan=eplan)
        pcs = grid_to_subgrids_ranges(grid_pair, md.coord_x, md.coord_y,
                                      n, apply_fft=True, plan=eplan,
                                      pieces=True)
        dstage_fn, _ = STAGED[("degridder", "pallas_v7")]
        dsobs = dc.replace(sobs, vis_re=None, vis_im=None)
        canonical = canonical_time_offsets(md, params.nr_timesteps_subgrid)
        dstg = jax.jit(
            lambda p, s: dstage_fn(p, s, canonical=canonical,
                                   with_vis=False),
            static_argnums=0,
        )(params, dsobs)
        ref = degridder_pallas_v7_staged(params, dstg, subs, w_rank=2)
        fus = degridder_pallas_v7_staged(params, dstg, pcs, w_rank=2,
                                         fuse_oyx=oyx)
        err = max(rel_rms(ref[0], fus[0]), rel_rms(ref[1], fus[1]))
        ok = err < 1e-5
        rows.append("| range extract -> degridder pallas_v7 fused prologue "
                    f"| {'PASSED' if ok else 'FAILED'} | {err:.2e} |")
    else:
        rows.append("| range extract -> degridder fused prologue | "
                    "SKIPPED (plan not range-eligible) | - |")
    return rows


def fused_rows_section():
    """The SHIPPING zero-copy row-form boundaries (round 5): gridder
    rows_out pieces -> range grid-add, and extraction pieces="rows" ->
    degridder fused prologue, vs the producer compositions — on a
    mid-size TILE-PATH problem (the check problem's plan is sparse, so
    the gridder row form doesn't apply there)."""
    import dataclasses as dc

    import jax
    import numpy as np

    from idg_tpu import IDGParams, make_observation
    from idg_tpu.ops.common import canonical_time_offsets
    from idg_tpu.ops.grid import (extract_ranges_eligible,
                                  grid_to_subgrids_ranges,
                                  plan_grid_add_ranges,
                                  plan_grid_extract_ranges,
                                  sort_observation_blocks,
                                  subgrids_to_grid_ranges, tile_pad_rows)
    from idg_tpu.ops.pallas import STAGED
    from idg_tpu.ops.pallas.common import pad_staged
    from idg_tpu.ops.pallas.degridder import degridder_pallas_v7_staged
    from idg_tpu.ops.pallas.gridder import (gridder_pallas_v6_pieces,
                                            pieces_pad_rows)
    from idg_tpu.types import split_observation

    rows = []
    params = IDGParams(grid_size=1024, subgrid_size=32, nr_stations=14,
                       nr_timeslots=6, nr_timesteps_subgrid=32,
                       nr_channels=16)  # S=546 ≥ nbp/2=512: tile path
    g, n = params.grid_size, params.subgrid_size
    obs, _ = make_observation(params)
    obs, _ = sort_observation_blocks(obs, g, n)
    md = obs.metadata
    cxn = np.asarray(md.coord_x)
    cyn = np.asarray(md.coord_y)
    s = cxn.shape[0]
    oyx = np.stack([
        (cyn.astype(np.int64) % g % n),
        (cxn.astype(np.int64) % g % n),
    ], axis=-1).astype(np.int32)

    def rel_rms(a, b):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(1e-30, float(np.sqrt(np.mean(a ** 2))))
        return float(np.sqrt(np.mean((a - b) ** 2))) / denom

    plan = plan_grid_add_ranges(cxn, cyn, g, n)
    if plan.nbp <= 2 * s:
        sobs = split_observation(obs)
        stage_fn, run_fn = STAGED[("gridder", "pallas_v6")]
        stg = jax.jit(
            lambda p, so: stage_fn(p, so, with_vis=True), static_argnums=0
        )(params, sobs)
        sub = run_fn(params, stg)
        exp = subgrids_to_grid_ranges(sub, md.coord_x, md.coord_y, g,
                                      apply_fft=True, plan=plan)
        r = pieces_pad_rows(s, tile_pad_rows(plan))
        rpieces = gridder_pallas_v6_pieces(
            params, pad_staged(stg, r),
            np.concatenate([oyx, np.zeros((r - s, 2), oyx.dtype)]),
            rows_out=True,
        )
        got = subgrids_to_grid_ranges(None, md.coord_x, md.coord_y, g,
                                      apply_fft=True, plan=plan,
                                      tiles_pair=rpieces)
        err = max(rel_rms(exp[0], got[0]), rel_rms(exp[1], got[1]))
        ok = err < 1e-5
        rows.append("| gridder rows_out pieces -> range grid-add "
                    f"(zero-copy) | {'PASSED' if ok else 'FAILED'} "
                    f"| {err:.2e} |")
        del stg, sub, exp, rpieces, got
    else:
        rows.append("| gridder rows_out pieces | SKIPPED (sparse plan) "
                    "| - |")

    eplan = plan_grid_extract_ranges(md.coord_x, md.coord_y, g, n)
    if extract_ranges_eligible(eplan, params.nr_correlations, g, n):
        rng = np.random.default_rng(7)
        grid_pair = tuple(
            rng.normal(size=(params.nr_correlations, g, g))
            .astype(np.float32) for _ in range(2)
        )
        subs = grid_to_subgrids_ranges(grid_pair, md.coord_x, md.coord_y,
                                       n, apply_fft=True, plan=eplan)
        rpcs = grid_to_subgrids_ranges(grid_pair, md.coord_x, md.coord_y,
                                       n, apply_fft=True, plan=eplan,
                                       pieces="rows")
        dstage_fn, _ = STAGED[("degridder", "pallas_v7")]
        dsobs = dc.replace(split_observation(obs), vis_re=None,
                           vis_im=None)
        canonical = canonical_time_offsets(md, params.nr_timesteps_subgrid)
        dstg = jax.jit(
            lambda p, so: dstage_fn(p, so, canonical=canonical,
                                    with_vis=False),
            static_argnums=0,
        )(params, dsobs)
        ref = degridder_pallas_v7_staged(params, dstg, subs, w_rank=2)
        fus = degridder_pallas_v7_staged(params, dstg, rpcs, w_rank=2,
                                         fuse_oyx=oyx)
        err = max(rel_rms(ref[0], fus[0]), rel_rms(ref[1], fus[1]))
        ok = err < 1e-5
        rows.append("| row-form extract -> degridder fused prologue "
                    f"(zero-copy) | {'PASSED' if ok else 'FAILED'} "
                    f"| {err:.2e} |")
    else:
        rows.append("| row-form extract -> degridder fused prologue | "
                    "SKIPPED (plan not range-eligible) | - |")
    return rows


def mesh_section():
    """mesh(1) shard_map parity vs the unsharded staged kernels."""
    import jax
    import numpy as np

    from idg_tpu import IDGParams, make_observation
    from idg_tpu.data import initialize_subgrids
    from idg_tpu.ops.pallas import STAGED
    from idg_tpu.parallel import make_mesh
    from idg_tpu.parallel.sharded import (shard_staged_inputs,
                                          sharded_degridder_staged,
                                          sharded_gridder_staged)
    from idg_tpu.types import (combine_complex, split_complex,
                               split_observation)
    from idg_tpu.utils.compare import check_error

    rows = []
    params = IDGParams.correctness_defaults()
    obs, _ = make_observation(params)
    sobs = split_observation(obs)
    mesh = make_mesh(1)

    stage_fn, run_fn = STAGED[("gridder", "pallas_v6")]
    stg = jax.jit(
        lambda p, s: stage_fn(p, s, with_vis=True), static_argnums=0
    )(params, sobs)
    exp = combine_complex(*map(np.asarray, run_fn(params, stg)))
    del stg
    stg_sh, _ = shard_staged_inputs(params, sobs, mesh, "gridder",
                                    "pallas_v6")
    got = combine_complex(*map(
        np.asarray,
        sharded_gridder_staged(params, mesh, "pallas_v6")(stg_sh)))
    r = check_error(got, exp, verbose=False)
    rows.append("| gridder | pallas_v6 mesh1 | "
                f"{'PASSED' if r.passed else 'FAILED'} | "
                f"{r.mean_error:.3g} |")
    del stg_sh, exp, got

    subgrids = initialize_subgrids(
        params.nr_subgrids, params.nr_correlations, params.subgrid_size)
    stage_fn, run_fn = STAGED[("degridder", "pallas_v7")]
    stg = jax.jit(
        lambda p, s: stage_fn(p, s, with_vis=False), static_argnums=0
    )(params, sobs)
    exp = combine_complex(*map(
        np.asarray, run_fn(params, stg, split_complex(subgrids))))
    del stg
    stg_sh, spair = shard_staged_inputs(
        params, sobs, mesh, "degridder", "pallas_v7", subgrids)
    got = combine_complex(*map(
        np.asarray,
        sharded_degridder_staged(params, mesh, "pallas_v7")(stg_sh, spair)))
    r = check_error(got, exp, verbose=False)
    rows.append("| degridder | pallas_v7 mesh1 | "
                f"{'PASSED' if r.passed else 'FAILED'} | "
                f"{r.mean_error:.3g} |")
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="res/VALIDATION.md")
    ap.add_argument("--versions", default=None,
                    help="comma-separated version filter (default: all)")
    args = ap.parse_args()
    only = set(args.versions.split(",")) if args.versions else None

    import jax

    from idg_tpu import IDGParams, make_observation, make_w_observation
    from idg_tpu.data import initialize_subgrids

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)

    params = IDGParams.correctness_defaults()
    obs, _ = make_observation(params)
    subgrids = initialize_subgrids(
        params.nr_subgrids, params.nr_correlations, params.subgrid_size
    )

    lines = [
        "# Hardware validation — TPU v5e, reference check-mode problem",
        "",
        "Every registered kernel vs the f64 golden oracle at the 1e-5",
        "normalized-RMS gate (tests/test_util.hpp:84 semantics). Kernels run",
        "through the public API, so the round-2 guards (channel-spacing",
        "fallback, w-rank escalation) are active exactly as a user sees them.",
        "",
        "## Standard data (w = 0, the reference generators)",
        "",
        "| workload | version | result | error |",
        "|---|---|---|---|",
    ]
    run_section(params, obs, subgrids, lines, only)

    wparams, wobs, wsub = make_w_observation(params, include_subgrids=True)
    lines += [
        "",
        "## Nonzero-w data (make_w_observation: w tracks + w-plane metadata,",
        f"w_step = {wparams.w_step:.4g})",
        "",
        "The w-free rank-1 rungs (gridder pallas_v7, degridder pallas_v8)",
        "auto-fall-back to their general sibling here — the guard, not the",
        "raw kernel, is what's validated.",
        "",
        "| workload | version | result | error |",
        "|---|---|---|---|",
    ]
    run_section(wparams, wobs, wsub, lines, only)

    lines += [
        "",
        "## Grid stage (range kernels vs the windowed scatter/gather)",
        "",
        "Block-sorted range-read Pallas kernels vs the lax.scatter_add /",
        "dynamic-slice formulations, on-device, normalized max-elementwise",
        "error (the range paths fold the tile roll into DFT phases, so the",
        "residual is sin/cos rounding; RMS is far below it).",
        "",
        "| direction | result | max-rel error |",
        "|---|---|---|",
    ]
    lines += grid_stage_section()

    lines += [
        "",
        "## Fused grid-stage compositions (round 5)",
        "",
        "The fused pipeline kernels — gridder iDFT EPILOGUE emitting",
        "phase-rolled pieces into the range grid-add, degridder",
        "forward-DFT PROLOGUE consuming the range extraction's pieces —",
        "vs their XLA-producer compositions, on-device at the check",
        "problem (normalized RMS, 1e-5 gate). Fullsize hardware numbers:",
        "scripts/probes/_tpu_r5_fusedpipe.py / _tpu_r5_degridpipe.py.",
        "",
        "| composition | result | error |",
        "|---|---|---|",
    ]
    lines += fused_section()

    lines += [
        "",
        "## Zero-copy row-form boundaries (round 5, the shipping",
        "pipeline defaults)",
        "",
        "The pieces cross the stage boundary in the kernels' native",
        "[R, N, N·P] row form (exact (8,128) tiles; no XLA op at the",
        "boundary), vs the producer compositions — mid-size tile-path",
        "problem (grid 1024², S=546; the check problem's grid-add plan",
        "is sparse).",
        "",
        "| composition | result | error |",
        "|---|---|---|",
    ]
    lines += fused_rows_section()

    lines += [
        "",
        "## Mesh path on real hardware (mesh(1), check problem)",
        "",
        "shard_map + staged Mosaic kernels + NamedSharding resharding on",
        "the real TPU backend. mesh(1) runs the same traced program —",
        "partition specs, boundary layouts, raw c-major degridder",
        "boundary — with world size 1, so no second chip is needed.",
        "Fullsize runs: scripts/mesh1_parity_tpu.py (round 5:",
        "bit-identical, both workloads).",
        "",
        "| workload | version | vs unsharded staged | error |",
        "|---|---|---|---|",
    ]
    lines += mesh_section()

    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
