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

    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
