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

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_idg")

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

    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
