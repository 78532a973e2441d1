#!/usr/bin/env python
"""Headline benchmark: gridder throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline anchor = the reference's only published gridder number: CUDA
gridder_reference on a Tesla V100 at default perf parameters, 42.93 MVis/s
(BASELINE.md; res/gridder/Tesla_V100-PCIE-32GB-gridder_reference-cuda.csv).

Env knobs: BENCH_KERNEL (registry version; default = fastest available),
NR_ITERATIONS / NR_WARM_UP_RUNS, and the reference's problem-size vars
(GRID_SIZE, NR_STATIONS, ...).
"""

from __future__ import annotations

import json
import os
import sys

# Persistent compile cache: first compiles on the tunneled TPU platform take
# minutes; cache them across processes.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_idg")

V100_GRIDDER_REFERENCE_MVIS_S = 42.93


def main() -> None:
    from idg_tpu.cli import _honor_platform_env

    _honor_platform_env()
    from idg_tpu import HarnessConfig, IDGParams, make_perf_observation
    from idg_tpu.ops.api import staged_runner
    from idg_tpu.ops.registry import list_kernels
    from idg_tpu.utils.costs import workload_costs
    from idg_tpu.utils.timing import time_kernel

    params = IDGParams.from_env()
    harness = HarnessConfig(
        nr_warm_up_runs=int(os.environ.get("NR_WARM_UP_RUNS", 1)),
        nr_iterations=int(os.environ.get("NR_ITERATIONS", 3)),
    )

    # default = the general-w flagship; pallas_v7 (w-free specialization)
    # is opt-in via BENCH_KERNEL=pallas_v7
    preference = ("pallas_v6", "pallas_v5", "pallas_v4",
                  "pallas_v3", "xla_v4", "xla_v2")
    env_version = os.environ.get("BENCH_KERNEL")
    registered = [e.version for e in list_kernels("gridder")]
    candidates = (
        [env_version] if env_version
        else [v for v in preference if v in registered]
    )

    obs = make_perf_observation(params)
    w_rank = os.environ.get("BENCH_W_RANK")
    timing = version = None
    for candidate in candidates:
        try:
            fn, args = staged_runner(
                "gridder", candidate, params, obs,
                w_rank=int(w_rank) if w_rank else None,
            )
            timing = time_kernel(fn, *args, harness=harness)
            version = candidate
            break
        except Exception as exc:  # fall down the ladder on compile failure
            print(f"bench: {candidate} failed ({exc}); falling back",
                  file=sys.stderr)
    if timing is None:
        raise SystemExit("bench: no gridder kernel ran")
    _, _, mvis = workload_costs(params)
    mvis_per_s = mvis / timing.seconds

    print(
        json.dumps(
            {
                "metric": f"gridder_{version}_throughput",
                "value": round(mvis_per_s, 2),
                "unit": "MVis/s",
                "vs_baseline": round(
                    mvis_per_s / V100_GRIDDER_REFERENCE_MVIS_S, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
