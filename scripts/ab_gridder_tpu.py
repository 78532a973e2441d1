#!/usr/bin/env python
"""A/B the gridder flagship's MXU dot schedule on hardware.

Variants (same math, same pre-split bf16 scratches — see
ops/pallas/gridder.py:_kernel_sep_recur_batch):
  3x   — 3 dots at M = 2N = 64 (classic 3-product split)
  3x2  — 2 packed dots at M = 4N = 128 (4-product, fewer launches)

Run: python scripts/ab_gridder_tpu.py [--stations N] [--batch B,B,...]
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stations", type=int, default=50)
    ap.add_argument("--batch", default="4")
    ap.add_argument("--ranks", default="1,2")
    args = ap.parse_args()

    import jax

    from idg_tpu import HarnessConfig, IDGParams, make_perf_observation
    from idg_tpu.ops.pallas.common import stage
    from idg_tpu.ops.pallas.gridder import gridder_pallas_v6_staged
    from idg_tpu.types import split_observation
    from idg_tpu.utils.costs import workload_costs
    from idg_tpu.utils.timing import time_kernel

    params = IDGParams.from_env(nr_stations=args.stations)
    harness = HarnessConfig.from_env(nr_warm_up_runs=1, nr_iterations=3)
    obs = make_perf_observation(params)
    sobs = jax.device_put(split_observation(obs))
    stg = jax.jit(stage, static_argnums=0)(params, sobs)
    jax.block_until_ready(jax.tree_util.tree_leaves(stg))
    _, _, mvis = workload_costs(params)
    print(f"S={params.nr_subgrids}  MVis/pass={mvis:.1f}", flush=True)

    for w_rank in [int(r) for r in args.ranks.split(",")]:
        for batch in [int(b) for b in args.batch.split(",")]:
            for mode in ("3x", "3x2"):
                precisions = (
                    (mode,) if w_rank == 1 else (mode, "default")
                )
                try:
                    fn = jax.jit(
                        lambda p, s, pr=precisions, b=batch: gridder_pallas_v6_staged(
                            p, s, w_rank=w_rank, batch=b, precisions=pr
                        ),
                        static_argnums=0,
                    )
                    t = time_kernel(fn, params, stg, harness=harness)
                    print(
                        f"rank={w_rank} batch={batch} mode={mode}: "
                        f"{t.seconds*1e3:8.3f} ms (±{t.seconds_std*1e3:.3f}) "
                        f"{mvis/t.seconds:8.1f} MVis/s",
                        flush=True,
                    )
                except Exception as exc:
                    print(
                        f"rank={w_rank} batch={batch} mode={mode}: "
                        f"FAILED {type(exc).__name__}: {str(exc)[:100]}",
                        flush=True,
                    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
