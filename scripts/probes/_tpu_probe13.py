#!/usr/bin/env python
"""Round-3 probe 13 (serialized TPU experiments):
1. degridder v7/v8 qsplit A/B on an 8192-subgrid chunk (VPU-diet RHS
   assembly: quadrant bf16 splits + lhs-half-swap, bit-identical math)
2. grid-add Pallas gather: rows_per_step sweep (K=8 known: 138.5 ms
   fullsize = ~7.5 us/step, DMA-latency-bound at 1-step lookahead;
   larger K amortizes one latency over more rows)
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_idg")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from idg_tpu.config import setup_compilation_cache

setup_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from idg_tpu import HarnessConfig, IDGParams, make_observation, make_perf_observation
from idg_tpu.data import initialize_subgrids
from idg_tpu.ops.pallas.common import stage, slice_staged
from idg_tpu.ops.pallas.degridder import (
    degridder_pallas_v7_staged, degridder_pallas_v8_staged,
)
from idg_tpu.models import degridder_reference
from idg_tpu.types import split_complex, split_observation
from idg_tpu.utils.compare import check_error
from idg_tpu.utils.costs import workload_costs
from idg_tpu.utils.timing import time_kernel

CHUNK = 8192


def pin_rowmajor(tree):
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    dev = SingleDeviceSharding(jax.devices()[0])
    shapes = jax.eval_shape(lambda t: t, tree)
    fmts = jax.tree.map(
        lambda s: Format(Layout(major_to_minor=tuple(range(s.ndim))), dev),
        shapes,
    )
    return jax.jit(lambda t: t, out_shardings=fmts)(tree)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    params = IDGParams.from_env()
    harness = HarnessConfig.from_env(nr_warm_up_runs=1, nr_iterations=3)
    obs = make_perf_observation(params)
    sobs = jax.device_put(split_observation(obs))
    gflops, _, mvis_full = workload_costs(params)
    mvis_c = mvis_full * CHUNK / params.nr_subgrids

    # ---------- 1. degridder qsplit A/B ----------
    sub = initialize_subgrids(
        params.nr_subgrids, params.nr_correlations, params.subgrid_size
    )
    sub_pair = jax.device_put(split_complex(sub))
    del sub
    stg = jax.jit(
        lambda p, s: stage(p, s, with_vis=False), static_argnums=0
    )(params, sobs)
    jax.block_until_ready(jax.tree_util.tree_leaves(stg))
    stg_c = pin_rowmajor(slice_staged(stg, 0, CHUNK))
    sub_c = pin_rowmajor((sub_pair[0][:CHUNK], sub_pair[1][:CHUNK]))
    jax.block_until_ready(jax.tree_util.tree_leaves([stg_c, sub_c]))
    del stg, sub_pair

    for name, fn, kw in [
        ("v7 base      ", degridder_pallas_v7_staged, dict(w_rank=2)),
        ("v7 qsplit    ", degridder_pallas_v7_staged,
         dict(w_rank=2, qsplit=True)),
        ("v8 base      ", degridder_pallas_v8_staged, dict()),
        ("v8 qsplit    ", degridder_pallas_v8_staged, dict(qsplit=True)),
    ]:
        try:
            tj = time.time()
            f = jax.jit(
                lambda p, st, su, _f=fn, _kw=kw: _f(p, st, su, **_kw),
                static_argnums=0,
            )
            t = time_kernel(f, params, stg_c, sub_c, harness=harness)
            print(f"degrid {name}: {t.seconds*1e3:8.3f} ms "
                  f"({mvis_c/t.seconds:7.1f} MVis/s) [{time.time()-tj:.0f}s]",
                  flush=True)
        except Exception as exc:
            print(f"degrid {name}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)
    del stg_c, sub_c

    # ---------- 2. grid-add K sweep ----------
    from idg_tpu.ops.grid import plan_grid_add, subgrids_to_grid_pallas

    g, n = params.grid_size, params.subgrid_size
    sub2 = initialize_subgrids(params.nr_subgrids, params.nr_correlations, n)
    spair = jax.device_put(split_complex(sub2))
    del sub2
    cx = jax.device_put(obs.metadata.coord_x)
    cy = jax.device_put(obs.metadata.coord_y)
    plan = plan_grid_add(obs.metadata.coord_x, obs.metadata.coord_y, g, n)
    h1 = HarnessConfig.from_env(nr_warm_up_runs=1, nr_iterations=2)
    for K in (16, 32, 64):
        try:
            tj = time.time()
            fn = jax.jit(lambda s, x, y, _k=K: subgrids_to_grid_pallas(
                s, x, y, g, True, plan=plan, rows_per_step=_k))
            t = time_kernel(fn, spair, cx, cy, harness=h1)
            capp = -(-plan.cap // K) * K
            print(f"grid_add K={K:2d} (cap->{capp}): {t.seconds*1e3:8.3f} ms "
                  f"(±{t.seconds_std*1e3:.2f}) [{time.time()-tj:.0f}s]",
                  flush=True)
        except Exception as exc:
            print(f"grid_add K={K}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
