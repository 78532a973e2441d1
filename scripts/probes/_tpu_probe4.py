#!/usr/bin/env python
"""Round-3 probe 4: (1) attribute the degridder fullsize regression
(305 MVis/s via CLI vs 660 in probe3); (2) attribute the bucketed
grid-add's 3430 ms (pieces construction vs slot gather)."""
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

from idg_tpu import HarnessConfig, IDGParams, make_perf_observation
from idg_tpu.data import initialize_subgrids
from idg_tpu.ops.common import canonical_time_offsets
from idg_tpu.ops.pallas.common import stage, slice_staged
from idg_tpu.ops.pallas.degridder import _degridder_polstack_batch_run
from idg_tpu.types import split_complex, split_observation
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


def report(name, seconds, per, unit="us/sg", mvis=None):
    extra = f", {mvis/seconds:7.1f} MVis/s" if mvis else ""
    print(f"{name:24s}: {seconds*1e3:9.3f} ms ({per:7.3f} {unit}{extra})",
          flush=True)


def main():
    t0 = time.time()
    print(f"devices: {jax.devices()}", flush=True)
    params = IDGParams.from_env()
    harness = HarnessConfig.from_env(nr_warm_up_runs=1, nr_iterations=3)
    obs = make_perf_observation(params)
    sobs = jax.device_put(split_observation(obs))
    sub = initialize_subgrids(
        params.nr_subgrids, params.nr_correlations, params.subgrid_size
    )
    sub_pair = jax.device_put(split_complex(sub))
    _, _, mvis_full = workload_costs(params)
    mvis_c = mvis_full * CHUNK / params.nr_subgrids

    # ---------------- phase 1: degridder ----------------
    stg = jax.jit(
        lambda p, s: stage(p, s, with_vis=False), static_argnums=0
    )(params, sobs)
    jax.block_until_ready(jax.tree_util.tree_leaves(stg))
    stg_c = pin_rowmajor(slice_staged(stg, 0, CHUNK))
    sub_c = pin_rowmajor((sub_pair[0][:CHUNK], sub_pair[1][:CHUNK]))
    jax.block_until_ready(jax.tree_util.tree_leaves([stg_c, sub_c]))
    print(f"staged+pinned in {time.time()-t0:.1f}s", flush=True)

    prec = ("3x2k", "default")

    def run_direct(p, st, su):
        return _degridder_polstack_batch_run(
            p, st, su, 2, prec, None, batch=8, cfold=True
        )

    def run_slim(p, st, su):
        out = run_direct(p, st, su)
        return jax.tree_util.tree_map(lambda x: x[:1, :1, :1], out)

    for name, f in [("A direct b8 cfold", run_direct),
                    ("B slim-sliced", run_slim)]:
        try:
            tj = time.time()
            fn = jax.jit(f, static_argnums=0)
            t = time_kernel(fn, params, stg_c, sub_c, harness=harness)
            report(name, t.seconds, t.seconds / CHUNK * 1e6, mvis=mvis_c)
            print(f"    [compile+run {time.time()-tj:.0f}s]", flush=True)
        except Exception as exc:
            print(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:200]}",
                  flush=True)

    # canonical staging (what the CLI uses)
    try:
        canon = canonical_time_offsets(obs.metadata, params.nr_timesteps_subgrid)
        stg2 = jax.jit(
            lambda p, s: stage(p, s, canonical=canon, with_vis=False),
            static_argnums=0,
        )(params, sobs)
        jax.block_until_ready(jax.tree_util.tree_leaves(stg2))
        stg2_c = pin_rowmajor(slice_staged(stg2, 0, CHUNK))
        jax.block_until_ready(jax.tree_util.tree_leaves(stg2_c))
        fn = jax.jit(run_direct, static_argnums=0)
        t = time_kernel(fn, params, stg2_c, sub_c, harness=harness)
        report("C canonical-staged", t.seconds, t.seconds / CHUNK * 1e6,
               mvis=mvis_c)
        del stg2, stg2_c
    except Exception as exc:
        print(f"C canonical: FAILED {type(exc).__name__}: {str(exc)[:200]}",
              flush=True)

    del stg, stg_c
    # exact CLI path (staged_runner fullsize, 3 chunks + slim)
    try:
        from idg_tpu.ops.api import staged_runner

        fn, fargs = staged_runner("degridder", "pallas_v7", params, obs,
                                  subgrids=sub)
        t = time_kernel(fn, *fargs, harness=harness)
        report("D CLI staged_runner", t.seconds,
               t.seconds / params.nr_subgrids * 1e6, mvis=mvis_full)
    except Exception as exc:
        print(f"D CLI: FAILED {type(exc).__name__}: {str(exc)[:200]}",
              flush=True)

    # ---------------- phase 2: grid-add attribution ----------------
    g = params.grid_size
    n = params.subgrid_size
    from idg_tpu.ops.grid import (
        _quadrant_pieces, fft2_pair, fftshift2_pair, plan_grid_add,
        subgrids_to_grid,
    )

    cx = jax.device_put(obs.metadata.coord_x)
    cy = jax.device_put(obs.metadata.coord_y)
    plan = plan_grid_add(obs.metadata.coord_x, obs.metadata.coord_y, g, n)
    print(f"plan: cap {plan.cap}, inflation {plan.slot_inflation:.2f}", flush=True)
    h1 = HarnessConfig.from_env(nr_warm_up_runs=1, nr_iterations=1)

    def pieces_only(s, x, y):
        s = fftshift2_pair(fft2_pair(fftshift2_pair(s), inverse=True))
        pre, pim = _quadrant_pieces(s, y, x, g)
        return pre.sum(), pim.sum()   # force compute, avoid 3.2 GB output

    try:
        fn = jax.jit(pieces_only)
        t = time_kernel(fn, sub_pair, cx, cy, harness=h1)
        report("P pieces+fft (fused sum)", t.seconds, t.seconds * 1e3, "ms")
    except Exception as exc:
        print(f"P pieces: FAILED {type(exc).__name__}: {str(exc)[:200]}",
              flush=True)

    # materialize pieces once, then time the slot gather+reduce alone
    try:
        pre, pim = jax.jit(
            lambda s, x, y: _quadrant_pieces(
                fftshift2_pair(fft2_pair(fftshift2_pair(s), inverse=True)),
                y, x, g)
        )(sub_pair, cx, cy)
        jax.block_until_ready([pre, pim])
        d = pre.shape[1] * n * n
        slots = jax.device_put(plan.slots)
        s4 = pre.shape[0]

        def gather_reduce(a, b, sl):
            outs = []
            for v in (a, b):
                rows = jnp.concatenate(
                    [v.reshape(s4, d), jnp.zeros((1, d), v.dtype)])
                outs.append(rows[sl].sum(axis=1))
            return tuple(outs)

        fn = jax.jit(gather_reduce)
        t = time_kernel(fn, pre, pim, slots, harness=h1)
        report("G slot gather+reduce", t.seconds, t.seconds * 1e3, "ms")
        del pre, pim
    except Exception as exc:
        print(f"G gather: FAILED {type(exc).__name__}: {str(exc)[:200]}",
              flush=True)

    # windowed scatter reference (per-pol planes now)
    try:
        fn = jax.jit(lambda s, x, y: subgrids_to_grid(s, x, y, g, True))
        t = time_kernel(fn, sub_pair, cx, cy, harness=h1)
        report("S windowed scatter", t.seconds, t.seconds * 1e3, "ms")
    except Exception as exc:
        print(f"S scatter: FAILED {type(exc).__name__}: {str(exc)[:200]}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
