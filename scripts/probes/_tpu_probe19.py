#!/usr/bin/env python
"""Round-4 probe 19: 16384^2 streamed-ranges grid-add component timing.

Forced-ranges measured 607 ms vs a ~85 ms HBM-roundtrip bound. Attribute:
prep (FFT+mask pieces), per-stripe kernel with pre-uploaded tables,
per-stripe table upload cost, band assembly.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp

from idg_tpu import IDGParams, make_perf_observation
from idg_tpu.data import initialize_subgrids
from idg_tpu.ops.grid import (
    MAX_RANGE_BLOCKS, _ranges_streamed_fns, plan_grid_add_ranges,
    sorted_block_coords,
)
from idg_tpu.types import split_complex


def timeit(fn, reps=3):
    from idg_tpu import HarnessConfig
    from idg_tpu.utils.timing import time_kernel

    h = HarnessConfig.from_env(nr_warm_up_runs=1, nr_iterations=reps)
    return time_kernel(fn, harness=h).seconds


def main():
    g = 16384
    params = IDGParams.from_env()
    obs = make_perf_observation(params)
    md = obs.metadata
    n = params.subgrid_size
    s = params.nr_subgrids
    p = params.nr_correlations
    order, cx_s, cy_s = sorted_block_coords(md.coord_x, md.coord_y, g, n)
    plan = plan_grid_add_ranges(cx_s, cy_s, g, n)
    print(f"plan: {plan.nby}x{plan.nbx} blocks, w={plan.w}, nbp={plan.nbp}")
    sub = split_complex(initialize_subgrids(s, p, n))
    sub = tuple(jax.device_put(np.asarray(v)[order]) for v in sub)
    cx = jax.device_put(jnp.asarray(cx_s))
    cy = jax.device_put(jnp.asarray(cy_s))

    prep, one_stripe = _ranges_streamed_fns(
        g, p, n, s, True, plan.w, plan.nr_subgrids, plan.nbx, False)
    t_prep = timeit(lambda: prep(sub, cx, cy))
    print(f"prep: {t_prep*1e3:.1f} ms", flush=True)
    pieces = prep(sub, cx, cy)
    jax.block_until_ready(pieces)

    nbx = plan.nbx
    nb = plan.nby * plan.nbx
    stripe = max(nbx, (MAX_RANGE_BLOCKS // nbx) * nbx)
    n_stripes = -(-nb // stripe)
    print(f"stripes: {n_stripes} x {stripe} blocks")

    # pre-upload tables
    tabs = []
    for lo in range(0, nb, stripe):
        hi = min(lo + stripe, nb)
        st = jax.device_put(jnp.asarray(np.ascontiguousarray(plan.starts[:, lo:hi])))
        ln = jax.device_put(jnp.asarray(np.ascontiguousarray(plan.lens[:, lo:hi])))
        tabs.append((st, ln, (hi - lo) // nbx))
    jax.block_until_ready([t[0] for t in tabs])

    st0, ln0, rows0 = tabs[0]
    t_one = timeit(lambda: one_stripe(pieces, st0, ln0, rows0))
    print(f"one stripe (pre-uploaded tables): {t_one*1e3:.2f} ms "
          f"-> x{n_stripes} = {t_one*n_stripes*1e3:.1f} ms", flush=True)

    def all_stripes_pre():
        outs = []
        for st, ln, rows in tabs:
            band = one_stripe(pieces, st, ln, rows)
            outs.append((band[0][:1, :1], band[1][:1, :1]))
        return outs
    t_all = timeit(all_stripes_pre)
    print(f"all stripes, tables pre-uploaded: {t_all*1e3:.1f} ms", flush=True)

    def all_stripes_upload():
        outs = []
        for lo in range(0, nb, stripe):
            hi = min(lo + stripe, nb)
            st = jnp.asarray(np.ascontiguousarray(plan.starts[:, lo:hi]))
            ln = jnp.asarray(np.ascontiguousarray(plan.lens[:, lo:hi]))
            band = one_stripe(pieces, st, ln, (hi - lo) // nbx)
            outs.append((band[0][:1, :1], band[1][:1, :1]))
        return outs
    t_up = timeit(all_stripes_upload)
    print(f"all stripes, tables uploaded per call: {t_up*1e3:.1f} ms",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
