#!/usr/bin/env python
"""Round-3 probe 6: grid-add attribution at the default problem size.
Times (a) iFFT+piece construction (fused into a sum — pure compute),
(b) piece materialization, (c) the slot gather+reduce alone,
(d) the windowed scatter (per-pol planes). Aggressive memory hygiene."""
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
from idg_tpu.types import split_complex
from idg_tpu.utils.timing import time_kernel
from idg_tpu.ops.grid import (
    _quadrant_pieces, fft2_pair, fftshift2_pair, plan_grid_add,
    subgrids_to_grid,
)


def report(name, t):
    print(f"{name:28s}: {t.seconds*1e3:9.3f} ms (±{t.seconds_std*1e3:.2f})",
          flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    params = IDGParams.from_env()
    g, n = params.grid_size, params.subgrid_size
    obs = make_perf_observation(params)
    sub_np = initialize_subgrids(
        params.nr_subgrids, params.nr_correlations, n
    )
    sub = jax.device_put(split_complex(sub_np))
    del sub_np
    cx = jax.device_put(obs.metadata.coord_x)
    cy = jax.device_put(obs.metadata.coord_y)
    plan = plan_grid_add(obs.metadata.coord_x, obs.metadata.coord_y, g, n)
    print(f"plan: {plan.nby}x{plan.nbx} blocks, cap {plan.cap}, "
          f"inflation {plan.slot_inflation:.2f}", flush=True)
    h1 = HarnessConfig.from_env(nr_warm_up_runs=1, nr_iterations=1)

    def ifft(s):
        return fftshift2_pair(fft2_pair(fftshift2_pair(s), inverse=True))

    # (a) compute-only: pieces fused into a scalar sum (no [4S, D] output)
    try:
        fn = jax.jit(lambda s, x, y: tuple(
            v.sum() for v in _quadrant_pieces(ifft(s), y, x, g)))
        report("A pieces+fft (fused sum)",
               time_kernel(fn, sub, cx, cy, harness=h1))
    except Exception as exc:
        print(f"A FAILED {type(exc).__name__}: {str(exc)[:160]}", flush=True)

    # (b) pieces materialized (3.2 GB outputs; 1 iter per window)
    try:
        fn = jax.jit(lambda s, x, y: _quadrant_pieces(ifft(s), y, x, g))
        report("B pieces materialized",
               time_kernel(fn, sub, cx, cy, harness=h1))
    except Exception as exc:
        print(f"B FAILED {type(exc).__name__}: {str(exc)[:160]}", flush=True)

    # (c) slot gather+reduce from pre-built pieces
    try:
        pre, pim = jax.jit(
            lambda s, x, y: _quadrant_pieces(ifft(s), y, x, g))(sub, cx, cy)
        jax.block_until_ready([pre, pim])
        p = pre.shape[1]
        d = p * n * n
        s4 = pre.shape[0]
        slots = jax.device_put(plan.slots)

        def gather_reduce(a, b, sl):
            outs = []
            for v in (a, b):
                rows = jnp.concatenate(
                    [v.reshape(s4, d), jnp.zeros((1, d), v.dtype)])
                outs.append(rows[sl].sum(axis=1))
            return tuple(outs)

        report("C slot gather+reduce",
               time_kernel(jax.jit(gather_reduce), pre, pim, slots,
                           harness=h1))
        del pre, pim
    except Exception as exc:
        print(f"C FAILED {type(exc).__name__}: {str(exc)[:160]}", flush=True)

    # (d) windowed scatter (per-pol planes — the committed change)
    try:
        fn = jax.jit(lambda s, x, y: subgrids_to_grid(s, x, y, g, True))
        report("D windowed scatter",
               time_kernel(fn, sub, cx, cy, harness=h1))
    except Exception as exc:
        print(f"D FAILED {type(exc).__name__}: {str(exc)[:160]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
