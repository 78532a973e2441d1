#!/usr/bin/env python
"""Round-3 probe 5: find an output-handling mode for the chunked degridder
timing fn that avoids both the queue OOM (full outputs) and the 2.2x
slowdown (slicing to [:1,:1,:1] — probe4 B). Variants on one 8192 chunk."""
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
    del sub
    _, _, mvis_full = workload_costs(params)
    mvis_c = mvis_full * CHUNK / params.nr_subgrids

    stg = jax.jit(
        lambda p, s: stage(p, s, with_vis=False), static_argnums=0
    )(params, sobs)
    jax.block_until_ready(jax.tree_util.tree_leaves(stg))
    stg_c = pin_rowmajor(slice_staged(stg, 0, CHUNK))
    sub_c = pin_rowmajor((sub_pair[0][:CHUNK], sub_pair[1][:CHUNK]))
    jax.block_until_ready(jax.tree_util.tree_leaves([stg_c, sub_c]))
    del stg, sub_pair, sobs
    print(f"staged+pinned in {time.time()-t0:.1f}s", flush=True)

    prec = ("3x2k", "default")

    def run_direct(p, st, su):
        return _degridder_polstack_batch_run(
            p, st, su, 2, prec, None, batch=8, cfold=True
        )

    tm = jax.tree_util.tree_map

    variants = [
        ("full (ref 25.3)", lambda p, st, su: run_direct(p, st, su)),
        ("slice s-only [:1]", lambda p, st, su: tm(
            lambda x: x[:1], run_direct(p, st, su))),
        ("slice [:1,:1,:1]", lambda p, st, su: tm(
            lambda x: x[:1, :1, :1], run_direct(p, st, su))),
        ("scalar sum", lambda p, st, su: tm(
            lambda x: x.sum(), run_direct(p, st, su))),
        ("barrier+slice", lambda p, st, su: tm(
            lambda x: x[:1, :1, :1],
            jax.lax.optimization_barrier(run_direct(p, st, su)))),
        ("row sum axis0", lambda p, st, su: tm(
            lambda x: x.sum(axis=0, keepdims=True), run_direct(p, st, su))),
    ]
    for name, f in variants:
        try:
            tj = time.time()
            fn = jax.jit(f, static_argnums=0)
            t = time_kernel(fn, params, stg_c, sub_c, harness=harness)
            print(f"{name:20s}: {t.seconds*1e3:8.3f} ms "
                  f"({t.seconds/CHUNK*1e6:6.3f} us/sg, "
                  f"{mvis_c/t.seconds:7.1f} MVis/s) "
                  f"[{time.time()-tj:.0f}s]", flush=True)
        except Exception as exc:
            print(f"{name:20s}: FAILED {type(exc).__name__}: {str(exc)[:160]}",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
