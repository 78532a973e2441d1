#!/usr/bin/env python
"""Round-3 probe 7 (serialized TPU experiments):
1. gridder v6 fullsize: dbuf schedule A/B (VERDICT item 7 — VPU/MXU overlap)
2. degridder v7: precision A/B ("3x2k","default") vs ("default","default")
   — perf on an 8192 chunk AND accuracy vs the golden model at check size
3. grid-add: new DMA-pipelined Pallas slot reduction at default size
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
    _degridder_polstack_batch_run, degridder_pallas_v7,
)
from idg_tpu.ops.pallas.gridder import _gridder_sep_recur_batch_run
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
    t0 = time.time()
    print(f"devices: {jax.devices()}", flush=True)
    params = IDGParams.from_env()
    harness = HarnessConfig.from_env(nr_warm_up_runs=1, nr_iterations=3)
    obs = make_perf_observation(params)
    sobs = jax.device_put(split_observation(obs))
    gflops, _, mvis_full = workload_costs(params)
    mvis_c = mvis_full * CHUNK / params.nr_subgrids

    # ---------- 1. gridder dbuf A/B ----------
    stg = jax.jit(
        lambda p, s: stage(p, s, with_vis=True), static_argnums=0
    )(params, sobs)
    jax.block_until_ready(jax.tree_util.tree_leaves(stg))
    print(f"gridder staged in {time.time()-t0:.1f}s", flush=True)
    from idg_tpu.ops.pallas.gridder import gridder_precisions

    for name, dbuf in [("gridder v6 b4", False), ("gridder v6 b4 dbuf", True)]:
        try:
            tj = time.time()
            fn = jax.jit(
                lambda p, st, _d=dbuf: _gridder_sep_recur_batch_run(
                    p, st, 2, gridder_precisions(2), None, 4, _d),
                static_argnums=0,
            )
            t = time_kernel(fn, params, stg, harness=harness)
            print(f"{name:24s}: {t.seconds*1e3:8.3f} ms "
                  f"({mvis_full/t.seconds:7.1f} MVis/s, "
                  f"{gflops/t.seconds/197000*100:.1f}% roofline) "
                  f"[{time.time()-tj:.0f}s]", flush=True)
        except Exception as exc:
            print(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:160]}",
                  flush=True)
    del stg

    # ---------- 2. degridder precision A/B ----------
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

    for name, prec in [("degrid 3x2k,default", ("3x2k", "default")),
                       ("degrid default,default", ("default", "default")),
                       ("degrid 3x2k,3x2k", ("3x2k", "3x2k"))]:
        try:
            tj = time.time()
            fn = jax.jit(
                lambda p, st, su, _pr=prec: _degridder_polstack_batch_run(
                    p, st, su, 2, _pr, None, batch=8, cfold=True),
                static_argnums=0,
            )
            t = time_kernel(fn, params, stg_c, sub_c, harness=harness)
            print(f"{name:24s}: {t.seconds*1e3:8.3f} ms "
                  f"({mvis_c/t.seconds:7.1f} MVis/s) "
                  f"[{time.time()-tj:.0f}s]", flush=True)
        except Exception as exc:
            print(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:160]}",
                  flush=True)
    del stg_c, sub_c

    # accuracy at check size for each precision mode
    cparams = IDGParams.correctness_defaults()
    cobs, csub = make_observation(cparams, include_subgrids=True)
    ref = degridder_reference(cparams, cobs, csub)
    csobs = split_observation(cobs)
    for pname, prec in [("3x2k,default", ("3x2k", "default")),
                        ("default,default", ("default", "default"))]:
        try:
            cstg = jax.jit(
                lambda p, s: stage(p, s, with_vis=False), static_argnums=0
            )(cparams, jax.device_put(csobs))
            re, im = _degridder_polstack_batch_run(
                cparams, cstg, jax.device_put(split_complex(csub)),
                2, prec, None, batch=8, cfold=True)
            got = np.asarray(re) + 1j * np.asarray(im)
            res = check_error(got.ravel(), ref.ravel(), verbose=False)
            print(f"accuracy {pname:18s}: err {res.mean_error:.3e} "
                  f"({'PASS' if res.passed else 'FAIL'})", flush=True)
        except Exception as exc:
            print(f"accuracy {pname}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:160]}", flush=True)

    # ---------- 3. grid-add DMA kernel ----------
    from idg_tpu.ops.grid import plan_grid_add, subgrids_to_grid_pallas

    g, n = params.grid_size, params.subgrid_size
    sub2 = initialize_subgrids(params.nr_subgrids, params.nr_correlations, n)
    spair = jax.device_put(split_complex(sub2))
    del sub2
    cx = jax.device_put(obs.metadata.coord_x)
    cy = jax.device_put(obs.metadata.coord_y)
    plan = plan_grid_add(obs.metadata.coord_x, obs.metadata.coord_y, g, n)
    print(f"plan: cap {plan.cap}, inflation {plan.slot_inflation:.2f}",
          flush=True)
    h1 = HarnessConfig.from_env(nr_warm_up_runs=1, nr_iterations=1)
    try:
        tj = time.time()
        fn = jax.jit(lambda s, x, y: subgrids_to_grid_pallas(
            s, x, y, g, True, plan=plan))
        t = time_kernel(fn, spair, cx, cy, harness=h1)
        print(f"{'grid_add pallas DMA':24s}: {t.seconds*1e3:8.3f} ms "
              f"(±{t.seconds_std*1e3:.2f}) [{time.time()-tj:.0f}s]",
              flush=True)
    except Exception as exc:
        print(f"grid_add DMA: FAILED {type(exc).__name__}: {str(exc)[:300]}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
