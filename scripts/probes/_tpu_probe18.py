#!/usr/bin/env python
"""Round-4 probe 18: degridder step attribution via ablations (hardware).

ablate rows give the step cost with one stage stubbed out (wrong results,
timing only): no_dot (MXU passes removed), no_stage2 (Phi_y* VPU contraction
removed), no_recur (recurrence complex-muls removed, stores kept). The
deltas attribute the 3.09 (v7) / 2.29 (v8) us/subgrid steps.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

from idg_tpu.config import setup_compilation_cache

setup_compilation_cache()

import jax

from idg_tpu import HarnessConfig, IDGParams, make_perf_observation
from idg_tpu.data import initialize_subgrids
from idg_tpu.ops.pallas.common import stage, slice_staged
from idg_tpu.ops.pallas.degridder import (
    _degridder_polstack_batch_run, degridder_precisions,
)
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
    print(f"devices: {jax.devices()}", flush=True)
    params = IDGParams.from_env()
    harness = HarnessConfig.from_env(nr_warm_up_runs=1, nr_iterations=3)
    obs = make_perf_observation(params)
    sobs = jax.device_put(split_observation(obs))
    _, _, mvis_full = workload_costs(params)
    mvis_c = mvis_full * CHUNK / params.nr_subgrids

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

    rows = []
    for wr, prec, cfold, tag in [
        (2, degridder_precisions(2), True, "v7"),
        (1, ("3x2k",), False, "v8"),
    ]:
        for ablate in ["", "no_dot", "no_stage2", "no_recur"]:
            rows.append((f"{tag} {ablate or 'base':9s}", wr, prec, cfold,
                         ablate))
    for name, wr, prec, cfold, ablate in rows:
        try:
            tj = time.time()
            f = jax.jit(
                lambda p, st, su, _wr=wr, _pr=prec, _cf=cfold, _ab=ablate:
                _degridder_polstack_batch_run(
                    p, st, su, _wr, _pr, None, 8, _ab, _cf),
                static_argnums=0,
            )
            t = time_kernel(f, params, stg_c, sub_c, harness=harness)
            print(f"degrid {name}: {t.seconds*1e3:8.3f} ms "
                  f"({t.seconds*1e6/CHUNK:5.2f} us/sub) "
                  f"[{time.time()-tj:.0f}s]", flush=True)
        except Exception as exc:
            print(f"degrid {name}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
