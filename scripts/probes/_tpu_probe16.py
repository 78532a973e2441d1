#!/usr/bin/env python
"""Round-3 probe 16: degridder VPU-diet schedule A/B on hardware.

hswap = qsplit's lhs-half-swap dot (drops the [4N,2V] rhb concat) with
the STANDARD full-array RHS assembly — isolates the winning half of the
qsplit experiment from its losing half (quadrant bf16 sub-tile packing).
sstore = channel loop stores the phasor straight into the [2N,2V] rhs
quadrants (no f32 concat, no separate Phi_x planes).
Both bit-identical to the default schedule (interpret test).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_idg")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from idg_tpu.config import setup_compilation_cache

setup_compilation_cache()

import jax

from idg_tpu import HarnessConfig, IDGParams, make_perf_observation
from idg_tpu.data import initialize_subgrids
from idg_tpu.ops.pallas.common import stage, slice_staged
from idg_tpu.ops.pallas.degridder import (
    degridder_pallas_v7_staged, degridder_pallas_v8_staged,
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

    for name, fn, kw in [
        ("v7 base       ", degridder_pallas_v7_staged, dict(w_rank=2)),
        ("v7 hswap      ", degridder_pallas_v7_staged,
         dict(w_rank=2, hswap=True)),
        ("v7 sstore     ", degridder_pallas_v7_staged,
         dict(w_rank=2, sstore=True)),
        ("v7 hswap+sst  ", degridder_pallas_v7_staged,
         dict(w_rank=2, hswap=True, sstore=True)),
        ("v8 base       ", degridder_pallas_v8_staged, dict()),
        ("v8 hswap      ", degridder_pallas_v8_staged, dict(hswap=True)),
        ("v8 sstore     ", degridder_pallas_v8_staged, dict(sstore=True)),
        ("v8 hswap+sst  ", degridder_pallas_v8_staged,
         dict(hswap=True, sstore=True)),
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
    return 0


if __name__ == "__main__":
    sys.exit(main())
