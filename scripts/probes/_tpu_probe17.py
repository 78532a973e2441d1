#!/usr/bin/env python
"""Round-4 probe 17: degridder scratch double-buffering (dbuf) A/B.

Without dbuf the 8-subgrid unrolled body serializes as
dot(b) -> stage2(b) [reads Phi scratches] -> Phigen(b+1) [writes the SAME
scratches], exposing ~1.1 us/subgrid of VPU work beside the ~1.9 us of MXU
passes. dbuf alternates two scratch slots by b%2 so consecutive chains are
independent and Mosaic can overlap them. Bit-identical (interpret test).
Also re-runs the round-3 hswap/sstore rows (queued behind the outage, never
measured) composed with dbuf.
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
        ("v7 base        ", degridder_pallas_v7_staged,
         dict(w_rank=2, dbuf=False)),
        ("v7 swpipe      ", degridder_pallas_v7_staged,
         dict(w_rank=2, swpipe=True)),
        ("v7 kmerge1     ", degridder_pallas_v7_staged,
         dict(w_rank=2, kmerge=1)),
        ("v7 kmerge3     ", degridder_pallas_v7_staged,
         dict(w_rank=2, kmerge=3)),
        ("v8 base        ", degridder_pallas_v8_staged, dict(dbuf=False)),
        ("v8 swpipe      ", degridder_pallas_v8_staged, dict(swpipe=True)),
        ("v8 kmerge1     ", degridder_pallas_v8_staged, dict(kmerge=1)),
        ("v8 kmerge3     ", degridder_pallas_v8_staged, dict(kmerge=3)),
    ]:
        try:
            tj = time.time()
            f = jax.jit(
                lambda p, st, su, _f=fn, _kw=kw: _f(p, st, su, **_kw),
                static_argnums=0,
            )
            t = time_kernel(f, params, stg_c, sub_c, harness=harness)
            print(f"degrid {name}: {t.seconds*1e3:8.3f} ms "
                  f"({mvis_c/t.seconds:7.1f} MVis/s, "
                  f"{t.seconds*1e6/CHUNK:5.2f} us/sub) "
                  f"[{time.time()-tj:.0f}s]", flush=True)
        except Exception as exc:
            print(f"degrid {name}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
