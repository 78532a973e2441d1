#!/usr/bin/env python
"""Round-5: rows-form benchmark IO A/B for the PLAIN staged kernels.

The [S, P, N, N] subgrid form's 32-lane trailing dim is physically
lane-padded 4x under T(8,128): the gridder WRITES 4x the subgrid bytes
and the degridder READS 4x. A/B on the fullsize perf problem:

  gridder  A: staged_runner (4-D out, AOT-matched)     [~60.5 ms]
           B: v6_staged rows_out=True ([S, N, N*P] out)
  degrid   A: staged_runner (4-D chunks)               [~49.6 ms]
           B: same chunks, sub pair pre-transposed to [MC, N, N*P]

Usage (TPU host): PYTHONPATH=/root/.axon_site:/root/repo python
scripts/probes/_tpu_r5_rowsio.py"""

from __future__ import annotations

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from idg_tpu.config import HarnessConfig, IDGParams
from idg_tpu.data import initialize_subgrids, make_perf_observation
from idg_tpu.ops.api import _pin_rowmajor, _rowmajor_formats, staged_runner
from idg_tpu.utils.timing import time_kernel


def main() -> int:
    params = IDGParams.from_env()
    harness = HarnessConfig.from_env()
    obs = make_perf_observation(params)
    print(f"devices: {jax.devices()}  S={params.nr_subgrids}")

    # --- gridder ---
    fn, args = staged_runner("gridder", "pallas_v6", params, obs)
    t = time_kernel(fn, *args, harness=harness)
    print(f"gridder A 4-D out   {t.seconds*1e3:8.2f} ms (±{t.seconds_std*1e3:.2f})")
    ga = jax.tree_util.tree_map(np.asarray, fn(*args))

    from idg_tpu.ops.pallas.gridder import gridder_pallas_v6_staged

    stg = args[1]
    run_fn = partial(gridder_pallas_v6_staged, w_rank=2, rows_out=True)
    fmt = _rowmajor_formats(jax.ShapeDtypeStruct((1, 1, 1), np.float32))
    run_jit = jax.jit(run_fn, static_argnums=0, out_shardings=(fmt, fmt))
    compiled = run_jit.lower(params, stg).compile()
    stg2 = jax.device_put(stg, compiled.input_formats[0][0])
    jax.block_until_ready(jax.tree_util.tree_leaves(stg2))
    t = time_kernel(lambda p, st: compiled(st), params, stg2, harness=harness)
    print(f"gridder B rows out  {t.seconds*1e3:8.2f} ms (±{t.seconds_std*1e3:.2f})")
    gb = jax.tree_util.tree_map(np.asarray, compiled(stg2))
    s, pp, n, _ = ga[0].shape
    for i in (0, 1):
        exp = np.transpose(ga[i], (0, 2, 1, 3)).reshape(s, n, pp * n)
        ok = np.array_equal(exp, np.asarray(gb[i])[:s])
        print(f"  comp {i} rows bit-identical: {ok}")

    # --- degridder ---
    subgrids = initialize_subgrids(
        params.nr_subgrids, params.nr_correlations, params.subgrid_size
    )
    dfn, dargs = staged_runner("degridder", "pallas_v7", params, obs,
                               subgrids)
    t = time_kernel(dfn, *dargs, harness=harness)
    print(f"degrid  A 4-D in    {t.seconds*1e3:8.2f} ms (±{t.seconds_std*1e3:.2f})")
    da = jax.tree_util.tree_map(np.asarray, dfn(*dargs))

    # rows-form chunks: pre-transpose each chunk's sub pair outside the
    # timed window; kernel auto-detects rows_in from the operand rank
    _, chunks = dargs
    rchunks = []
    for stg_c, sub_c in chunks:
        rsub = tuple(
            jnp.transpose(v, (0, 2, 1, 3)).reshape(
                v.shape[0], n, pp * n) for v in sub_c
        )
        rchunks.append((stg_c, _pin_rowmajor(rsub)))
    jax.block_until_ready(jax.tree_util.tree_leaves(rchunks))

    from idg_tpu.ops.pallas.degridder import degridder_pallas_v7_staged

    drun = partial(degridder_pallas_v7_staged, w_rank=2)

    def _slim(p, stg_c, sub_c):
        out = drun(p, stg_c, sub_c)
        return jax.tree_util.tree_map(lambda x: x[:1], out)

    run_slim = jax.jit(_slim, static_argnums=0)

    def dfn_b(p, chunk_list):
        out = None
        for stg_c, sub_c in chunk_list:
            out = run_slim(p, stg_c, sub_c)
        return out

    t = time_kernel(dfn_b, params, rchunks, harness=harness)
    print(f"degrid  B rows in   {t.seconds*1e3:8.2f} ms (±{t.seconds_std*1e3:.2f})")
    db = jax.tree_util.tree_map(np.asarray, dfn_b(params, rchunks))
    for i in (0, 1):
        ok = np.array_equal(np.asarray(da[i]), np.asarray(db[i]))
        print(f"  comp {i} vis bit-identical: {ok}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
