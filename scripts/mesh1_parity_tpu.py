#!/usr/bin/env python
"""Mesh-1 hardware parity: shard_map + Mosaic composition on the real TPU.

All multi-device validation runs on the virtual CPU mesh (tests/); this
probe closes the one untested composition — shard_map + staged Pallas
kernels + NamedSharding device_put on the real backend — by running the
mesh(1) staged path at the fullsize perf problem and asserting the 1e-5
normalized-RMS gate against the unsharded staged kernel on identical
inputs. No second chip is needed: mesh(1) exercises the same program
(shard_map tracing, partition specs, boundary layouts) with world size 1.

Usage (on the TPU host): python scripts/mesh1_parity_tpu.py
"""

from __future__ import annotations

import sys

import jax
import numpy as np


def main() -> int:
    from idg_tpu.config import IDGParams
    from idg_tpu.data import initialize_subgrids, make_perf_observation
    from idg_tpu.ops.pallas import STAGED
    from idg_tpu.parallel import make_mesh
    from idg_tpu.parallel.sharded import (
        shard_staged_inputs,
        sharded_degridder_staged,
        sharded_gridder_staged,
    )
    from idg_tpu.types import combine_complex, split_complex, split_observation
    from idg_tpu.utils.compare import check_error

    params = IDGParams.from_env()
    obs = make_perf_observation(params)
    sobs = split_observation(obs)
    mesh = make_mesh(1)
    print(f"devices: {jax.devices()}  S={params.nr_subgrids}")
    ok = True

    # gridder pallas_v6: unsharded staged vs mesh(1) staged
    stage_fn, run_fn = STAGED[("gridder", "pallas_v6")]
    stg = jax.jit(
        lambda p, s: stage_fn(p, s, with_vis=True), static_argnums=0
    )(params, sobs)
    exp = combine_complex(*map(np.asarray, run_fn(params, stg)))
    del stg
    stg_sh, _ = shard_staged_inputs(params, sobs, mesh, "gridder", "pallas_v6")
    got = combine_complex(*map(
        np.asarray, sharded_gridder_staged(params, mesh, "pallas_v6")(stg_sh)))
    del stg_sh
    r = check_error(got, exp, verbose=False)
    print(f"gridder pallas_v6 mesh1 vs unsharded: "
          f"{'PASSED' if r.passed else 'FAILED'} error={r.mean_error:.3g}")
    ok &= r.passed
    del exp, got

    # degridder pallas_v7 (raw c-major boundary path at fullsize)
    subgrids = initialize_subgrids(
        params.nr_subgrids, params.nr_correlations, params.subgrid_size)
    stage_fn, run_fn = STAGED[("degridder", "pallas_v7")]
    stg = jax.jit(
        lambda p, s: stage_fn(p, s, with_vis=False), static_argnums=0
    )(params, sobs)
    exp = combine_complex(*map(
        np.asarray, run_fn(params, stg, split_complex(subgrids))))
    del stg
    stg_sh, spair = shard_staged_inputs(
        params, sobs, mesh, "degridder", "pallas_v7", subgrids)
    got = combine_complex(*map(
        np.asarray,
        sharded_degridder_staged(params, mesh, "pallas_v7")(stg_sh, spair)))
    r = check_error(got, exp, verbose=False)
    print(f"degridder pallas_v7 mesh1 vs unsharded: "
          f"{'PASSED' if r.passed else 'FAILED'} error={r.mean_error:.3g}")
    ok &= r.passed
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
