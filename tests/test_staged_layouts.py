"""The perf harness binds a per-kernel visibility orientation into stage()
(ops/pallas/__init__.STAGED): t-major for the v3/v4 rungs, c-major for the
recurrence rungs. A layout-bound staging must feed each kernel exactly the
arrays the full ("both") staging would — this is what keeps the halved
staged-HBM fast path honest."""

import numpy as np
import pytest

from idg_tpu.data import initialize_subgrids
from idg_tpu.ops.pallas import STAGED
from idg_tpu.ops.pallas.common import stage
from idg_tpu.types import split_complex, split_observation

# one t-major and one c-major rung per workload keeps interpret-mode cost low
CASES = [
    ("gridder", "pallas_v4"),
    ("gridder", "pallas_v6"),
    ("degridder", "pallas_v4"),
    ("degridder", "pallas_v7"),
]


@pytest.mark.slow
@pytest.mark.parametrize("workload,version", CASES)
def test_bound_layout_matches_full_staging(workload, version, small_params,
                                           small_obs):
    stage_bound, run_fn = STAGED[(workload, version)]
    sobs = split_observation(small_obs)
    with_vis = workload == "gridder"
    stg_full = stage(small_params, sobs, with_vis=with_vis)
    stg_bound = stage_bound(small_params, sobs, with_vis=with_vis)
    if workload == "gridder":
        args = ()
    else:
        sub = initialize_subgrids(
            small_params.nr_subgrids,
            small_params.nr_correlations,
            small_params.subgrid_size,
        )
        args = (split_complex(sub),)
    base = run_fn(small_params, stg_full, *args, interpret=True)
    got = run_fn(small_params, stg_bound, *args, interpret=True)
    np.testing.assert_array_equal(np.asarray(base[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(base[1]), np.asarray(got[1]))


def test_bound_layout_skips_unused_orientation(small_params, small_obs):
    sobs = split_observation(small_obs)
    t = stage(small_params, sobs, vis_layout="tmajor")
    c = stage(small_params, sobs, vis_layout="cmajor")
    assert t.mu_row_cm is None and t.vis_re_pv_cm is None
    assert t.up_row is not None and t.vis_re_pv is not None
    assert c.up_row is None and c.vis_re_pv is None
    assert c.mu_row_cm is not None and c.vis_re_pv_cm is not None
    with pytest.raises(ValueError):
        stage(small_params, sobs, vis_layout="diagonal")
