"""XLA-family kernels vs the golden oracle, at the reference's 1e-5 gate."""

import numpy as np
import pytest

from idg_tpu import IDGParams, make_observation
from idg_tpu.data import initialize_subgrids
from idg_tpu.models import degridder_reference, gridder_reference
from idg_tpu.ops.api import run_degridder, run_gridder
from idg_tpu.ops.registry import get_kernel, list_kernels
from idg_tpu.utils import compare_subgrids, compare_visibilities

GRIDDER_VERSIONS = ["xla_reference", "xla_v1", "xla_v2", "xla_v3", "xla_v4"]
DEGRIDDER_VERSIONS = ["xla_reference", "xla_v1", "xla_v2", "xla_v3", "xla_v4"]


@pytest.fixture(scope="module")
def golden(small_params, small_obs):
    return gridder_reference(small_params, small_obs)


@pytest.mark.parametrize("version", GRIDDER_VERSIONS)
def test_gridder_matches_golden(small_params, small_obs, golden, version):
    out = run_gridder(small_params, small_obs, version)
    res = compare_subgrids(golden, out, verbose=False)
    assert res.passed, f"{version}: error {res.mean_error}"


@pytest.mark.parametrize("version", DEGRIDDER_VERSIONS)
def test_degridder_matches_golden(small_params, small_obs, version):
    subgrids = initialize_subgrids(
        small_params.nr_subgrids, 4, small_params.subgrid_size
    )
    ref = degridder_reference(small_params, small_obs, subgrids)
    out = run_degridder(small_params, small_obs, subgrids, version)
    res = compare_visibilities(ref, out, verbose=False)
    assert res.passed, f"{version}: error {res.mean_error}"


def test_reference_correctness_config_gridder(ref_params):
    """The reference's actual `-c` problem (2 subgrids, 32², 128 t, 16 ch)."""
    obs, _ = make_observation(ref_params)
    golden = gridder_reference(ref_params, obs)
    out = run_gridder(ref_params, obs, "xla_v2")
    res = compare_subgrids(golden, out, verbose=False)
    assert res.passed, res.mean_error


def test_reference_correctness_config_degridder(ref_params):
    obs, _ = make_observation(ref_params)
    subgrids = initialize_subgrids(ref_params.nr_subgrids, 4, ref_params.subgrid_size)
    ref = degridder_reference(ref_params, obs, subgrids)
    out = run_degridder(ref_params, obs, subgrids, "xla_v2")
    res = compare_visibilities(ref, out, verbose=False)
    assert res.passed, res.mean_error


def test_registry_listing():
    kernels = list_kernels("gridder")
    versions = [k.version for k in kernels]
    for v in GRIDDER_VERSIONS:
        assert v in versions
    assert all(k.description for k in kernels)


def test_registry_unknown_version():
    with pytest.raises(KeyError, match="available"):
        get_kernel("gridder", "nope")


def test_gridder_degridder_roundtrip(small_params, small_obs):
    """BASELINE.json config 2: gridder→degridder roundtrip sanity — the
    roundtrip operator G∘Gᴴ is positive: <v', v> real-part positive."""
    sub = run_gridder(small_params, small_obs, "xla_v2")
    vis_pred = run_degridder(small_params, small_obs, sub, "xla_v2")
    v = np.asarray(small_obs.visibilities)
    inner = np.vdot(v, vis_pred)
    assert inner.real > 0
