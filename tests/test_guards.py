"""API-boundary correctness guards and the nonzero-w path.

Covers the round-2 hardening items:
- non-uniform channel spacing: recurrence kernels (reference v8's silent
  assumption, gridder_v8.cu:135-186) must NOT silently return wrong results
  through the public API — they fall back to a non-recurrence rung;
- w-term Taylor rank: auto-escalation when the observation's |μ·n| bound
  exceeds the tolerance, fallback for the fixed-rank w-free rungs;
- nonzero-w generator (make_w_observation) end-to-end against the golden
  oracle, including w_step ≠ 0 / coord_z ≠ 0 (the reference's w machinery,
  init.cpp:182-199, gridder_reference.cpp:32-39);
- the direct pallas kernels carrying the w_off·n phase-offset term;
- degridder channel-recurrence resync for C > 16.
"""

import dataclasses
import warnings

import numpy as np
import pytest

from idg_tpu import IDGParams, make_observation, make_w_observation
from idg_tpu.models.reference import degridder_reference, gridder_reference
from idg_tpu.data import initialize_subgrids
from idg_tpu.ops.api import (
    _resolve,
    max_mu_n,
    required_w_rank,
    run_degridder,
    run_gridder,
)
from idg_tpu.ops.registry import get_kernel
from idg_tpu.types import Observation
from idg_tpu.utils.compare import check_error


def _with_nonuniform_channels(obs: Observation) -> Observation:
    k = np.array(obs.wavenumbers, copy=True)
    k[-1] *= 1.05  # break uniform spacing in the last channel
    return dataclasses.replace(obs, wavenumbers=k)


# --------------------------------------------------------------------------
# non-uniform channel spacing
# --------------------------------------------------------------------------

def test_recurrence_kernels_marked():
    for workload, version in [
        ("gridder", "xla_v3"), ("gridder", "pallas_v2"),
        ("gridder", "pallas_v5"), ("gridder", "pallas_v6"),
        ("gridder", "pallas_v7"),
        ("degridder", "xla_v3"), ("degridder", "pallas_v2"),
        ("degridder", "pallas_v5"), ("degridder", "pallas_v6"),
        ("degridder", "pallas_v7"), ("degridder", "pallas_v8"),
    ]:
        e = get_kernel(workload, version)
        assert e.uniform_channels, (workload, version)
        assert e.fallback is not None, (workload, version)
        assert not get_kernel(workload, e.fallback).uniform_channels


def test_nonuniform_channels_recurrence_is_wrong_raw(small_params, small_obs):
    """Documents the hazard the guard exists for: the raw recurrence kernel
    (bypassing the API) exceeds the gate on non-uniform wavenumbers."""
    from idg_tpu.ops.api import _jitted
    from idg_tpu.types import split_observation, combine_complex

    obs = _with_nonuniform_channels(small_obs)
    golden = gridder_reference(small_params, obs)
    fn = _jitted("gridder", "pallas_v5", False, None)
    re, im = fn(small_params, split_observation(obs))
    raw = combine_complex(np.asarray(re), np.asarray(im))
    assert not check_error(raw, golden, verbose=False).passed


@pytest.mark.parametrize("version", ["xla_v3", "pallas_v2", "pallas_v5", "pallas_v6"])
def test_gridder_nonuniform_channels_falls_back(version, small_params, small_obs):
    obs = _with_nonuniform_channels(small_obs)
    golden = gridder_reference(small_params, obs)
    with pytest.warns(UserWarning, match="uniform channel spacing"):
        got = run_gridder(small_params, obs, version=version)
    result = check_error(got, golden, verbose=False)
    assert result.passed, f"{version}: error {result.mean_error}"


@pytest.mark.parametrize("version", ["xla_v3", "pallas_v5", "pallas_v6", "pallas_v8"])
def test_degridder_nonuniform_channels_falls_back(version, small_params, small_obs):
    obs = _with_nonuniform_channels(small_obs)
    sub = initialize_subgrids(
        small_params.nr_subgrids, small_params.nr_correlations,
        small_params.subgrid_size,
    )
    golden = degridder_reference(small_params, obs, sub)
    with pytest.warns(UserWarning, match="uniform channel spacing"):
        got = run_degridder(small_params, obs, sub, version=version)
    result = check_error(got, golden, verbose=False)
    assert result.passed, f"{version}: error {result.mean_error}"


# --------------------------------------------------------------------------
# w-rank guard
# --------------------------------------------------------------------------

def _stress_w_obs(params, obs, w_value):
    """Constant large w with NO compensating w plane (coord_z = 0): μ = −w·k."""
    uvw = np.array(obs.uvw, copy=True)
    uvw[:, :, 2] = w_value
    return dataclasses.replace(obs, uvw=uvw)


def test_required_w_rank_zero_w(small_params, small_obs):
    assert max_mu_n(small_params, small_obs) == 0.0
    assert required_w_rank(small_params, small_obs) == 1


def test_w_rank_escalates(small_params, small_obs):
    # w=600 -> |mu·n| bound ~0.049: rank 2 insufficient, rank 4 suffices
    obs = _stress_w_obs(small_params, small_obs, 600.0)
    need = required_w_rank(small_params, obs)
    assert need is not None and need > 2
    version, w_rank = _resolve("gridder", "pallas_v4", small_params, obs)
    assert version == "pallas_v4" and w_rank == need


def test_w_rank_escalation_correct(small_params, small_obs):
    obs = _stress_w_obs(small_params, small_obs, 600.0)
    golden = gridder_reference(small_params, obs)
    # guard escalates the rank automatically -> inside the gate
    got = run_gridder(small_params, obs, version="pallas_v4")
    assert check_error(got, golden, verbose=False).passed
    # the un-guarded default rank (explicit override) warns and misses
    with pytest.warns(UserWarning, match="below the required rank"):
        got2 = run_gridder(small_params, obs, version="pallas_v4", w_rank=2)
    assert not check_error(got2, golden, verbose=False).passed


def test_w_free_rung_falls_back_on_nonzero_w(small_params, small_obs):
    obs = _stress_w_obs(small_params, small_obs, 600.0)
    golden = gridder_reference(small_params, obs)
    with pytest.warns(UserWarning, match="w-free"):
        got = run_gridder(small_params, obs, version="pallas_v7")
    assert check_error(got, golden, verbose=False).passed


def test_w_rank_override_on_fixed_rank_rung_warns_and_guards(
    small_params, small_obs
):
    """ADVICE r2 (medium): an explicit w_rank on a fixed-rank w-free rung
    (no w_rank parameter) must (a) warn that the override is ignored and
    (b) STILL apply the fixed_w_rank-vs-required fallback — previously this
    path skipped the guard and silently ran rank 1 on w != 0 data."""
    obs = _stress_w_obs(small_params, small_obs, 600.0)
    golden = gridder_reference(small_params, obs)
    with pytest.warns(UserWarning) as rec:
        got = run_gridder(small_params, obs, version="pallas_v7", w_rank=2)
    messages = [str(w.message) for w in rec]
    assert any("override is ignored" in m for m in messages), messages
    assert any("w-free" in m for m in messages), messages
    assert check_error(got, golden, verbose=False).passed


def test_w_rank_override_on_fixed_rank_rung_w0_data(small_params, small_obs):
    """Same override on w == 0 data: warn about the ignored override, no
    fallback needed (rank 1 is exact), result inside the gate."""
    golden = gridder_reference(small_params, small_obs)
    with pytest.warns(UserWarning, match="override is ignored"):
        got = run_gridder(small_params, small_obs, version="pallas_v7", w_rank=3)
    assert check_error(got, golden, verbose=False).passed


def test_w_rank_impractical_raises(small_params, small_obs):
    obs = _stress_w_obs(small_params, small_obs, 2.0e4)
    assert required_w_rank(small_params, obs) is None
    with pytest.raises(ValueError, match="direct full-phase"):
        run_gridder(small_params, obs, version="pallas_v4")


def test_direct_kernels_exact_for_extreme_w(small_params, small_obs):
    """Full-phase kernels have no Taylor: exact at any w (no guard engages)."""
    obs = _stress_w_obs(small_params, small_obs, 2.0e4)
    golden = gridder_reference(small_params, obs)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        got = run_gridder(small_params, obs, version="pallas_v1")
    assert check_error(got, golden, verbose=False).passed


# --------------------------------------------------------------------------
# nonzero-w generator end-to-end (w_step != 0, coord_z != 0)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def w_problem(small_params):
    params, obs, sub = make_w_observation(
        small_params, include_subgrids=True
    )
    return params, obs, sub


def test_make_w_observation_properties(w_problem, small_params, small_obs):
    params, obs, _ = w_problem
    assert params.w_step != 0.0
    assert np.any(np.asarray(obs.uvw)[:, :, 2] != 0.0)
    assert np.any(np.asarray(obs.metadata.coord_z) != 0)
    # the u/v draws and metadata coords stay draw-for-draw identical
    np.testing.assert_array_equal(
        np.asarray(obs.uvw)[..., :2], np.asarray(small_obs.uvw)[..., :2]
    )
    np.testing.assert_array_equal(
        np.asarray(obs.metadata.coord_x), np.asarray(small_obs.metadata.coord_x)
    )
    # the w-plane partition keeps the Taylor argument small
    assert required_w_rank(params, obs) <= 3


@pytest.mark.parametrize(
    "version",
    ["xla_reference", "xla_v2", "xla_v4",
     "pallas_v1", "pallas_v2", "pallas_v4", "pallas_v5", "pallas_v6"],
)
def test_gridder_nonzero_w(version, w_problem):
    params, obs, _ = w_problem
    golden = gridder_reference(params, obs)
    got = run_gridder(params, obs, version=version)
    result = check_error(got, golden, verbose=False)
    assert result.passed, f"{version}: error {result.mean_error}"


@pytest.mark.parametrize(
    "version",
    ["xla_reference", "xla_v2", "xla_v4",
     "pallas_v1", "pallas_v2", "pallas_v4",
     # v5 duplicates v6's guard path (same recurrence family, same rank
     # handling) at ~7 s of interpret trace — slow tier keeps it; the
     # fast tier keeps v6 (recurrence) and v7 (kmerge flagship)
     pytest.param("pallas_v5", marks=pytest.mark.slow),
     "pallas_v6", "pallas_v7"],
)
def test_degridder_nonzero_w(version, w_problem):
    params, obs, sub = w_problem
    golden = degridder_reference(params, obs, sub)
    got = run_degridder(params, obs, sub, version=version)
    result = check_error(got, golden, verbose=False)
    assert result.passed, f"{version}: error {result.mean_error}"


# --------------------------------------------------------------------------
# degridder channel-recurrence resync (C > 16)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def many_channel_problem():
    params = IDGParams(
        grid_size=128, subgrid_size=16, nr_stations=2, nr_timeslots=2,
        nr_timesteps_subgrid=8, nr_channels=48,
    )
    obs, sub = make_observation(params, include_subgrids=True)
    return params, obs, sub


@pytest.mark.slow
@pytest.mark.parametrize("version", ["pallas_v5", "pallas_v6", "pallas_v7"])
def test_degridder_recurrence_resync_many_channels(version, many_channel_problem):
    params, obs, sub = many_channel_problem
    golden = degridder_reference(params, obs, sub)
    got = run_degridder(params, obs, sub, version=version)
    result = check_error(got, golden, verbose=False)
    assert result.passed, f"{version}: error {result.mean_error}"


@pytest.mark.slow
@pytest.mark.parametrize("version", ["pallas_v5", "pallas_v6"])
def test_gridder_recurrence_resync_many_channels(version, many_channel_problem):
    params, obs, _ = many_channel_problem
    golden = gridder_reference(params, obs)
    got = run_gridder(params, obs, version=version)
    result = check_error(got, golden, verbose=False)
    assert result.passed, f"{version}: error {result.mean_error}"
