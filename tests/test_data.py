"""Synthetic-observation initializers: formulas from app/common/init.cpp."""

import numpy as np
import pytest

from idg_tpu import IDGParams, make_observation, make_perf_observation
from idg_tpu.config import SPEED_OF_LIGHT
from idg_tpu.crand import CRand
from idg_tpu.data import (
    compute_l,
    compute_n,
    initialize_baselines,
    initialize_frequencies,
    initialize_spheroidal,
    initialize_subgrids,
    initialize_uvw,
    initialize_wavenumbers,
)


def test_shapes(small_params, small_obs):
    p = small_params
    S, T, C, N = p.nr_subgrids, p.nr_timesteps_subgrid, p.nr_channels, p.subgrid_size
    assert small_obs.uvw.shape == (S, T, 3)
    assert small_obs.wavenumbers.shape == (C,)
    assert small_obs.visibilities.shape == (S, T, C, 4)
    assert small_obs.spheroidal.shape == (N, N)
    assert small_obs.aterms.shape == (p.nr_timeslots, p.nr_stations, N, N, 4)
    assert small_obs.metadata.time_offset.shape == (S,)


def test_determinism(small_params):
    a, _ = make_observation(small_params)
    b, _ = make_observation(small_params)
    np.testing.assert_array_equal(a.uvw, b.uvw)
    np.testing.assert_array_equal(a.aterms, b.aterms)
    np.testing.assert_array_equal(a.metadata.coord_x, b.metadata.coord_x)


def test_frequencies_and_wavenumbers():
    f = initialize_frequencies(4)
    np.testing.assert_allclose(f, [150e6, 150.7e6, 151.4e6, 152.1e6], rtol=1e-6)
    k = initialize_wavenumbers(f)
    np.testing.assert_allclose(
        k, 2 * np.pi * f.astype(np.float64) / SPEED_OF_LIGHT, rtol=1e-6
    )


def test_uvw_tracks():
    """u = r_u cos(pi*angle), v = r_v sin(pi*angle), w = 0 (init.cpp:4-25)."""
    uvw = initialize_uvw(CRand(0), grid_size=64, nr_rows=3, nr_timesteps=8)
    assert uvw.shape == (3, 8, 3)
    assert (uvw[:, :, 2] == 0).all()
    r = np.sqrt((uvw[:, :, 0] / np.abs(uvw[:, 0:1, 0] / np.cos((0.5) / (360.0 / 8) * np.pi))) ** 2)
    # radii within [grid/2, grid]
    ru = np.abs(uvw[:, 0, 0] / np.cos((0.5) / (np.float32(360.0) / 8) * np.pi))
    assert ((ru >= 32) & (ru <= 64)).all()


def test_point_source_visibilities(small_obs):
    """All pols share one phase; magnitudes are 1.01..1.04 (init.cpp:48-79)."""
    v = small_obs.visibilities
    np.testing.assert_allclose(np.abs(v[..., 0]), 1.01, atol=1e-5)
    np.testing.assert_allclose(np.abs(v[..., 3]), 1.04, atol=1e-5)
    ratio = v[..., 1] / v[..., 0]
    np.testing.assert_allclose(ratio, 1.02 / 1.01, atol=1e-5)


def test_baselines():
    b = initialize_baselines(4, 6)
    assert b.tolist() == [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]]


def test_spheroidal():
    sph = initialize_spheroidal(4)
    t = np.abs(-1 + np.arange(4) * 2.0 / 4)
    np.testing.assert_allclose(sph, t[:, None] * t[None, :], rtol=1e-6)


def test_aterms_structure(small_obs):
    a = small_obs.aterms
    np.testing.assert_array_equal(a[..., 1], a[..., 2])  # xy == yx
    np.testing.assert_array_equal(a[..., 0], a[..., 3])  # xx == yy
    np.testing.assert_allclose(a[..., 0].imag, -0.1, atol=1e-6)
    np.testing.assert_allclose(a[..., 1].imag, 0.1, atol=1e-6)
    np.testing.assert_allclose(a[..., 0].real - a[..., 1].real, 0.3, atol=1e-5)


def test_metadata(small_params, small_obs):
    md = small_obs.metadata
    p = small_params
    T = p.nr_timesteps_subgrid
    np.testing.assert_array_equal(
        md.time_offset, np.arange(p.nr_subgrids, dtype=np.int32) * T
    )
    assert (md.nr_timesteps == T).all()
    assert (md.aterm_index == 0).all()
    assert (md.coord_x >= 0).all() and (md.coord_x < p.grid_size).all()
    assert (md.coord_y >= 0).all() and (md.coord_y < p.grid_size).all()
    assert (md.station1 < md.station2).all()
    assert (md.coord_z == 0).all()


def test_subgrids_ramp():
    s = initialize_subgrids(2, 4, 8)
    assert s.shape == (2, 4, 8, 8)
    np.testing.assert_allclose(s[0, 0, 0, 0], (1) / (100.0 * 64), rtol=1e-6)
    np.testing.assert_allclose(s[1, 2, 0, 0].imag, 0.2, rtol=1e-6)
    np.testing.assert_array_equal(s[0], s[1])


def test_compute_n_stable():
    l = np.float64(1e-4)
    n = compute_n(l, l)
    np.testing.assert_allclose(n, 1 - np.sqrt(1 - 2 * l * l), rtol=1e-10)
    assert compute_n(np.float64(2.0), np.float64(2.0)) == 1.0


def test_perf_observation(small_params):
    obs = make_perf_observation(small_params)
    p = small_params
    assert obs.visibilities.shape == (p.nr_subgrids, p.nr_timesteps_subgrid, p.nr_channels, 4)
    assert np.isfinite(obs.uvw).all()
    # perf-mode metadata uses the same draws as the reference perf driver
    assert (obs.metadata.coord_x < p.grid_size).all()


def test_initialize_uvw_offsets_matches_oracle_internals(small_params):
    from idg_tpu import make_observation
    from idg_tpu.data import initialize_uvw_offsets
    from idg_tpu.models.reference import _uvw_offsets

    obs, _ = make_observation(small_params)
    offsets = initialize_uvw_offsets(small_params, obs.metadata)
    u, v, w = _uvw_offsets(small_params, obs.metadata)
    np.testing.assert_allclose(offsets[:, 0], u.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(offsets[:, 1], v.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(offsets[:, 2], w.astype(np.float32), rtol=1e-6)


def test_initialize_lmn_shapes_and_stability(small_params):
    from idg_tpu.data import initialize_lmn

    lmn = initialize_lmn(small_params.subgrid_size, small_params.image_size)
    n = small_params.subgrid_size
    assert lmn.shape == (n, n, 3)
    assert np.all(lmn[:, :, 2] >= 0)
    # n = 1 - sqrt(1 - l² - m²) to f32 accuracy
    expected = 1.0 - np.sqrt(
        1.0 - lmn[:, :, 0].astype(np.float64) ** 2 - lmn[:, :, 1].astype(np.float64) ** 2
    )
    np.testing.assert_allclose(lmn[:, :, 2], expected, atol=1e-7)


def test_round_to_pow_of_2():
    from idg_tpu.config import round_to_pow_of_2

    assert round_to_pow_of_2(1) == 1
    assert round_to_pow_of_2(2) == 2
    assert round_to_pow_of_2(3) == 2
    assert round_to_pow_of_2(1023) == 512
    assert round_to_pow_of_2(1024) == 1024
