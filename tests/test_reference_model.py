"""Golden oracle validation.

The oracle is validated three independent ways:
1. against a literal scalar-loop transcription of the reference CPU kernels
   (app/CPU/kernels/{gridder,degridder}_reference.cpp) on a tiny problem,
2. adjointness <G v, s> == <v, D s> (the gridder and degridder are exact
   adjoints, including Jones and taper),
3. structural properties (taper zeros, Jones identity behavior).
"""

import numpy as np
import pytest

from idg_tpu import IDGParams, make_observation
from idg_tpu.data import compute_l, compute_m, compute_n, initialize_subgrids
from idg_tpu.models import degridder_reference, gridder_reference


def _loop_gridder(params, obs):
    """Direct per-element transcription of gridder_reference.cpp:6-114."""
    md = obs.metadata
    N, T, C = params.subgrid_size, params.nr_timesteps_subgrid, params.nr_channels
    S = md.nr_subgrids
    uvw = np.asarray(obs.uvw, np.float64).reshape(-1, 3)
    vis = np.asarray(obs.visibilities, np.complex128).reshape(-1, C, 4)
    k = np.asarray(obs.wavenumbers, np.float64)
    sph = np.asarray(obs.spheroidal, np.float64)
    out = np.zeros((S, 4, N, N), np.complex128)
    for s in range(S):
        off = int(md.time_offset[s])
        u_off = (int(md.coord_x[s]) + N // 2 - params.grid_size // 2) * (
            2 * np.pi / params.image_size
        )
        v_off = (int(md.coord_y[s]) + N // 2 - params.grid_size // 2) * (
            2 * np.pi / params.image_size
        )
        w_off = 2 * np.pi * params.w_step * (int(md.coord_z[s]) + 0.5)
        for y in range(N):
            for x in range(N):
                l = compute_l(x, N, params.image_size)
                m = compute_m(y, N, params.image_size)
                n = compute_n(l, m)
                pix = np.zeros(4, np.complex128)
                for t in range(T):
                    u, v, w = uvw[off + t]
                    phase_index = u * l + v * m + w * n
                    phase_offset = u_off * l + v_off * m + w_off * n
                    for c in range(C):
                        phase = phase_offset - phase_index * k[c]
                        phasor = np.cos(phase) + 1j * np.sin(phase)
                        pix += vis[off + t, c] * phasor
                a1 = (
                    obs.aterms[int(md.aterm_index[s]), int(md.station1[s]), y, x]
                    .astype(np.complex128)
                    .reshape(2, 2)
                )
                a2 = (
                    obs.aterms[int(md.aterm_index[s]), int(md.station2[s]), y, x]
                    .astype(np.complex128)
                    .reshape(2, 2)
                )
                pix = (a1.conj().T @ pix.reshape(2, 2) @ a2).reshape(4)
                out[s, :, y, x] = pix * sph[y, x]
    return out.astype(np.complex64)


def _loop_degridder(params, obs, subgrids):
    """Direct transcription of degridder_reference.cpp:6-129."""
    md = obs.metadata
    N, T, C = params.subgrid_size, params.nr_timesteps_subgrid, params.nr_channels
    S = md.nr_subgrids
    uvw = np.asarray(obs.uvw, np.float64).reshape(-1, 3)
    k = np.asarray(obs.wavenumbers, np.float64)
    sph = np.asarray(obs.spheroidal, np.float64)
    out = np.zeros((S, T, C, 4), np.complex128)
    for s in range(S):
        off = int(md.time_offset[s])
        pixels = np.zeros((N, N, 4), np.complex128)
        for y in range(N):
            for x in range(N):
                a1 = (
                    obs.aterms[int(md.aterm_index[s]), int(md.station1[s]), y, x]
                    .astype(np.complex128)
                    .reshape(2, 2)
                )
                a2 = (
                    obs.aterms[int(md.aterm_index[s]), int(md.station2[s]), y, x]
                    .astype(np.complex128)
                    .reshape(2, 2)
                )
                p = sph[y, x] * subgrids[s, :, y, x].astype(np.complex128)
                pixels[y, x] = (a1 @ p.reshape(2, 2) @ a2.conj().T).reshape(4)
        u_off = (int(md.coord_x[s]) + N // 2 - params.grid_size // 2) * (
            2 * np.pi / params.image_size
        )
        v_off = (int(md.coord_y[s]) + N // 2 - params.grid_size // 2) * (
            2 * np.pi / params.image_size
        )
        w_off = 2 * np.pi * params.w_step * (int(md.coord_z[s]) + 0.5)
        for t in range(T):
            u, v, w = uvw[off + t]
            for c in range(C):
                acc = np.zeros(4, np.complex128)
                for y in range(N):
                    for x in range(N):
                        l = compute_l(x, N, params.image_size)
                        m = compute_m(y, N, params.image_size)
                        n = compute_n(l, m)
                        phase = (u * l + v * m + w * n) * k[c] - (
                            u_off * l + v_off * m + w_off * n
                        )
                        acc += pixels[y, x] * (np.cos(phase) + 1j * np.sin(phase))
                out[s, t, c] = acc
    return out.astype(np.complex64)


@pytest.fixture(scope="module")
def tiny():
    params = IDGParams(
        grid_size=64,
        subgrid_size=8,
        nr_stations=2,
        nr_timeslots=2,
        nr_timesteps_subgrid=4,
        nr_channels=3,
    )
    obs, _ = make_observation(params)
    return params, obs


def test_gridder_matches_loop_transcription(tiny):
    params, obs = tiny
    fast = gridder_reference(params, obs)
    slow = _loop_gridder(params, obs)
    np.testing.assert_allclose(fast, slow, atol=1e-4, rtol=1e-5)


def test_degridder_matches_loop_transcription(tiny):
    params, obs = tiny
    subgrids = initialize_subgrids(params.nr_subgrids, 4, params.subgrid_size)
    fast = degridder_reference(params, obs, subgrids)
    slow = _loop_degridder(params, obs, subgrids)
    np.testing.assert_allclose(fast, slow, atol=1e-4, rtol=1e-5)


def test_adjointness(small_params, small_obs, rng):
    """<G v, s> == <v, Gᴴ s> with Jones + taper included."""
    p = small_params
    sub = gridder_reference(p, small_obs)
    s_rand = (
        rng.standard_normal((p.nr_subgrids, 4, p.subgrid_size, p.subgrid_size))
        + 1j * rng.standard_normal((p.nr_subgrids, 4, p.subgrid_size, p.subgrid_size))
    ).astype(np.complex64)
    vis_out = degridder_reference(p, small_obs, s_rand)
    v = np.asarray(small_obs.visibilities)
    lhs = np.vdot(s_rand.astype(np.complex128), sub.astype(np.complex128))
    rhs = np.vdot(vis_out.astype(np.complex128), v.astype(np.complex128))
    assert abs(lhs - rhs) / abs(lhs) < 1e-6


def test_taper_zeros(small_params, small_obs):
    """Spheroidal |x||y| taper is 0 at the x=N/2 column -> whole column 0."""
    sub = gridder_reference(small_params, small_obs)
    N = small_params.subgrid_size
    assert np.all(sub[:, :, :, N // 2] == 0)
    assert np.all(sub[:, :, N // 2, :] == 0)


def test_gridder_scales_linearly(small_params, small_obs):
    """The operator is linear in the visibilities."""
    import dataclasses

    sub1 = gridder_reference(small_params, small_obs)
    obs2 = dataclasses.replace(small_obs, visibilities=small_obs.visibilities * 2.0)
    sub2 = gridder_reference(small_params, obs2)
    np.testing.assert_allclose(sub2, 2 * sub1, rtol=1e-5, atol=1e-6)
