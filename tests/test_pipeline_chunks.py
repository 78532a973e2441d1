"""Chunked degrid-pipeline composition: sliced extraction plans feeding
per-chunk degridder consumers (ops.api.staged_degridder_chunk_consumers +
ops.grid.slice_extract_plan — the CLI `pipeline --direction degrid` path
at S > MAX_CHUNK).

Also the alignment regression: every consumer chunk's staged slice and
subgrid input must share the same start row. The pre-round-3 consumer
paired i·MAX_CHUNK-aligned staged slices with a CLAMPED dynamic_slice of
the subgrid input, which shifted the whole tail chunk by S_pad − S rows
whenever MAX_CHUNK ∤ S."""

import numpy as np
import pytest

import idg_tpu.ops.pallas.degridder as deg_mod
from idg_tpu.data import initialize_subgrids
from idg_tpu.ops.api import (
    staged_degridder_chunk_consumers,
    staged_degridder_consumer,
)
from idg_tpu.ops.grid import (
    grid_to_subgrids_ranges,
    plan_grid_extract_ranges,
    slice_extract_plan,
    sort_observation_blocks,
)
from idg_tpu.ops.pallas.common import stage
from idg_tpu.ops.pallas.degridder import degridder_pallas_v4_staged
from idg_tpu.types import split_complex, split_observation


@pytest.fixture()
def small_chunks(small_params, small_obs, monkeypatch):
    """small_obs staged fully + MAX_CHUNK forced below S so the chunked
    paths engage (S=6 → chunks of 4)."""
    monkeypatch.setattr(deg_mod, "MAX_CHUNK", 4)
    s = small_params.nr_subgrids
    assert s > 4 and s % 4, "fixture needs a non-divisible subgrid count"
    return s


def _full_degrid(params, obs, spair):
    stg = stage(params, split_observation(obs))
    return degridder_pallas_v4_staged(params, stg, spair, w_rank=2,
                                      interpret=True)


def test_consumer_tail_chunk_alignment(small_params, small_obs,
                                       small_chunks):
    s = small_chunks
    sub = initialize_subgrids(s, small_params.nr_correlations,
                              small_params.subgrid_size)
    spair = split_complex(sub)
    expected = _full_degrid(small_params, small_obs, spair)
    fn, _ = staged_degridder_consumer(small_params, small_obs, "pallas_v4",
                                      w_rank=2)
    got = fn(spair)  # slimmed [:1] of the LAST chunk → row s − MAX_CHUNK
    np.testing.assert_allclose(
        np.asarray(got[0])[0], np.asarray(expected[0])[s - 4],
        rtol=0, atol=0,
    )


def test_chunk_consumers_cover_all_rows(small_params, small_obs,
                                        small_chunks):
    s = small_chunks
    sub = initialize_subgrids(s, small_params.nr_correlations,
                              small_params.subgrid_size)
    spair = split_complex(sub)
    expected = _full_degrid(small_params, small_obs, spair)
    consumers, bounds, _ = staged_degridder_chunk_consumers(
        small_params, small_obs, "pallas_v4", w_rank=2, align=2
    )
    covered = set()
    for (lo, hi), kc in zip(bounds, consumers):
        assert hi - lo == 4 and lo % 2 == 0
        covered.update(range(lo, min(hi, s)))
        # pad rows past s with edge rows, like the sliced extraction does
        idx = np.minimum(np.arange(lo, hi), s - 1)
        got = kc(tuple(v[idx] for v in spair))
        np.testing.assert_allclose(
            np.asarray(got[0])[0], np.asarray(expected[0])[lo],
            rtol=0, atol=0,
        )
    assert covered == set(range(s))


def test_chunk_consumers_single_chunk_ignores_align(small_params, small_obs,
                                                    monkeypatch):
    """align only constrains chunk BOUNDARIES; with S ≤ MAX_CHUNK there is
    one unpadded chunk and an align that does not divide MAX_CHUNK (e.g.
    the plan's wc=64 against IDG_MAX_CHUNK=1000) must not raise."""
    monkeypatch.setattr(deg_mod, "MAX_CHUNK", 1000)
    consumers, bounds, _ = staged_degridder_chunk_consumers(
        small_params, small_obs, "pallas_v4", w_rank=2, align=64
    )
    assert len(consumers) == 1
    assert bounds == [(0, small_params.nr_subgrids)]


@pytest.mark.slow
def test_sliced_extraction_matches_full(small_params, small_obs):
    params = small_params
    g, n = params.grid_size, params.subgrid_size
    obs, _ = sort_observation_blocks(small_obs, g, n)
    md = obs.metadata
    s = np.asarray(md.coord_x).shape[0]
    rng = np.random.default_rng(3)
    grid = tuple(
        rng.normal(size=(params.nr_correlations, g, g)).astype(np.float32)
        for _ in range(2)
    )
    plan = plan_grid_extract_ranges(md.coord_x, md.coord_y, g, n, wc=2)
    full = grid_to_subgrids_ranges(grid, md.coord_x, md.coord_y, n,
                                   apply_fft=True, plan=plan)
    cxn, cyn = np.asarray(md.coord_x), np.asarray(md.coord_y)
    chunk = 4
    for lo in range(0, s, chunk):
        hi = lo + chunk
        sp = slice_extract_plan(plan, lo, hi)
        assert sp.nr_subgrids == chunk and sp.k_span == plan.k_span
        pad = hi - min(hi, s)
        cx_c = np.concatenate([cxn[lo:hi], np.repeat(cxn[-1:], pad)])
        cy_c = np.concatenate([cyn[lo:hi], np.repeat(cyn[-1:], pad)])
        got = grid_to_subgrids_ranges(grid, cx_c, cy_c, n, apply_fft=True,
                                      plan=sp)
        keep = min(hi, s) - lo
        for v_got, v_full in zip(got, full):
            np.testing.assert_allclose(
                np.asarray(v_got)[:keep], np.asarray(v_full)[lo:lo + keep],
                rtol=0, atol=0,
            )
        # pad rows are real (finite) extractions of the repeated last tile
        assert all(np.isfinite(np.asarray(v)).all() for v in got)


def test_slice_extract_plan_validates_bounds(small_params, small_obs):
    g, n = small_params.grid_size, small_params.subgrid_size
    obs, _ = sort_observation_blocks(small_obs, g, n)
    md = obs.metadata
    plan = plan_grid_extract_ranges(md.coord_x, md.coord_y, g, n, wc=2)
    with pytest.raises(ValueError):
        slice_extract_plan(plan, 1, 5)
    with pytest.raises(ValueError):
        slice_extract_plan(plan, 4, 4)
