"""Pallas kernel ladder vs the golden oracle (interpret mode on CPU).

Mirrors the reference's per-kernel `-c` runs (tests/gridder_common.cpp:43-124)
at the 1e-5 normalized-RMS gate for every rung of the ladder.
"""

import numpy as np
import pytest

from idg_tpu.data import initialize_subgrids
from idg_tpu.models.reference import degridder_reference, gridder_reference
from idg_tpu.ops.api import run_degridder, run_gridder
from idg_tpu.utils.compare import check_error

PALLAS_VERSIONS = ["pallas_v1", "pallas_v2", "pallas_v3", "pallas_v4", "pallas_v5"]
GRIDDER_EXTRA = ["pallas_v6", "pallas_v7"]
DEGRIDDER_EXTRA = ["pallas_v6", "pallas_v7", "pallas_v8"]


@pytest.fixture(scope="module")
def golden_gridder(small_params, small_obs):
    return gridder_reference(small_params, small_obs)


@pytest.fixture(scope="module")
def golden_degridder(small_params, small_obs):
    sub = initialize_subgrids(
        small_params.nr_subgrids,
        small_params.nr_correlations,
        small_params.subgrid_size,
    )
    return sub, degridder_reference(small_params, small_obs, sub)


@pytest.mark.parametrize("version", PALLAS_VERSIONS + GRIDDER_EXTRA)
def test_gridder_pallas_vs_golden(version, small_params, small_obs, golden_gridder):
    got = run_gridder(small_params, small_obs, version=version)
    result = check_error(got, golden_gridder, verbose=False)
    assert result.passed, f"{version}: error {result.mean_error}"


@pytest.mark.parametrize("version", PALLAS_VERSIONS + DEGRIDDER_EXTRA)
def test_degridder_pallas_vs_golden(version, small_params, small_obs, golden_degridder):
    sub, golden = golden_degridder
    got = run_degridder(small_params, small_obs, sub, version=version)
    result = check_error(got, golden, verbose=False)
    assert result.passed, f"{version}: error {result.mean_error}"


@pytest.mark.parametrize("alt", [
    dict(qsplit=True), dict(hswap=True), dict(sstore=True),
    dict(hswap=True, sstore=True),
])
@pytest.mark.slow
def test_degridder_schedule_bit_identical(alt, small_params, small_obs,
                                          golden_degridder):
    """The VPU-diet schedules rearrange data movement only — qsplit
    (quadrant bf16 splits + lhs-half-swap), hswap (half-swap with the
    standard RHS assembly), sstore (channel loop stores straight into the
    rhs quadrants) all compute the same split products in the same f32
    accumulation grouping — results must match the un-merged path exactly,
    for both the general-w (v7, cfold) and w-free (v8) schedules.
    (kmerge=0 pins the pre-round-4 schedule: the kmerge default regroups
    the MXU accumulation and is gated by the comparator instead.)"""
    import numpy as np

    from idg_tpu.ops.pallas.common import stage
    from idg_tpu.ops.pallas.degridder import (
        degridder_pallas_v7_staged, degridder_pallas_v8_staged,
    )
    from idg_tpu.types import split_complex, split_observation

    sub, _ = golden_degridder
    stg = stage(small_params, split_observation(small_obs))
    spair = split_complex(sub)
    for fn, kw in [
        (degridder_pallas_v7_staged, dict(w_rank=2)),
        (degridder_pallas_v8_staged, dict(w_rank=1)),
    ]:
        base = fn(small_params, stg, spair, interpret=True, kmerge=0, **kw)
        fast = fn(small_params, stg, spair, interpret=True, kmerge=0,
                  **alt, **kw)
        np.testing.assert_array_equal(np.asarray(base[0]), np.asarray(fast[0]))
        np.testing.assert_array_equal(np.asarray(base[1]), np.asarray(fast[1]))


@pytest.mark.parametrize("alt", [
    dict(kmerge=0, dbuf=True), dict(kmerge=0, swpipe=True),
])
@pytest.mark.slow
def test_degridder_reorder_schedules_bit_identical(alt, small_params,
                                                   small_obs,
                                                   golden_degridder):
    """dbuf (scratch double-buffering) and swpipe (depth-2 software
    pipeline) reorder the same ops — bit-identical to the un-merged path."""
    import numpy as np

    from idg_tpu.ops.pallas.common import stage
    from idg_tpu.ops.pallas.degridder import (
        degridder_pallas_v7_staged, degridder_pallas_v8_staged,
    )
    from idg_tpu.types import split_complex, split_observation

    sub, _ = golden_degridder
    stg = stage(small_params, split_observation(small_obs))
    spair = split_complex(sub)
    for fn, kw in [
        (degridder_pallas_v7_staged, dict(w_rank=2)),
        (degridder_pallas_v8_staged, dict(w_rank=1)),
    ]:
        base = fn(small_params, stg, spair, interpret=True, kmerge=0, **kw)
        fast = fn(small_params, stg, spair, interpret=True, **alt, **kw)
        np.testing.assert_array_equal(np.asarray(base[0]), np.asarray(fast[0]))
        np.testing.assert_array_equal(np.asarray(base[1]), np.asarray(fast[1]))


@pytest.mark.slow
@pytest.mark.parametrize("kmerge", [1, 2, 3])
def test_degridder_kmerge_within_gate(kmerge, small_params, small_obs,
                                      golden_degridder):
    """The K-merged MXU schedules (round 4) regroup the split-product
    accumulation (kmerge=3 drops the second-order ll·rl term) — not
    bit-identical, but must stay inside the 1e-5 comparator gate vs the
    golden degridder, like every rung."""
    import numpy as np

    from idg_tpu.ops.pallas.common import stage
    from idg_tpu.ops.pallas.degridder import (
        degridder_pallas_v7_staged, degridder_pallas_v8_staged,
    )
    from idg_tpu.types import combine_complex, split_complex, split_observation
    from idg_tpu.utils.compare import compare_visibilities

    sub, golden = golden_degridder
    stg = stage(small_params, split_observation(small_obs))
    spair = split_complex(sub)
    for fn, kw in [
        (degridder_pallas_v7_staged, dict(w_rank=2)),
        (degridder_pallas_v8_staged, dict(w_rank=1)),
    ]:
        re, im = fn(small_params, stg, spair, interpret=True, kmerge=kmerge,
                    **kw)
        dev = combine_complex(np.asarray(re), np.asarray(im))
        result = compare_visibilities(golden, dev, verbose=False)
        assert result.passed, (
            f"{fn.__name__} kmerge={kmerge}: error {result.mean_error}"
        )


def test_gridder_pallas_w_rank_matters_for_nonzero_w(small_params, small_obs):
    """With synthetic nonzero w, rank-2 stays inside the gate (the data's
    |w·k·n| is small); rank handling must engage (kernel uses μ)."""
    import dataclasses

    import numpy as np

    from idg_tpu.types import Observation

    uvw = np.array(small_obs.uvw, copy=True)
    uvw[:, :, 2] = 7.5  # nonzero w plane
    obs = dataclasses.replace(small_obs, uvw=uvw)
    golden = gridder_reference(small_params, obs)
    got = run_gridder(small_params, obs, version="pallas_v3")
    result = check_error(got, golden, verbose=False)
    assert result.passed, f"w!=0: error {result.mean_error}"
    # rank-1 (w term dropped from the Taylor) must be measurably worse
    from idg_tpu.ops.registry import get_kernel
    from idg_tpu.types import split_observation, combine_complex
    import jax

    fn = get_kernel("gridder", "pallas_v3").fn
    re, im = jax.jit(
        lambda s: fn(small_params, s, w_rank=1)
    )(split_observation(obs))
    got1 = combine_complex(np.asarray(re), np.asarray(im))
    r1 = check_error(got1, golden, verbose=False)
    assert r1.mean_error > result.mean_error


def test_canonical_fast_path_matches_gather_path(small_params, small_obs):
    """The gather-skip fast path must be bit-identical to the general path
    on canonical data, and the API must auto-detect canonical layouts."""
    import jax

    from idg_tpu.ops.common import canonical_time_offsets
    from idg_tpu.ops.registry import get_kernel
    from idg_tpu.types import split_observation

    assert canonical_time_offsets(
        small_obs.metadata, small_params.nr_timesteps_subgrid
    )
    sobs = split_observation(small_obs)
    fn = get_kernel("gridder", "pallas_v3").fn
    slow = jax.jit(lambda s: fn(small_params, s, canonical=False))(sobs)
    fast = jax.jit(lambda s: fn(small_params, s, canonical=True))(sobs)
    np.testing.assert_array_equal(np.asarray(slow[0]), np.asarray(fast[0]))
    np.testing.assert_array_equal(np.asarray(slow[1]), np.asarray(fast[1]))


def test_non_canonical_layout_detected(small_params, small_obs):
    import dataclasses

    from idg_tpu.ops.common import canonical_time_offsets

    md = small_obs.metadata
    off = np.array(md.time_offset, copy=True)
    off[0], off[1] = off[1], off[0]
    md2 = dataclasses.replace(md, time_offset=off)
    assert not canonical_time_offsets(md2, small_params.nr_timesteps_subgrid)


def test_degridder_chunked_matches_single_call(small_params, small_obs, monkeypatch):
    """The S-chunked degridder path must match the single-call path."""
    import jax

    from idg_tpu.data import initialize_subgrids
    from idg_tpu.ops.pallas import degridder as dg
    from idg_tpu.types import combine_complex, split_complex, split_observation

    sub = initialize_subgrids(
        small_params.nr_subgrids, small_params.nr_correlations,
        small_params.subgrid_size,
    )
    sobs = split_observation(small_obs)
    pair = split_complex(sub)
    fn = dg.degridder_pallas_v6
    ref = jax.jit(lambda s, sp: fn(small_params, s, sp))(sobs, pair)
    monkeypatch.setattr(dg, "MAX_CHUNK", 2)  # force chunking (S=6 here)
    got = jax.jit(lambda s, sp: fn(small_params, s, sp))(sobs, pair)
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(ref[0]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got[1]), np.asarray(ref[1]), atol=1e-6
    )


def test_w_rank_override_plumbs_through_staged_runner(small_params, small_obs):
    """staged_runner(w_rank=1) must produce rank-1 results (exact for the
    in-tree w == 0 data, so identical to rank 2 here) without error."""
    from idg_tpu.ops.api import staged_runner

    fn2, args2 = staged_runner("gridder", "pallas_v3", small_params, small_obs)
    fn1, args1 = staged_runner(
        "gridder", "pallas_v3", small_params, small_obs, w_rank=1
    )
    out2 = fn2(*args2)
    out1 = fn1(*args1)
    np.testing.assert_allclose(
        np.asarray(out1[0]), np.asarray(out2[0]), atol=1e-5
    )


@pytest.mark.parametrize("nr_channels", [1, 3])
def test_recurrence_kernels_odd_channel_counts(nr_channels):
    """C=1 exercises the dk=0 branch; C=3 the general recurrence tail."""
    from idg_tpu import IDGParams, make_observation
    from idg_tpu.models.reference import gridder_reference

    p = IDGParams(
        grid_size=64, subgrid_size=8, nr_stations=3, nr_timeslots=2,
        nr_timesteps_subgrid=8, nr_channels=nr_channels,
    )
    obs, _ = make_observation(p)
    golden = gridder_reference(p, obs)
    got = run_gridder(p, obs, version="pallas_v5")
    assert check_error(got, golden, verbose=False).passed


def test_direct_kernels_non_divisible_time_tile():
    """T=24 with the default t_tile=16 must not slice out of bounds."""
    from idg_tpu import IDGParams, make_observation
    from idg_tpu.models.reference import gridder_reference

    p = IDGParams(
        grid_size=64, subgrid_size=8, nr_stations=3, nr_timeslots=2,
        nr_timesteps_subgrid=24, nr_channels=4,
    )
    obs, _ = make_observation(p)
    golden = gridder_reference(p, obs)
    got = run_gridder(p, obs, version="pallas_v1")
    assert check_error(got, golden, verbose=False).passed


@pytest.mark.parametrize("version", ["pallas_v5", "pallas_v6"])
def test_recurrence_kernels_nonzero_w(version, small_params, small_obs):
    """The w-rank machinery must hold the gate for w != 0 observations
    (in-tree data is w == 0; this synthesizes a w plane)."""
    import dataclasses

    uvw = np.array(small_obs.uvw, copy=True)
    uvw[:, :, 2] = 5.0
    obs = dataclasses.replace(small_obs, uvw=uvw)
    golden = gridder_reference(small_params, obs)
    got = run_gridder(small_params, obs, version=version)
    result = check_error(got, golden, verbose=False)
    assert result.passed, f"{version} w!=0: {result.mean_error}"


def test_w_rank3_improves_on_larger_w(small_params, small_obs):
    """Rank 3 must beat rank 2 when |mu*n| grows (w_step path)."""
    import dataclasses

    import jax

    from idg_tpu.ops.registry import get_kernel
    from idg_tpu.types import combine_complex, split_observation

    uvw = np.array(small_obs.uvw, copy=True)
    uvw[:, :, 2] = 40.0  # |mu·n| ~ 4e-3 rad at this problem's n scale
    obs = dataclasses.replace(small_obs, uvw=uvw)
    golden = gridder_reference(small_params, obs)
    fn = get_kernel("gridder", "pallas_v3").fn
    sobs = split_observation(obs)
    errs = {}
    for rank in (2, 3):
        re, im = jax.jit(lambda s, rank=rank: fn(small_params, s, w_rank=rank))(sobs)
        got = combine_complex(np.asarray(re), np.asarray(im))
        errs[rank] = check_error(got, golden, verbose=False).mean_error
    assert errs[3] <= errs[2]


@pytest.mark.parametrize("case", [
    "tile", pytest.param("sparse", marks=pytest.mark.slow),
])
def test_gridder_fused_pieces_matches_producer(case):
    """The fused grid-stage epilogue (gridder_pallas_v6_pieces: roll
    phases + folded-shift iDFT on the MXU inside the kernel) reproduces
    the XLA producer (_phase_roll_fourier + fft2_shift_pair) on the
    standard kernel's subgrids, and the composed grid via tiles_pair=
    matches the standard ranges grid — on BOTH dispatch branches (tile
    path nbp <= 2s and the sparse masked-piece path; the sparse case is
    slow-marked via conftest to keep the fast tier inside its budget)."""
    import jax
    import jax.numpy as jnp

    from idg_tpu import IDGParams, make_observation
    from idg_tpu.ops.grid import (_phase_roll_fourier, fft2_shift_pair,
                                  plan_grid_add_ranges,
                                  sort_observation_blocks,
                                  subgrids_to_grid_ranges)
    from idg_tpu.ops.pallas import STAGED
    from idg_tpu.ops.pallas.gridder import gridder_pallas_v6_pieces
    from idg_tpu.types import split_observation

    cases = {
        # tile path: S = 40 >= nbp/2 = 32
        "tile": IDGParams(grid_size=128, subgrid_size=16, nr_stations=5,
                          nr_timeslots=4, nr_timesteps_subgrid=8,
                          nr_channels=8),
        # sparse path: S = 6 < 32
        "sparse": IDGParams(grid_size=128, subgrid_size=16, nr_stations=3,
                            nr_timeslots=2, nr_timesteps_subgrid=16,
                            nr_channels=8),
    }
    for params in [cases[case]]:
        g, n = params.grid_size, params.subgrid_size
        obs, _ = make_observation(params)
        obs, _ = sort_observation_blocks(obs, g, n)
        sobs = split_observation(obs)
        stage_fn, run_fn = STAGED[("gridder", "pallas_v6")]
        stg = jax.jit(
            lambda p, s: stage_fn(p, s, with_vis=True), static_argnums=0
        )(params, sobs)
        sub = run_fn(params, stg)

        md = obs.metadata
        cy = np.asarray(md.coord_y).astype(np.int64) % g
        cx = np.asarray(md.coord_x).astype(np.int64) % g
        oy, ox = (cy % n).astype(np.int32), (cx % n).astype(np.int32)
        expected = fft2_shift_pair(
            _phase_roll_fourier(sub, jnp.asarray(oy), jnp.asarray(ox),
                                shifted=True),
            inverse=True,
        )
        oyx = np.stack([oy, ox], axis=-1)
        got = gridder_pallas_v6_pieces(params, stg, oyx)
        scale = max(float(np.abs(np.asarray(expected[0])).max()), 1.0)
        sparse = plan_grid_add_ranges(cx, cy, g, n).nbp > 2 * cx.shape[0]
        for i in (0, 1):
            np.testing.assert_allclose(
                np.asarray(got[i]) / scale, np.asarray(expected[i]) / scale,
                atol=6e-6, err_msg=f"pieces sparse={sparse} comp={i}",
            )

        a = subgrids_to_grid_ranges(sub, md.coord_x, md.coord_y, g,
                                    apply_fft=True, interpret=True)
        gscale = max(float(np.abs(np.asarray(a[0])).max()), 1.0)
        if sparse:
            # sparse plans consume the 4-D pieces (masked-piece path —
            # the shipping form there); the tile case checks the
            # shipping rows_out form below instead
            b = subgrids_to_grid_ranges(None, md.coord_x, md.coord_y, g,
                                        apply_fft=True, interpret=True,
                                        tiles_pair=got)
            for i in (0, 1):
                np.testing.assert_allclose(
                    np.asarray(b[i]) / gscale, np.asarray(a[i]) / gscale,
                    atol=1e-5, err_msg=f"grid sparse={sparse} comp={i}",
                )

        if not sparse:
            # rows_out form: staging pre-padded to the plan's padded row
            # count, kernel emits [R, N, N·P] directly, the range
            # grid-add consumes it with zero boundary ops (the shipping
            # fused-pipeline composition, api.staged_gridder_pieces_runner
            # pad_rows=...)
            from idg_tpu.ops.grid import tile_pad_rows
            from idg_tpu.ops.pallas.common import pad_staged
            from idg_tpu.ops.pallas.gridder import pieces_pad_rows

            plan = plan_grid_add_ranges(cx, cy, g, n)
            s = cx.shape[0]
            r = pieces_pad_rows(s, tile_pad_rows(plan))
            got_rows = gridder_pallas_v6_pieces(
                params, pad_staged(stg, r),
                np.concatenate([oyx, np.zeros((r - s, 2), oyx.dtype)]),
                rows_out=True,
            )
            assert got_rows[0].shape == (r, n,
                                         n * params.nr_correlations)
            c = subgrids_to_grid_ranges(None, md.coord_x, md.coord_y, g,
                                        apply_fft=True, interpret=True,
                                        plan=plan, tiles_pair=got_rows)
            for i in (0, 1):
                np.testing.assert_allclose(
                    np.asarray(c[i]) / gscale,
                    np.asarray(a[i]) / gscale,
                    atol=1e-5, err_msg=f"rows-form grid comp={i}",
                )


@pytest.mark.slow
def test_degridder_fused_pieces_matches_producer():
    """The fused grid-stage PROLOGUE (degridder pallas_v7 fuse path:
    forward folded-shift DFT + roll-back phases on the MXU inside the
    kernel, fed the range extraction's block-rolled pieces) reproduces
    the XLA producer composition (grid_to_subgrids_ranges(apply_fft=True)
    → degridder) at the comparator gate — the degrid mirror of
    test_gridder_fused_pieces_matches_producer."""
    import dataclasses as dc

    import jax

    from idg_tpu import IDGParams, make_observation
    from idg_tpu.ops.common import canonical_time_offsets
    from idg_tpu.ops.grid import (extract_ranges_eligible,
                                  grid_to_subgrids_ranges,
                                  plan_grid_extract_ranges,
                                  sort_observation_blocks)
    from idg_tpu.ops.pallas import STAGED
    from idg_tpu.ops.pallas.degridder import degridder_pallas_v7_staged
    from idg_tpu.types import split_observation

    params = IDGParams(grid_size=128, subgrid_size=16, nr_stations=5,
                       nr_timeslots=4, nr_timesteps_subgrid=16,
                       nr_channels=8)
    g, n = params.grid_size, params.subgrid_size
    obs, _ = make_observation(params)
    obs, _ = sort_observation_blocks(obs, g, n)
    md = obs.metadata
    eplan = plan_grid_extract_ranges(md.coord_x, md.coord_y, g, n)
    assert extract_ranges_eligible(eplan, params.nr_correlations, g, n)
    rng = np.random.default_rng(7)
    grid_pair = tuple(
        rng.normal(size=(params.nr_correlations, g, g)).astype(np.float32)
        for _ in range(2)
    )
    subs = grid_to_subgrids_ranges(grid_pair, md.coord_x, md.coord_y, n,
                                   apply_fft=True, plan=eplan,
                                   interpret=True)
    pieces = grid_to_subgrids_ranges(grid_pair, md.coord_x, md.coord_y, n,
                                     apply_fft=True, plan=eplan,
                                     pieces=True, interpret=True)
    stage_fn, _ = STAGED[("degridder", "pallas_v7")]
    sobs = dc.replace(split_observation(obs), vis_re=None, vis_im=None)
    canonical = canonical_time_offsets(md, params.nr_timesteps_subgrid)
    stg = jax.jit(
        lambda p, s: stage_fn(p, s, canonical=canonical, with_vis=False),
        static_argnums=0,
    )(params, sobs)
    oyx = np.stack([
        (np.asarray(md.coord_y).astype(np.int64) % g % n),
        (np.asarray(md.coord_x).astype(np.int64) % g % n),
    ], axis=-1)
    ref = degridder_pallas_v7_staged(params, stg, subs, w_rank=2,
                                     interpret=True)
    got = degridder_pallas_v7_staged(params, stg, pieces, w_rank=2,
                                     fuse_oyx=oyx, interpret=True)
    for i, (a, b) in enumerate(zip(ref, got)):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(1e-30, float(np.sqrt(np.mean(a ** 2))))
        rms = float(np.sqrt(np.mean((a - b) ** 2))) / denom
        assert rms < 1e-5, f"comp {i} rel-RMS {rms:.3e}"

    # row-form pieces (the shipping pipeline boundary): the extraction
    # emits [S, N, N·P] natively and the prologue consumes it with zero
    # boundary ops; must match the 4-D pieces composition
    rows = grid_to_subgrids_ranges(grid_pair, md.coord_x, md.coord_y, n,
                                   apply_fft=True, plan=eplan,
                                   pieces="rows", interpret=True)
    assert rows[0].shape == (oyx.shape[0], n, n * params.nr_correlations)
    exp = np.transpose(np.asarray(pieces[0]), (0, 2, 1, 3)).reshape(
        rows[0].shape)
    np.testing.assert_allclose(np.asarray(rows[0]), exp, atol=0,
                               err_msg="row-form extraction reorder")
    got_r = degridder_pallas_v7_staged(params, stg, rows, w_rank=2,
                                       fuse_oyx=oyx, interpret=True)
    for i, (a, b) in enumerate(zip(got, got_r)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.array_equal(a, b), f"rows-in comp {i} not bit-identical"
