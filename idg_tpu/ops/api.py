"""Public kernel-run API: host-boundary complex↔split conversion + jit.

Device kernels are complex-free (split f32 pairs); this module is the one
place the conversion happens. Tests, the CLI, and the benchmark harness all
go through here.
"""

from __future__ import annotations

import inspect
import math
import os
import warnings
from functools import lru_cache, partial

import jax
import numpy as np

from ..config import IDGParams
from ..types import (
    Observation,
    SplitObservation,
    combine_complex,
    split_complex,
    split_observation,
)
from .common import canonical_time_offsets, uniform_channel_spacing
from .registry import get_kernel

# Comfortably inside the 1e-5 normalized-RMS comparator gate
# (tests/test_util.hpp:84), leaving headroom for the bf16_3x matmul floor.
W_TAYLOR_TOL = 3e-6
MAX_W_RANK = 6


@lru_cache(maxsize=None)
def _accepts(workload: str, version: str, param: str) -> bool:
    fn = get_kernel(workload, version).fn
    return param in inspect.signature(fn).parameters


@lru_cache(maxsize=None)
def _jitted(workload: str, version: str, canonical: bool = False,
            w_rank: int | None = None):
    fn = get_kernel(workload, version).fn
    if canonical:
        fn = partial(fn, canonical=True)
    if w_rank is not None:
        fn = partial(fn, w_rank=w_rank)
    return jax.jit(fn, static_argnums=0)


def _canonical(workload, version, params, obs) -> bool:
    """Host-side canonical-layout detection (time_offset[s] == s·T) for
    kernels that expose the gather-skip fast path."""
    return _accepts(workload, version, "canonical") and canonical_time_offsets(
        obs.metadata, params.nr_timesteps_subgrid
    )


def max_mu_n(params: IDGParams, obs: Observation) -> float:
    """Host-side upper bound on |μ·n| = |(w_off − w·k)·n|, the argument of
    the separable kernels' rank-w Taylor of e^{iμ·n} (ops/xla/separable.py).

    PER-SUBGRID extremes: each subgrid's w plane (w_off from its coord_z)
    is chosen to cancel its OWN w·k range, so a global w-vs-w_off bound
    would be wildly pessimistic for w-plane-partitioned data (it forced a
    needless rank-3 escalation on make_w_observation output). Still an
    upper bound — k and w extremes within the subgrid are combined
    worst-case."""
    w = np.asarray(obs.uvw, np.float64)[..., 2].reshape(-1)
    k = np.asarray(obs.wavenumbers, np.float64)
    md = obs.metadata
    t = params.nr_timesteps_subgrid
    idx = np.asarray(md.time_offset, np.int64)[:, None] + np.arange(t)
    ws = w[idx]                                        # [S, T]
    w_lo, w_hi = ws.min(axis=1), ws.max(axis=1)        # [S]
    k_lo, k_hi = float(k.min()), float(k.max())
    wk = np.stack([w_lo * k_lo, w_lo * k_hi, w_hi * k_lo, w_hi * k_hi])
    wk_lo, wk_hi = wk.min(axis=0), wk.max(axis=0)      # [S]
    z = np.asarray(md.coord_z, np.float64)
    w_off = 2.0 * np.pi * float(params.w_step) * (z + 0.5)
    mu_abs = float(np.maximum(np.abs(w_off - wk_lo), np.abs(w_off - wk_hi)).max())
    # n_max over the subgrid (math.hpp:19-24 stable form), f64
    half = params.image_size / 2.0
    tmp = 2.0 * half * half  # l² + m² at the subgrid corner
    n_max = tmp / (1.0 + math.sqrt(max(0.0, 1.0 - tmp))) if tmp <= 1.0 else 1.0
    return float(mu_abs * n_max)


def required_w_rank(params: IDGParams, obs: Observation,
                    tol: float = W_TAYLOR_TOL) -> int | None:
    """Smallest Taylor rank r with truncation bound |μ·n|^r / r! < tol, or
    None when no rank ≤ MAX_W_RANK suffices (Taylor impractical — use a
    direct full-phase kernel instead)."""
    x = max_mu_n(params, obs)
    for r in range(1, MAX_W_RANK + 1):
        if x ** r / math.factorial(r) < tol:
            return r
    return None


def _resolve(workload: str, version: str, params: IDGParams,
             obs: Observation, w_rank=None):
    """Apply the API-boundary correctness guards; returns (version, w_rank).

    1. Channel-recurrence kernels silently assume uniform wavenumber spacing
       (the reference v8's assumption, gridder_v8.cu:135-186); on
       non-uniform inputs fall back to the registered non-recurrence rung.
    2. Low-rank w·n Taylor kernels need rank r with |μ·n|^r/r! inside the
       tolerance; auto-escalate the rank (or fall back, for fixed-rank
       w-free rungs) when the observation's w range demands it.

    An explicitly passed w_rank is respected as an override (benchmark
    knob), with a warning when it is below the required rank.
    """
    entry = get_kernel(workload, version)
    if entry.uniform_channels and not uniform_channel_spacing(obs.wavenumbers):
        if entry.fallback is None:
            raise ValueError(
                f"{workload} {version} assumes uniform channel spacing and the "
                "observation's wavenumbers are non-uniform; no fallback is "
                "registered — pick a non-recurrence version"
            )
        warnings.warn(
            f"{workload} {version} assumes uniform channel spacing; "
            f"wavenumbers are non-uniform — falling back to {entry.fallback}",
            stacklevel=3,
        )
        version = entry.fallback
        entry = get_kernel(workload, version)

    takes_rank = _accepts(workload, version, "w_rank")
    sig_default = (
        inspect.signature(entry.fn).parameters["w_rank"].default
        if takes_rank else None
    )
    # required_w_rank is a full host pass over the observation's w values;
    # direct full-phase kernels (no rank, exact in w) never read it
    need = (
        required_w_rank(params, obs)
        if takes_rank or entry.fixed_w_rank is not None else None
    )
    if w_rank is not None:
        if takes_rank:
            if need is not None and w_rank < need:
                warnings.warn(
                    f"w_rank={w_rank} override is below the required rank "
                    f"{need} for this observation's w range (|mu*n| bound "
                    f"exceeds {W_TAYLOR_TOL:g}); results may miss the 1e-5 "
                    "gate",
                    stacklevel=3,
                )
            return version, w_rank
        # Fixed-rank rungs take no w_rank parameter: the override cannot be
        # applied — say so, then fall through to the fixed_w_rank-vs-need
        # guard below so w!=0 data still triggers the fallback (previously
        # this path skipped the guard and could silently miss the gate).
        warnings.warn(
            f"{workload} {version} has a fixed w-term rank "
            f"({entry.fixed_w_rank}); the w_rank={w_rank} override is "
            "ignored",
            stacklevel=3,
        )
        w_rank = None
    if takes_rank:
        if need is None:
            raise ValueError(
                f"{workload} {version}: the observation's w range puts |mu*n| "
                f"beyond rank-{MAX_W_RANK} Taylor accuracy; use a direct "
                "full-phase kernel (pallas_v1 / xla_v2) instead"
            )
        if need > sig_default:
            return version, need
        return version, None
    # Fixed-rank w-free rungs (gridder pallas_v7 / degridder pallas_v8 run
    # at rank 1 with no w_rank parameter): fall back when rank 1 is short.
    # Direct full-phase kernels (fixed_w_rank=None, no w_rank param) are
    # exact in w and need no guard.
    if entry.fixed_w_rank is not None and (
        need is None or need > entry.fixed_w_rank
    ):
        if need is None or entry.fallback is None:
            # need=None: beyond rank-MAX_W_RANK Taylor accuracy — no
            # low-rank rung (fallbacks included) can meet the gate;
            # fallback=None: nothing to escalate to. Either way a silent
            # return would miss the 1e-5 gate.
            raise ValueError(
                f"{workload} {version} is a rank-{entry.fixed_w_rank} "
                "w-free specialization but the observation's w range needs "
                + (f"Taylor rank {need}" if need is not None
                   else f"more than rank-{MAX_W_RANK} Taylor accuracy")
                + ("; no fallback is registered — " if need is not None
                   else "; ")
                + "use a direct full-phase kernel (pallas_v1 / xla_v2)"
            )
        warnings.warn(
            f"{workload} {version} is a rank-{entry.fixed_w_rank} w-free "
            f"specialization but the observation needs Taylor rank {need} — "
            f"falling back to {entry.fallback}",
            stacklevel=3,
        )
        fb_rank = need if _accepts(workload, entry.fallback, "w_rank") else None
        return entry.fallback, fb_rank
    return version, None


def run_gridder(
    params: IDGParams, obs: Observation, version: str = "xla_v2", w_rank=None
) -> np.ndarray:
    """Run a gridder kernel; returns c64[S, P, N, N] (host)."""
    sobs = split_observation(obs)
    version, w_rank = _resolve("gridder", version, params, obs, w_rank)
    fn = _jitted(
        "gridder", version, _canonical("gridder", version, params, obs), w_rank
    )
    re, im = fn(params, sobs)
    return combine_complex(np.asarray(re), np.asarray(im))


def run_degridder(
    params: IDGParams, obs: Observation, subgrids, version: str = "xla_v2",
    w_rank=None,
) -> np.ndarray:
    """Run a degridder kernel; returns c64[S, T, C, P] (host)."""
    sobs = split_observation(obs)
    sub_pair = split_complex(subgrids)
    version, w_rank = _resolve("degridder", version, params, obs, w_rank)
    fn = _jitted(
        "degridder", version, _canonical("degridder", version, params, obs),
        w_rank,
    )
    re, im = fn(params, sobs, sub_pair)
    return combine_complex(np.asarray(re), np.asarray(im))


def _rowmajor_formats(shapes):
    """Row-major Format tree for `shapes` (a ShapeDtypeStruct tree) on the
    default device. Raises on platforms without layout control — callers
    catch and fall back to unpinned."""
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    dev = SingleDeviceSharding(jax.devices()[0])
    return jax.tree.map(
        lambda s: Format(Layout(major_to_minor=tuple(range(s.ndim))), dev),
        shapes,
    )


def _pin_rowmajor(tree):
    """Pin every array in `tree` to a row-major device layout (no-op on
    platforms without layout control). Used on benchmark inputs that are
    PRODUCED BY JITTED SLICING (chunking): XLA picks S-minor layouts for
    those and then re-inserts relayout copies into EVERY timed launch —
    measured at ~3 ms per 8192-subgrid degridder launch (~10% of the step)
    in the round-3 xplane trace."""
    try:
        fmts = _rowmajor_formats(jax.eval_shape(lambda t: t, tree))
        return jax.jit(lambda t: t, out_shardings=fmts)(tree)
    except Exception:
        return tree


def staged_runner(workload: str, version: str, params: IDGParams, obs: Observation, subgrids=None,
                  w_rank=None):
    """For benchmarking: returns (fn, args) with inputs staged on device so
    the timed call contains only device work (the reference times bare
    kernel launches on pre-staged device buffers the same way,
    app/CUDA/util.cpp:109-126). Kernels with a registered (stage, run) split
    run staging ONCE outside the timed window.

    w_rank overrides the w-term Taylor rank for kernels that accept it
    (rank 1 is exact for w == 0 data such as the in-tree generators; the
    general default is rank 2). The API guards apply here too: recurrence
    kernels fall back on non-uniform channel spacing, and the Taylor rank
    auto-escalates when the observation's w range demands it."""
    from .pallas import STAGED

    version, w_rank = _resolve(workload, version, params, obs, w_rank)
    host_sobs = split_observation(obs)
    if workload == "degridder":
        # The degridder has no visibility INPUT (vis is its output) —
        # don't ship the ~1.6 GB fullsize visibility planes to the device
        # at all (staged or not; no degridder kernel reads them).
        import dataclasses as _dc

        host_sobs = _dc.replace(host_sobs, vis_re=None, vis_im=None)
    sobs = jax.device_put(host_sobs)
    sub_pair = None if subgrids is None else jax.device_put(split_complex(subgrids))

    if (workload, version) in STAGED:
        from .pallas.common import slice_staged
        from .pallas.degridder import MAX_CHUNK

        stage_fn, run_fn = STAGED[(workload, version)]
        if w_rank is not None and "w_rank" in inspect.signature(run_fn).parameters:
            run_fn = partial(run_fn, w_rank=w_rank)
        canonical = canonical_time_offsets(
            obs.metadata, params.nr_timesteps_subgrid
        )
        stage_jit = partial(
            stage_fn, canonical=canonical, with_vis=(workload == "gridder"),
        )
        # Staged-input layout policy (IDG_STAGE_LAYOUT env):
        #   match    (default) stage unpinned, then device_put the staged
        #            arrays into the RUN executable's own preferred input
        #            layouts (compiled.input_formats) and dispatch the AOT
        #            executable directly — zero per-launch relayout copies
        #            by construction, no layout guessing.
        #   rowmajor the earlier forced-row-major staging. On hardware this
        #            OOMed fullsize gridder runs the moment the dead
        #            eval_shape call was fixed: forcing row-major on
        #            [S,N,1]-shaped columns pads the lane dim 1→128 (128×
        #            HBM inflation) and mismatching the run executable's
        #            preferred layouts re-inserts multi-GB relayout copies
        #            into every queued launch. Kept only for A/Bs.
        #   off      stage unpinned, dispatch through the normal jit.
        stage_mode = os.environ.get("IDG_STAGE_LAYOUT", "match").lower()
        if stage_mode == "rowmajor":
            try:
                # bind the static params via partial: eval_shape
                # abstractifies every ARGUMENT, and IDGParams is not a
                # pytree (passing it positionally raises TypeError)
                stage_shardings = _rowmajor_formats(
                    jax.eval_shape(partial(stage_jit, params), sobs)
                )
            except Exception:
                stage_shardings = None
        else:
            stage_shardings = None
        if stage_shardings is not None:
            stg = jax.jit(
                stage_jit, static_argnums=0, out_shardings=stage_shardings
            )(params, sobs)
        else:
            stg = jax.jit(stage_jit, static_argnums=0)(params, sobs)
        jax.block_until_ready(jax.tree_util.tree_leaves(stg))
        # Pin row-major output layouts for the GRIDDER: XLA otherwise picks
        # an S-minor layout for the [S,P,N,N] results and appends a 15 MB
        # relayout copy to every launch (~5-8% of the step, seen in xplane
        # traces). Not applied to the degridder: pinning its chunked path
        # increased peak HBM and OOMed at the full default problem.
        run_jit = None
        if workload == "gridder":
            try:
                fmt = _rowmajor_formats(
                    jax.ShapeDtypeStruct((1, 1, 1, 1), np.float32)
                )
                run_jit = jax.jit(
                    run_fn, static_argnums=0, out_shardings=(fmt, fmt)
                )
            except Exception:
                run_jit = None
        if run_jit is None:
            run_jit = jax.jit(run_fn, static_argnums=0)
        if workload == "gridder":
            if stage_mode == "match":
                try:
                    compiled = run_jit.lower(params, stg).compile()
                    stg = jax.device_put(stg, compiled.input_formats[0][0])
                    jax.block_until_ready(jax.tree_util.tree_leaves(stg))
                    return (lambda p, st: compiled(st)), (params, stg)
                except Exception:
                    pass  # platform without AOT/layout support: plain jit
            return run_jit, (params, stg)
        s = stg.uvw.shape[0]
        if s <= MAX_CHUNK:
            # Single-chunk degridder (e.g. LOFAR-4096, S=7020): mirror the
            # fullsize chunked path's methodology — leading-axis-slimmed
            # outputs (full kernel work, small queue buffers) — and the
            # gridder's `match` AOT dispatch so the staged arrays and the
            # subgrid input sit in the executable's own preferred layouts.
            # Round-5 LOFAR trace (scripts/probes/_tpu_r5_lofardiag.py):
            # the kernel runs at the fullsize 2.04 µs/subgrid, but the
            # launch paid ~4.3 ms re-padding every input 7020 → 7024
            # (batch multiple) INSIDE the timed program plus ~1.4 ms
            # transposing the full [S, P, V] output before the slim
            # slice. Fix both outside the window: pad the staging ONCE
            # to a batch multiple (8 covers every kernel's step batch;
            # ≤0.1% extra rows, pessimistic direction) and slim the RAW
            # c-major output before the [S,T,C,P] transpose so XLA
            # dead-codes the full-size relayout.
            import jax.numpy as jnp

            s_pad8 = -(-s // 8) * 8
            if s_pad8 != s:
                import dataclasses as _dc

                from .pallas.common import _PER_SUBGRID_FIELDS

                pad = s_pad8 - s
                updates = {
                    name: jnp.pad(
                        getattr(stg, name),
                        [(0, pad)] + [(0, 0)] * (getattr(stg, name).ndim - 1),
                    )
                    for name in _PER_SUBGRID_FIELDS
                    if getattr(stg, name) is not None
                }
                stg = _dc.replace(stg, **updates)
                sub_pair = tuple(
                    jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
                    for x in sub_pair
                )
            sub_pinned = _pin_rowmajor(sub_pair)
            takes_raw = "raw" in inspect.signature(
                getattr(run_fn, "func", run_fn)
            ).parameters

            def _slim1(p, stg_c, sub_c):
                if takes_raw:
                    # raw c-major [S, P, V] rows; transpose only the
                    # slimmed row (the full-rows relayout dead-codes)
                    re, im = run_fn(p, stg_c, sub_c, raw=True)
                    T, C = p.nr_timesteps_subgrid, p.nr_channels
                    P = re.shape[1]
                    return tuple(
                        jnp.transpose(v[:1].reshape(1, P, C, T),
                                      (0, 3, 2, 1))
                        for v in (re, im)
                    )
                out = run_fn(p, stg_c, sub_c)
                return jax.tree_util.tree_map(lambda x: x[:1], out)

            run_slim = jax.jit(_slim1, static_argnums=0)
            if stage_mode == "match":
                try:
                    compiled = run_slim.lower(params, stg, sub_pinned).compile()
                    in_fmt = compiled.input_formats[0]
                    stg = jax.device_put(stg, in_fmt[0])
                    sub_pinned = jax.device_put(sub_pinned, in_fmt[1])
                    jax.block_until_ready(
                        jax.tree_util.tree_leaves((stg, sub_pinned))
                    )
                    return (lambda p, st, sb: compiled(st, sb)), \
                        (params, stg, sub_pinned)
                except Exception:
                    pass  # platform without AOT/layout support: plain jit
            return run_slim, (params, stg, sub_pinned)
        # Very large batches: chunk OUTSIDE jit — one single-kernel module
        # per chunk shape (multi-kernel / oversize modules crash the remote
        # AOT compile helper on the tunneled platform). The batch is padded
        # up to whole chunks (≤0.4% extra work, pessimistic direction) so
        # the measurement still covers every real subgrid; chunks share one
        # compiled executable and the timed fn sums their launches.
        import jax.numpy as jnp

        n_chunks = math.ceil(s / MAX_CHUNK)
        s_pad = n_chunks * MAX_CHUNK
        if s_pad != s:
            from .pallas.common import _PER_SUBGRID_FIELDS
            import dataclasses as _dc

            pad = s_pad - s
            updates = {
                name: jnp.pad(
                    getattr(stg, name),
                    [(0, pad)] + [(0, 0)] * (getattr(stg, name).ndim - 1),
                )
                for name in _PER_SUBGRID_FIELDS
                if getattr(stg, name) is not None
            }
            stg = _dc.replace(stg, **updates)
            sub_pair = tuple(
                jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
                for x in sub_pair
            )
        chunks = []
        for lo in range(0, s_pad, MAX_CHUNK):
            hi = lo + MAX_CHUNK
            chunks.append(_pin_rowmajor((
                slice_staged(stg, lo, hi),
                (sub_pair[0][lo:hi], sub_pair[1][lo:hi]),
            )))
        jax.block_until_ready(jax.tree_util.tree_leaves(chunks))
        # Drop the full padded copies before timing: only the pinned chunks
        # are needed, and the timing window queues several windows' worth
        # of launches whose buffers all coexist on a memory-tight device.
        del stg, sub_pair

        # The timed fn returns a leading-axis slice of each chunk result
        # (the full [MAX_CHUNK, T, C, P] outputs become XLA temps inside
        # the executable instead of persistent per-launch output buffers).
        # The timing window dispatches its iterations asynchronously, so
        # with full outputs every queued launch holds ~0.5 GB — at window
        # depth ~8 that alone OOMed fullsize runs. Slicing inside jit
        # cannot dead-code the pallas_call (opaque), so the timed work is
        # unchanged. Slice ONLY the leading subgrid axis: hardware A/B
        # (probe5) showed x[:1] keeps full kernel speed while x[:1,:1,:1]
        # made the identical kernel 2.2× slower (XLA re-fuses/relayouts
        # the output transpose chain when the minor dims are sliced too).
        def _slim(p, stg_c, sub_c):
            out = run_fn(p, stg_c, sub_c)
            return jax.tree_util.tree_map(lambda x: x[:1], out)

        run_slim = jax.jit(_slim, static_argnums=0)

        def fn(params, chunk_list):
            out = None
            for stg_c, sub_c in chunk_list:
                out = run_slim(params, stg_c, sub_c)
            return out

        return fn, (params, chunks)

    jit_fn = _jitted(
        workload, version, _canonical(workload, version, params, obs), w_rank
    )
    if workload == "gridder":
        return jit_fn, (params, sobs)
    return jit_fn, (params, sobs, sub_pair)


def gridded_pipeline_parts(params: IDGParams, obs_sorted: Observation,
                           version: str = "pallas_v6", w_rank=None,
                           plan=None):
    """Fused gridded-pipeline composition, the ONE source for the recipe
    shared by the `pipeline` CLI and bench.py: per-subgrid roll offsets
    from the block-sorted metadata, the tile-path gate (sparse plans
    keep the 4-D pieces form; tile paths pre-pad for the zero-copy
    rows form), the pieces runner, and the jitted range grid-add
    consumer. `obs_sorted` MUST be block-sorted
    (grid.sort_observation_blocks).

    Returns (pfn, pargs, gfn, resolved_version, plan); pfn is None when
    the resolved version has no fused form (caller falls back to the
    staged_runner + XLA producer path)."""
    from .grid import (plan_grid_add_ranges, subgrids_to_grid_ranges,
                       tile_pad_rows)

    g, n = params.grid_size, params.subgrid_size
    md = obs_sorted.metadata
    if plan is None:
        plan = plan_grid_add_ranges(md.coord_x, md.coord_y, g, n)
    oyx = np.stack([
        (np.asarray(md.coord_y).astype(np.int64) % g % n),
        (np.asarray(md.coord_x).astype(np.int64) % g % n),
    ], axis=-1)
    pr = tile_pad_rows(plan) if plan.nbp <= 2 * oyx.shape[0] else None
    pfn, pargs, version = staged_gridder_pieces_runner(
        params, obs_sorted, version, oyx, w_rank=w_rank, pad_rows=pr
    )
    if pfn is None:
        return None, None, None, version, plan
    cx = jax.device_put(md.coord_x)
    cy = jax.device_put(md.coord_y)
    gfn = jax.jit(lambda t: subgrids_to_grid_ranges(
        None, cx, cy, g, apply_fft=True, plan=plan, tiles_pair=t))
    return pfn, pargs, gfn, version, plan


def staged_gridder_pieces_runner(params: IDGParams, obs: Observation,
                                 version: str, oyx, w_rank=None,
                                 pad_rows=None):
    """staged_runner's gridder path with the grid-stage producer fused
    into the kernel epilogue (pallas.gridder.gridder_pallas_v6_pieces):
    the timed call emits phase-rolled iDFT PIECES ready for
    subgrids_to_grid_ranges(tiles_pair=...), skipping the XLA producer
    dots and the S-minor stage-boundary relayout. `oyx` is the [S, 2]
    int32 per-subgrid roll from the block-sorted metadata.

    Returns (fn, args, resolved_version), or (None, None, version) when
    the resolved version has no fused-pieces form (only the v6/v7 batch
    kernel carries the fused epilogue), or when the range-kernel row
    size P·N² is not a multiple of 1024 (subgrids_to_grid_ranges(
    tiles_pair=...) rejects such shapes; the caller's non-fused path
    falls back to the bucketed scatter instead).

    With `pad_rows` (= tile_pad_rows(plan) for the consuming range
    plan; tile path only), the staging is pre-padded ONCE to the
    batch-rounded padded row count and the timed call emits the range
    kernel's row form [R, N, N·P] directly (rows_out) — exact (8,128)
    tiles at N·P = 128, so the stage boundary has NO XLA op at all,
    where the [S, P, N, N] form pays ~8 ms/pass of relayout copies
    (its 32-lane trailing dim is physically lane-padded 4× under
    T(8,128), so no bitcast to the row form exists; round-5 trace)."""
    import jax.numpy as jnp

    from .pallas import STAGED
    from .pallas.gridder import gridder_pallas_v6_pieces

    version, w_rank = _resolve("gridder", version, params, obs, w_rank)
    if version not in ("pallas_v6", "pallas_v7"):
        return None, None, version
    if (params.nr_correlations * params.subgrid_size ** 2) % 1024:
        return None, None, version
    if w_rank is None and version == "pallas_v7":
        w_rank = 1
    stage_fn, _ = STAGED[("gridder", version)]
    sobs = jax.device_put(split_observation(obs))
    canonical = canonical_time_offsets(
        obs.metadata, params.nr_timesteps_subgrid
    )
    stg = jax.jit(
        partial(stage_fn, canonical=canonical, with_vis=True),
        static_argnums=0,
    )(params, sobs)
    jax.block_until_ready(jax.tree_util.tree_leaves(stg))
    run_fn = gridder_pallas_v6_pieces
    if w_rank is not None:
        run_fn = partial(run_fn, w_rank=w_rank)
    oyx_np = np.asarray(oyx)
    if pad_rows is not None:
        from .pallas.common import pad_staged
        from .pallas.gridder import pieces_pad_rows

        s = stg.uvw.shape[0]
        r = pieces_pad_rows(s, pad_rows)
        stg = pad_staged(stg, r)
        jax.block_until_ready(jax.tree_util.tree_leaves(stg))
        oyx_np = np.concatenate(
            [oyx_np, np.zeros((r - oyx_np.shape[0], 2), oyx_np.dtype)]
        )
        run_fn = partial(run_fn, rows_out=True)
    oyx_dev = jax.device_put(jnp.asarray(oyx_np, jnp.int32))
    # row-major outputs + AOT input-layout matching, exactly as
    # staged_runner's gridder path (the range kernel reads the pieces
    # row-major; mismatched layouts re-insert per-launch relayouts).
    # IDG_STAGE_LAYOUT=off skips the AOT match for layout A/Bs — the
    # same policy knob staged_runner honors ('rowmajor' makes no sense
    # here: the pieces output IS the row-major product, inputs stay on
    # whatever the run executable prefers).
    stage_mode = os.environ.get("IDG_STAGE_LAYOUT", "match").lower()
    try:
        out_dims = (1, 1, 1) if pad_rows is not None else (1, 1, 1, 1)
        fmt = _rowmajor_formats(
            jax.ShapeDtypeStruct(out_dims, np.float32)
        )
        run_jit = jax.jit(run_fn, static_argnums=0,
                          out_shardings=(fmt, fmt))
    except Exception:
        run_jit = jax.jit(run_fn, static_argnums=0)
    if stage_mode == "off":
        return run_jit, (params, stg, oyx_dev), version
    try:
        compiled = run_jit.lower(params, stg, oyx_dev).compile()
        in_fmt = compiled.input_formats[0]
        stg = jax.device_put(stg, in_fmt[0])
        oyx_dev = jax.device_put(oyx_dev, in_fmt[1])
        jax.block_until_ready(jax.tree_util.tree_leaves((stg, oyx_dev)))
        return (lambda p, st, o: compiled(st, o)), (params, stg, oyx_dev), \
            version
    except Exception as e:  # noqa: BLE001 — downgrade, but say so
        print(f"[idg-tpu] pieces runner: AOT layout-matched dispatch "
              f"unavailable ({type(e).__name__}); falling back to plain "
              f"jit — measured numbers may include relayout copies")
        return run_jit, (params, stg, oyx_dev), version


def _degridder_staged_chunks(params: IDGParams, obs: Observation,
                             version: str, w_rank, align: int = 1):
    """Shared staging for the pipeline degridder consumers: resolve the
    version, stage the observation vis-free, and split the staging into
    uniform MAX_CHUNK row-major-pinned slices.

    Returns (run_fn, chunks, starts, chunk, version) where chunks[i]
    covers subgrid rows [starts[i], starts[i] + chunk). For
    S ≤ MAX_CHUNK there is one unpadded chunk of S rows; otherwise
    starts are i·MAX_CHUNK with the LAST start pulled back to
    roundup(S − MAX_CHUNK, align) — every real row is covered by
    construction (the tail chunk re-reads a few already-covered rows,
    pessimistic direction for timing). The staged slice and the subgrid
    input must ALWAYS share the same start: the earlier clamped
    dynamic_slice against i·MAX_CHUNK-aligned staged slices paired rows
    off by S_pad − S across the whole tail chunk. `align` (must divide
    MAX_CHUNK) lets a per-chunk upstream producer — the sliced
    extraction plan, slice_extract_plan — keep its own wc boundaries."""
    import dataclasses as _dc

    import jax.numpy as jnp

    from .common import canonical_time_offsets
    from .pallas import STAGED
    from .pallas.common import slice_staged
    from .pallas.degridder import MAX_CHUNK

    version, w_rank = _resolve("degridder", version, params, obs, w_rank)
    if ("degridder", version) not in STAGED:
        raise ValueError(f"degridder {version} has no staged split")
    stage_fn, run_fn = STAGED[("degridder", version)]
    if w_rank is not None and "w_rank" in inspect.signature(run_fn).parameters:
        run_fn = partial(run_fn, w_rank=w_rank)
    host_sobs = _dc.replace(split_observation(obs), vis_re=None, vis_im=None)
    sobs = jax.device_put(host_sobs)
    canonical = canonical_time_offsets(obs.metadata, params.nr_timesteps_subgrid)
    stg = jax.jit(
        partial(stage_fn, canonical=canonical, with_vis=False),
        static_argnums=0,
    )(params, sobs)
    s = stg.uvw.shape[0]
    if s <= MAX_CHUNK:
        # pin the staged arrays row-major like the chunked path below —
        # XLA otherwise re-inserts an S-minor relayout copy into every
        # timed launch
        chunks = [_pin_rowmajor(stg)]
        starts = [0]
        chunk = s
    else:
        # align only matters once chunking engages (a single-chunk
        # staging has no boundaries to align)
        if align < 1 or MAX_CHUNK % align:
            raise ValueError(
                f"align={align} must divide MAX_CHUNK={MAX_CHUNK}"
            )
        chunk = MAX_CHUNK
        n_chunks = math.ceil(s / MAX_CHUNK)
        last = -(-(s - MAX_CHUNK) // align) * align
        starts = [i * MAX_CHUNK for i in range(n_chunks - 1)] + [last]
        hi_max = last + MAX_CHUNK
        if hi_max > s:
            from .pallas.common import _PER_SUBGRID_FIELDS

            pad = hi_max - s
            updates = {
                name: jnp.pad(
                    getattr(stg, name),
                    [(0, pad)] + [(0, 0)] * (getattr(stg, name).ndim - 1),
                )
                for name in _PER_SUBGRID_FIELDS
                if getattr(stg, name) is not None
            }
            stg = _dc.replace(stg, **updates)
        chunks = [
            _pin_rowmajor(slice_staged(stg, lo, lo + MAX_CHUNK))
            for lo in starts
        ]
    jax.block_until_ready(jax.tree_util.tree_leaves(chunks))
    del stg
    return run_fn, chunks, starts, chunk, version


def _slim(out):
    """Leading-axis output slice: keeps the timing queue's live buffers
    small without dead-coding the (opaque) pallas_call — probe5: x[:1]
    keeps full kernel speed, slicing minor dims too costs 2.2×."""
    return jax.tree_util.tree_map(lambda x: x[:1], out)


def staged_degridder_consumer(params: IDGParams, obs: Observation,
                              version: str = "pallas_v7", w_rank=None):
    """For pipeline benchmarking: returns (fn, resolved_version) where
    fn(sub_pair) degrids a FULL [S, P, N, N] split pair produced on
    device (e.g. by the grid-extraction stage) — the degridding dual of
    staged_runner's gridder entry. The observation is staged once,
    vis-free; for S > MAX_CHUNK the subgrid input is chunk-sliced INSIDE
    each chunk's jit (dynamic_slice fuses into the operand copy, so no
    host-visible intermediate or S-minor relayout appears). Outputs are
    leading-axis-sliced to keep the timing queue's buffers small (see
    staged_runner's chunked path for the probe5 rationale)."""
    run_fn, chunks, starts, chunk, version = _degridder_staged_chunks(
        params, obs, version, w_rank
    )
    if len(chunks) == 1:
        stg0 = chunks[0]
        run = jax.jit(
            lambda p, st, sub: _slim(run_fn(p, st, sub)), static_argnums=0
        )
        return (lambda sub: run(params, stg0, sub)), version

    def _one(p, st, sub, lo):
        sub_c = tuple(
            jax.lax.dynamic_slice_in_dim(v, lo, chunk) for v in sub
        )
        return _slim(run_fn(p, st, sub_c))

    run = jax.jit(_one, static_argnums=0)

    def fn(sub):
        out = None
        for st, lo in zip(chunks, starts):
            out = run(params, st, sub, lo)
        return out

    return fn, version


def staged_degridder_chunk_consumers(params: IDGParams, obs: Observation,
                                     version: str = "pallas_v7",
                                     w_rank=None, align: int = 1):
    """Per-chunk duals of staged_degridder_consumer: returns
    (consumers, bounds, resolved_version) where consumers[i](sub_c)
    degrids a [hi−lo, P, N, N] split pair covering subgrid rows
    [lo, hi) = bounds[i], produced directly upstream — e.g. by a
    slice_extract_plan extraction — so the full-S subgrid intermediate
    and its per-chunk slice copies never exist. The tail chunk's bounds
    may overlap the previous chunk and extend past the real S (the
    upstream producer pads; overlapping/padded output rows are
    re-computed/discarded). `align` forces every start onto a multiple
    (pass the extraction plan's wc); it must divide MAX_CHUNK."""
    run_fn, chunks, starts, chunk, version = _degridder_staged_chunks(
        params, obs, version, w_rank, align
    )
    run = jax.jit(
        lambda p, st, sub: _slim(run_fn(p, st, sub)), static_argnums=0
    )
    consumers = [
        (lambda sub, st=st: run(params, st, sub)) for st in chunks
    ]
    bounds = [(lo, lo + chunk) for lo in starts]
    return consumers, bounds, version


def staged_degridder_pieces_chunk_consumers(params: IDGParams,
                                            obs: Observation,
                                            version: str = "pallas_v7",
                                            oyx=None, w_rank=None,
                                            align: int = 1,
                                            sample_fn=None):
    """Fused duals of staged_degridder_chunk_consumers: each consumer
    takes the range extraction's block-rolled PIECES — [rows, P, N, N]
    (grid_to_subgrids_ranges(pieces=True)) or the zero-copy native row
    form [rows, N, N·P] (pieces="rows", auto-detected from the operand
    rank; the shipping pipeline default) — and runs the
    forward DFT + roll-back INSIDE the degridder kernel
    (degridder_pallas_v7/v8 fused prologue) — no XLA producer dots and
    no subgrid intermediate at the stage boundary, the degrid mirror of
    staged_gridder_pieces_runner. `oyx` is the full-S [S, 2] int32
    per-subgrid roll (coord_y % G % N, coord_x % G % N) from the
    block-sorted metadata; the tail chunk's rows are padded with the
    last entry, matching the CLI's repeat-last-coord extraction padding.
    Returns (None, None, resolved_version) when the resolved kernel has
    no fused prologue (non-polstack rungs) so callers can fall back to
    the producer path."""
    from .pallas.degridder import ROWS_IN_VERSIONS

    version_r, w_rank_r = _resolve("degridder", version, params, obs, w_rank)
    if version_r not in ROWS_IN_VERSIONS:
        return None, None, version_r
    run_fn, chunks, starts, chunk, version_r = _degridder_staged_chunks(
        params, obs, version_r, w_rank_r, align
    )
    oyx_full = np.asarray(oyx, np.int32).reshape(-1, 2)
    need = starts[-1] + chunk
    if need > oyx_full.shape[0]:
        pad = need - oyx_full.shape[0]
        oyx_full = np.concatenate(
            [oyx_full, np.repeat(oyx_full[-1:], pad, axis=0)]
        )
    run = jax.jit(
        lambda p, st, pieces, oyx_c: _slim(
            run_fn(p, st, pieces, fuse_oyx=oyx_c)
        ),
        static_argnums=0,
    )
    bounds = [(lo, lo + chunk) for lo in starts]
    if sample_fn is not None:
        # AOT layout-matched dispatch: `sample_fn(bounds)` produces ONE
        # upstream extraction output (device arrays carrying the REAL
        # layouts the producer emits every launch). Lowering against it
        # captures those as the pieces input format, and the staged
        # chunk + roll offsets are device_put into the executable's own
        # preferred formats — the round-5 ablation measured
        # ~2.2 ms/chunk of per-launch staged-input relayouts on the
        # plain-jit dispatch (scripts/probes/_tpu_r5_fuseablate.py).
        try:
            sample = sample_fn(bounds)
            oyx0 = jax.device_put(oyx_full[bounds[0][0]:bounds[0][1]])
            compiled = run.lower(params, chunks[0], sample, oyx0).compile()
            in_fmt = compiled.input_formats[0]
            consumers = []
            for st, (lo, hi) in zip(chunks, bounds):
                st2 = jax.device_put(st, in_fmt[0])
                oyx_c = jax.device_put(oyx_full[lo:hi], in_fmt[2])
                consumers.append(
                    lambda pieces, st2=st2, oyx_c=oyx_c:
                        compiled(st2, pieces, oyx_c)
                )
            return consumers, bounds, version_r
        except Exception as e:  # noqa: BLE001 — downgrade, but say so
            print(f"[idg-tpu] pieces consumers: AOT layout-matched "
                  f"dispatch unavailable ({type(e).__name__}); plain jit")
    consumers = []
    for st, (lo, hi) in zip(chunks, bounds):
        oyx_c = jax.device_put(oyx_full[lo:hi])
        consumers.append(
            lambda pieces, st=st, oyx_c=oyx_c: run(params, st, pieces, oyx_c)
        )
    return consumers, bounds, version_r
