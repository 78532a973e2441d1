"""Shared host-side staging for the Pallas kernel family.

Every Pallas kernel runs one grid step per subgrid (the TPU analogue of
"one thread-block per subgrid", SURVEY.md §2.4) and receives:

- per-subgrid blocks: effective-visibility arrays shaped [1, V, ·] (channels
  folded into scaled uvw on the XLA side), exact phase-offset axis parts,
  and the subgrid/visibility payloads;
- replicated blocks: l/m row vectors, n packs, spheroidal;
- metadata-driven blocks: the two station Jones terms, selected per subgrid
  by scalar-prefetched (aterm_index, station1, station2) — the index_map
  reads the prefetch refs, so aterms stay un-duplicated in HBM.

Mosaic layout rules shape this staging (learned the hard way on-device):
trailing block dims must equal the array dims or be (8,128)-divisible, and
in-kernel reshapes that move data between sublanes and lanes
(e.g. [T,C]→[V,1]) are unsupported — so every per-visibility quantity is
pre-reshaped on the XLA side into the exact orientation its kernel consumes
(columns [S,V,1] or rows [S,1,V]), and the naive kernels work in flat pixel
space [·, N²] end-to-end with the [S,P,N,N] reshape done outside the kernel.

Aterm layout is rearranged once per call to [ts, st, P, N_y, N_x] (pol-major
planes, plus a flat [ts, st, P, N²] variant) so kernels slice one tile per
polarization.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ...config import IDGParams
from ...types import SplitObservation, _register_pytree
from ..common import (
    gather_time,
    lmn_grids,
    phase_offset_parts,
    w_offset_scalar,
)


@_register_pytree
@dataclasses.dataclass(frozen=True)
class Staged:
    """Arrays staged for a per-subgrid Pallas grid. V = T·C (t-major)."""

    uvw: jnp.ndarray        # f32[S, T, 3]
    vis_re: jnp.ndarray     # f32[S, T, C, P]
    vis_im: jnp.ndarray     # f32[S, T, C, P]
    vis_re_pv: jnp.ndarray  # f32[S, P, V]  (pol rows, lanes = V)
    vis_im_pv: jnp.ndarray  # f32[S, P, V]
    up_row: jnp.ndarray     # f32[S, 1, V]  u·k_c (t-major: v = t·C+c)
    vp_row: jnp.ndarray     # f32[S, 1, V]  v·k_c
    mu_row: jnp.ndarray     # f32[S, 1, V]  w_off − w·k_c
    uvw_rows: jnp.ndarray   # f32[S, 3, T]  raw uvw rows (u/v/w on sublanes)
    mu_row_cm: jnp.ndarray  # f32[S, 1, V]  μ, c-major (v = c·T+t)
    vis_re_pv_cm: jnp.ndarray  # f32[S, P, V]  c-major
    vis_im_pv_cm: jnp.ndarray  # f32[S, P, V]
    wavenumbers: jnp.ndarray  # f32[1, C]
    po_x: jnp.ndarray       # f32[S, 1, N]
    po_y: jnp.ndarray       # f32[S, 1, N]
    po_x_col: jnp.ndarray   # f32[S, N, 1]
    po_y_col: jnp.ndarray   # f32[S, N, 1]
    lrow: jnp.ndarray       # f32[1, N]
    mrow: jnp.ndarray       # f32[1, N]
    mcol: jnp.ndarray       # f32[N, 1]
    n_yx: jnp.ndarray       # f32[N, N]  (n[y, x])
    sph: jnp.ndarray        # f32[N, N]
    sph_flat: jnp.ndarray   # f32[1, N²]
    at_re: jnp.ndarray      # f32[ts, st, P, N, N]
    at_im: jnp.ndarray      # f32[ts, st, P, N, N]
    at_re_flat: jnp.ndarray  # f32[ts, st, P, N²]
    at_im_flat: jnp.ndarray  # f32[ts, st, P, N²]
    aterm_index: jnp.ndarray  # i32[S]
    station1: jnp.ndarray   # i32[S]
    station2: jnp.ndarray   # i32[S]


def stage(params: IDGParams, sobs: SplitObservation,
          canonical: bool = False, with_vis: bool = True,
          vis_layout: str = "both") -> Staged:
    """with_vis=False skips the visibility gathers/transposes (the
    degridder never reads them): at the full default problem those arrays
    are ~5 GB of HBM, enough to push transient peak memory over the chip
    limit.

    vis_layout picks which per-visibility orientation to materialize —
    "tmajor" (v = t·C+c: up/vp/mu rows + vis pol-rows; the v3/v4
    kernels), "cmajor" (v = c·T+t: mu_row_cm + vis_re_pv_cm; the
    recurrence kernels v5+), or "both" (default; direct callers and the
    v1/v2 kernels). Each staged kernel reads exactly one orientation, so
    the perf harness (ops/pallas/__init__.STAGED) binds the right one
    and halves the staged visibility HBM."""
    if vis_layout not in ("both", "tmajor", "cmajor"):
        raise ValueError(f"unknown vis_layout {vis_layout!r}")
    build_t = vis_layout in ("both", "tmajor")
    build_c = vis_layout in ("both", "cmajor")
    md = sobs.metadata
    T = params.nr_timesteps_subgrid
    C, P = params.nr_channels, params.nr_correlations
    s_md = md.time_offset.shape[0]
    if canonical:
        # time_offset[s] == s·T (ops/common.canonical_time_offsets): the
        # metadata gather is the identity — skipping it saves ~6 ms per
        # gathered array per 900 subgrids on TPU. Slice to the metadata's
        # subgrid count: a prefix-metadata observation (fewer subgrids
        # than flat time rows) is still canonical, and without the slice
        # the per-subgrid arrays would disagree on S.
        uvw = sobs.uvw.reshape(-1, T, 3)[:s_md]
        vis_re = sobs.vis_re.reshape(-1, T, C, P)[:s_md] if with_vis else None
        vis_im = sobs.vis_im.reshape(-1, T, C, P)[:s_md] if with_vis else None
    else:
        uvw = gather_time(sobs.uvw.reshape(-1, 3), md.time_offset, T)
        vis_re = (
            gather_time(sobs.vis_re.reshape(-1, C, P), md.time_offset, T)
            if with_vis else None
        )
        vis_im = (
            gather_time(sobs.vis_im.reshape(-1, C, P), md.time_offset, T)
            if with_vis else None
        )
    S = uvw.shape[0]
    V = T * C
    po_x, po_y = phase_offset_parts(params, md)
    w_off = w_offset_scalar(params, md)
    l, m, n = lmn_grids(params.subgrid_size, params.image_size)
    k = sobs.wavenumbers
    # channels folded into uvw: effective visibility v = t·C + c
    wp = (uvw[:, :, 2, None] * k[None, None, :]).reshape(S, V)
    mu = w_off[:, None] - wp
    if build_t:
        up = (uvw[:, :, 0, None] * k[None, None, :]).reshape(S, V)
        vp = (uvw[:, :, 1, None] * k[None, None, :]).reshape(S, V)
    at_re = jnp.transpose(sobs.at_re, (0, 1, 4, 2, 3))
    at_im = jnp.transpose(sobs.at_im, (0, 1, 4, 2, 3))
    nn = params.subgrid_size * params.subgrid_size
    with_vis_t = with_vis and build_t
    with_vis_c = with_vis and build_c
    return Staged(
        uvw=uvw,
        vis_re=vis_re,
        vis_im=vis_im,
        vis_re_pv=(
            jnp.moveaxis(vis_re.reshape(S, V, P), 2, 1)
            if with_vis_t else None
        ),
        vis_im_pv=(
            jnp.moveaxis(vis_im.reshape(S, V, P), 2, 1)
            if with_vis_t else None
        ),
        up_row=up[:, None, :] if build_t else None,
        vp_row=vp[:, None, :] if build_t else None,
        mu_row=mu[:, None, :] if build_t else None,
        uvw_rows=jnp.moveaxis(uvw, 1, 2),
        mu_row_cm=(
            jnp.swapaxes(mu.reshape(S, T, C), 1, 2).reshape(S, 1, V)
            if build_c else None
        ),
        vis_re_pv_cm=(
            jnp.transpose(vis_re, (0, 3, 2, 1)).reshape(S, P, V)
            if with_vis_c else None
        ),
        vis_im_pv_cm=(
            jnp.transpose(vis_im, (0, 3, 2, 1)).reshape(S, P, V)
            if with_vis_c else None
        ),
        wavenumbers=k[None, :],
        po_x=po_x[:, None, :],
        po_y=po_y[:, None, :],
        po_x_col=po_x[:, :, None],
        po_y_col=po_y[:, :, None],
        lrow=l[None, :],
        mrow=m[None, :],
        mcol=m[:, None],
        n_yx=n,
        sph=sobs.spheroidal,
        sph_flat=sobs.spheroidal.reshape(1, nn),
        at_re=at_re,
        at_im=at_im,
        at_re_flat=at_re.reshape(*at_re.shape[:3], nn),
        at_im_flat=at_im.reshape(*at_im.shape[:3], nn),
        aterm_index=md.aterm_index.astype(jnp.int32),
        station1=md.station1.astype(jnp.int32),
        station2=md.station2.astype(jnp.int32),
    )


def rank_precisions(w_rank: int):
    """MXU pass policy per Taylor rank.

    At the default rank 2 the correction term is bounded by |μ·n| < 2.5e-3
    of the signal (else rank 2 would not pass the guard, ops/api.py), so a
    single bf16 pass suffices for it; guard-escalated ranks (> 2) imply
    correction magnitudes up to ~|μ·n| ≈ 0.3, where single-pass bf16 error
    (~4e-3 relative) would dominate — every pass runs bf16_3x there."""
    return ("3x", "default") if w_rank <= 2 else ("3x",) * w_rank


def use_interpret() -> bool:
    """Pallas interpret mode off-TPU (CPU tests); compiled on TPU backends
    (the tunneled platform reports 'axon' informally but lowers Mosaic)."""
    platform = jax.devices()[0].platform
    return platform not in ("tpu", "axon")


# ---- in-kernel split-complex helpers (trace-time, shapes static) ----------

def kcmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def kcmul_conj(ar, ai, br, bi):
    """(a) · conj(b)."""
    return ar * br + ai * bi, ai * br - ar * bi


def jones_gridder(p, a1, a2):
    """P ← A1ᴴ·P·A2 on per-pol tile lists (math.hpp:64-77).

    p/a1/a2: ((re, im) × 4 pols) tuples of same-shape tiles (elementwise —
    works for [N,N] planes and flat [1,N²] rows alike), xx,xy,yx,yy order.
    """
    (a0r, a0i), (a1r, a1i), (a2r, a2i), (a3r, a3i) = a1
    # A1ᴴ rows: [conj a0, conj a2; conj a1, conj a3]
    t = []
    for (h0r, h0i, h1r, h1i) in (
        (a0r, -a0i, a2r, -a2i),
        (a1r, -a1i, a3r, -a3i),
    ):
        for col in range(2):
            p0r, p0i = p[col]
            p1r, p1i = p[2 + col]
            xr, xi = kcmul(h0r, h0i, p0r, p0i)
            yr, yi = kcmul(h1r, h1i, p1r, p1i)
            t.append((xr + yr, xi + yi))
    # T·A2: rows of t are [t0 t1; t2 t3]
    (b0r, b0i), (b1r, b1i), (b2r, b2i), (b3r, b3i) = a2
    out = []
    for row in range(2):
        t0r, t0i = t[2 * row]
        t1r, t1i = t[2 * row + 1]
        for (c0r, c0i, c1r, c1i) in ((b0r, b0i, b2r, b2i), (b1r, b1i, b3r, b3i)):
            xr, xi = kcmul(t0r, t0i, c0r, c0i)
            yr, yi = kcmul(t1r, t1i, c1r, c1i)
            out.append((xr + yr, xi + yi))
    return out


def jones_degridder(p, a1, a2):
    """P ← A1·P·A2ᴴ on per-pol tile lists (math.hpp:79-92)."""
    (a0r, a0i), (a1r, a1i), (a2r, a2i), (a3r, a3i) = a1
    t = []
    for (h0r, h0i, h1r, h1i) in (
        (a0r, a0i, a1r, a1i),
        (a2r, a2i, a3r, a3i),
    ):
        for col in range(2):
            p0r, p0i = p[col]
            p1r, p1i = p[2 + col]
            xr, xi = kcmul(h0r, h0i, p0r, p0i)
            yr, yi = kcmul(h1r, h1i, p1r, p1i)
            t.append((xr + yr, xi + yi))
    (b0r, b0i), (b1r, b1i), (b2r, b2i), (b3r, b3i) = a2
    # A2ᴴ columns: col0 = (conj b0, conj b1), col1 = (conj b2, conj b3)
    out = []
    for row in range(2):
        t0r, t0i = t[2 * row]
        t1r, t1i = t[2 * row + 1]
        for (c0r, c0i, c1r, c1i) in (
            (b0r, -b0i, b1r, -b1i),
            (b2r, -b2i, b3r, -b3i),
        ):
            xr, xi = kcmul(t0r, t0i, c0r, c0i)
            yr, yi = kcmul(t1r, t1i, c1r, c1i)
            out.append((xr + yr, xi + yi))
    return out


_PER_SUBGRID_FIELDS = (
    "uvw", "vis_re", "vis_im", "vis_re_pv", "vis_im_pv",
    "up_row", "vp_row", "mu_row", "uvw_rows", "mu_row_cm",
    "vis_re_pv_cm", "vis_im_pv_cm", "po_x", "po_y", "po_x_col", "po_y_col",
    "aterm_index", "station1", "station2",
)


def slice_staged(stg: Staged, lo: int, hi: int) -> Staged:
    """Slice the subgrid axis of every per-subgrid staged array (replicated
    planes pass through). Used to chunk very large grids: one pallas_call
    per chunk keeps the remote AOT compile helper within its memory budget
    (S=24500 single-call degridder modules crash it)."""
    updates = {
        name: getattr(stg, name)[lo:hi]
        for name in _PER_SUBGRID_FIELDS
        if getattr(stg, name) is not None
    }
    return dataclasses.replace(stg, **updates)


def pad_staged(stg: Staged, rows: int) -> Staged:
    """Zero-pad the subgrid axis of every per-subgrid staged array to
    `rows` total rows (replicated planes pass through). Used by the
    fused-pieces pipeline runner to pre-pad the staging ONCE (outside
    the timed window) so the kernel emits the range grid-add's padded
    row count directly and the stage boundary is a pure bitcast — the
    padded rows compute from zero visibilities, so their pieces are
    zero (and the range kernel's run membership masks them regardless)."""
    s = stg.uvw.shape[0]
    if rows == s:
        return stg
    if rows < s:
        raise ValueError(f"pad_staged: rows {rows} < staged rows {s}")
    pad = rows - s
    updates = {
        name: jnp.pad(
            getattr(stg, name),
            [(0, pad)] + [(0, 0)] * (getattr(stg, name).ndim - 1),
        )
        for name in _PER_SUBGRID_FIELDS
        if getattr(stg, name) is not None
    }
    return dataclasses.replace(stg, **updates)


def fused_dft_factor_inputs(n: int, p_pols: int, inverse: bool):
    """Host-side constants for the fused grid-stage kernels (gridder
    epilogue / degridder prologue): the folded-shift DFT factors
    (grid.py:_dft_shift_factors) pre-split to bf16 hi/lo AND pre-packed
    for the K-packed 2-pass dots, so the kernel never assembles a
    constant operand —
      stage-1 LHS  [Wᵀre; Wᵀim] hi|lo on K    [2n, 2n]
      stage-2 RHS  pol-block-diag W, hi;lo / lo;hi K-pairs  [2·p·n, p·n]
    Returns (a2k, b4r_a, b4r_b, b4i_a, b4i_b). The roll phases ride on
    the tile (piece = Wᵀ·diag(phy)·tile·diag(phx)·W and its forward
    inverse), so these are constant across subgrids and steps."""
    import numpy as np

    from ..grid import _dft_shift_factors

    w_re, w_im = _dft_shift_factors(n, inverse=inverse)
    d = n * p_pols
    wl4_re = np.zeros((d, d), np.float32)
    wl4_im = np.zeros_like(wl4_re)
    for p in range(p_pols):
        wl4_re[p * n:(p + 1) * n, p * n:(p + 1) * n] = w_re
        wl4_im[p * n:(p + 1) * n, p * n:(p + 1) * n] = w_im
    a2m = np.concatenate([w_re.T, w_im.T], axis=0).astype(np.float32)

    def _split(x):
        h = jnp.asarray(x).astype(jnp.bfloat16)
        return h, (jnp.asarray(x) - h.astype(jnp.float32)).astype(
            jnp.bfloat16)

    a2h, a2l = _split(a2m)
    b4hr, b4lr = _split(wl4_re)
    b4hi, b4li = _split(wl4_im)
    a2k = jnp.concatenate([a2h, a2l], axis=1)
    b4r_a = jnp.concatenate([b4hr, b4lr], axis=0)
    b4r_b = jnp.concatenate([b4lr, b4hr], axis=0)
    b4i_a = jnp.concatenate([b4hi, b4li], axis=0)
    b4i_b = jnp.concatenate([b4li, b4hi], axis=0)
    return a2k, b4r_a, b4r_b, b4i_a, b4i_b
