"""Grid stage: batched subgrid FFT + subgrid<->grid scatter/gather.

The reference benchmark stops at subgrids (the FFT + grid-add lives in
upstream production IDG, not in-tree — see README.md:78-80); BASELINE.json's
north star asks for "batched subgrid FFTs, subgrid→grid scatter-add" as an
extension stage. TPU-native design choices:

- FFT as DFT matmuls: subgrids are tiny (N=32), so a length-N DFT is a pair
  of [N,N] matmuls per axis — MXU work, and complex-free (split-complex
  pairs; this TPU backend rejects complex64 anyway). An N·log N FFT would be
  slower than one 32×32 matmul on the MXU.
- scatter-add / gather with N×N WINDOWS (lax.scatter_add update windows,
  vmapped dynamic_slice) over a wrap-padded grid — the elementwise-index
  formulation lowers to a per-element TPU scatter that measured ~3 s per
  pass at the default problem; windowed updates are dynamic-slice-adds.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import get_env_var
from .complexpair import Pair


@lru_cache(maxsize=None)
def _dft_factors(n: int, inverse: bool):
    j = np.arange(n)
    sign = 2.0 if inverse else -2.0
    w = np.exp(sign * 1j * np.pi * np.outer(j, j) / n)
    if inverse:
        w = w / n
    return (
        np.ascontiguousarray(w.real, dtype=np.float32),
        np.ascontiguousarray(w.imag, dtype=np.float32),
    )


def _dft_pair(n: int, inverse: bool) -> Pair:
    re, im = _dft_factors(n, inverse)
    return jnp.asarray(re), jnp.asarray(im)


def _apply_last_axis(x: Pair, w: Pair) -> Pair:
    """y[..., k] = sum_j x[..., j] · w[j, k] (complex, split)."""
    kw = dict(precision="highest", preferred_element_type=jnp.float32)
    rr = jnp.matmul(x[0], w[0], **kw) - jnp.matmul(x[1], w[1], **kw)
    ii = jnp.matmul(x[0], w[1], **kw) + jnp.matmul(x[1], w[0], **kw)
    return rr, ii


def fft2_pair(x: Pair, inverse: bool = False) -> Pair:
    """2-D DFT over the last two axes of a split-complex pair via matmuls."""
    n_last = x[0].shape[-1]
    n_prev = x[0].shape[-2]
    y = _apply_last_axis(x, _dft_pair(n_last, inverse))
    y = tuple(jnp.swapaxes(v, -1, -2) for v in y)
    y = _apply_last_axis(y, _dft_pair(n_prev, inverse))
    return tuple(jnp.swapaxes(v, -1, -2) for v in y)


@lru_cache(maxsize=None)
def _dft_shift_factors(n: int, inverse: bool):
    """DFT matrix with BOTH fftshifts folded in as index permutations:
    Wf[k, y] = Wdft[σ_out(k), σ_in(y)] with σ_in(y) = (y + n//2) % n
    (the pre-shift) and σ_out(k) = (k − n//2) % n (the post-shift, the
    inverse permutation — identical for even n) — so fftshift2 →
    (i)DFT2 → fftshift2 collapses to two plain matmul passes with Wf
    (each jnp.roll shift pass costs a full read+write of the batch:
    ~5 ms at the default grid stage)."""
    re, im = _dft_factors(n, inverse)
    j = np.arange(n)
    s_in = (j + n // 2) % n
    s_out = (j - n // 2) % n
    # _apply_last_axis contracts x[..., j]·w[j, k]: rows are the INPUT
    # index (pre-shift permutation), columns the OUTPUT (post-shift)
    sel = np.ix_(s_in, s_out)
    return (
        np.ascontiguousarray(re[sel]),
        np.ascontiguousarray(im[sel]),
    )


def fft2_shift_pair(x: Pair, inverse: bool = False) -> Pair:
    """fftshift2_pair → fft2_pair → fftshift2_pair as two matmul passes
    (shift permutations folded into the DFT matrices)."""
    n_last = x[0].shape[-1]
    n_prev = x[0].shape[-2]
    wl = _dft_shift_factors(n_last, inverse)
    wp = _dft_shift_factors(n_prev, inverse)
    y = _apply_last_axis(x, (jnp.asarray(wl[0]), jnp.asarray(wl[1])))
    y = tuple(jnp.swapaxes(v, -1, -2) for v in y)
    y = _apply_last_axis(y, (jnp.asarray(wp[0]), jnp.asarray(wp[1])))
    return tuple(jnp.swapaxes(v, -1, -2) for v in y)


def fftshift2_pair(x: Pair) -> Pair:
    """fftshift over the last two axes (production IDG shifts subgrids
    before the grid add; the cost model's +6 flops/pixel 'shift' term,
    app/common/common.cpp:104)."""
    n1, n0 = x[0].shape[-1], x[0].shape[-2]
    return tuple(
        jnp.roll(v, shift=(n0 // 2, n1 // 2), axis=(-2, -1)) for v in x
    )


def _scatter_add_tiles(tiles, cy, cx, grid_size: int):
    """Windowed scatter-add of [S, P, N, N] tiles at rows cy / cols cx into
    a padded [G+N, G+N] grid per polarization, then fold the wrap margins.

    One lax.scatter_add with N×N UPDATE WINDOWS per pol — orders of
    magnitude faster on TPU than the elementwise-index formulation (each
    window is a dynamic-slice-add, not S·N² scattered elements).
    Coordinates are taken mod G, so every window lands in-bounds of the
    padded grid; the N-wide right/bottom margins are then added onto the
    opposite edges, which is exactly periodic wrap. Scattering one
    single-pol plane at a time bounds peak HBM at large grids (a fused
    [P, G+N, G+N] pass held >2 full grids live and OOMed at 16384²)."""
    s_count, p, n, _ = tiles.shape
    g = grid_size
    idx = jnp.stack([cy % g, cx % g], axis=-1)       # [S, 2]
    planes = [_scatter_plane(tiles[:, pol], idx, g) for pol in range(p)]
    return jnp.stack(planes)


def _scatter_plane(tiles_p, idx, grid_size: int):
    """One [S, N, N] plane scattered into a wrap-folded [G, G] grid."""
    n = tiles_p.shape[-1]
    g = grid_size
    dn = lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0, 1),
    )
    padded = jnp.zeros((g + n, g + n), tiles_p.dtype)
    padded = lax.scatter_add(
        padded, idx, tiles_p, dn,
        indices_are_sorted=False, unique_indices=False,
    )
    # fold x margin, then y margin (periodic wrap)
    main = padded[:, :g].at[:, :n].add(padded[:, g:])
    return main[:g, :].at[:n, :].add(main[g:, :])


def subgrids_to_grid(
    sub: Pair, coord_x, coord_y, grid_size: int, apply_fft: bool = True
) -> Pair:
    """Batched subgrid iFFT + scatter-add into a [P, G, G] grid pair.

    sub: pair of f32[S, P, N, N]; coords are the subgrid's top-left grid
    corner (metadata coordinate, app/common/types.hpp:19-26). Tiles that
    overhang the grid edge WRAP periodically — consistent with the grid
    being one period of the FFT image (the synthetic metadata draws coords
    in [0, grid_size), init.cpp:148-150, so edge tiles do overhang).
    """
    if apply_fft:
        sub = fft2_pair(fftshift2_pair(sub), inverse=True)
        sub = fftshift2_pair(sub)
    cy = coord_y.astype(jnp.int32)
    cx = coord_x.astype(jnp.int32)
    return tuple(
        _scatter_add_tiles(v, cy, cx, grid_size) for v in sub
    )


@lru_cache(maxsize=None)
def _streamed_fns(grid_size: int):
    fft = jax.jit(
        lambda s: fftshift2_pair(fft2_pair(fftshift2_pair(s), inverse=True))
    )
    plane = jax.jit(lambda t, i: _scatter_plane(t, i, grid_size))
    return fft, plane


def subgrids_to_grid_streamed(
    sub: Pair, coord_x, coord_y, grid_size: int, apply_fft: bool = True
):
    """subgrids_to_grid for grids near HBM capacity: each (component, pol)
    plane is scattered in its OWN jit call, so XLA's buffer liveness is
    scoped to one plane's transients at a time. A single fused pass at
    16384² full-pol holds the 8.6 GB split-pair output plus several
    padded-plane temporaries and exhausts the 16 GB of a v5e chip; this
    formulation peaks at completed-planes + one plane's scratch.

    Returns (tuple of P re-planes, tuple of P im-planes), each [G, G] —
    deliberately NOT stacked into [P, G, G]: the stack would be one more
    full-grid copy, which is exactly what OOMs at this scale."""
    fft, plane = _streamed_fns(grid_size)
    if apply_fft:
        sub = fft(sub)
    g = grid_size
    idx = jnp.stack([
        coord_y.astype(jnp.int32) % g, coord_x.astype(jnp.int32) % g
    ], axis=-1)
    p = sub[0].shape[1]
    return tuple(
        tuple(plane(v[:, pol], idx) for pol in range(p)) for v in sub
    )


def grid_to_subgrids(
    grid: Pair, coord_x, coord_y, subgrid_size: int, apply_fft: bool = True
) -> Pair:
    """Gather [S, P, N, N] subgrid tiles from a [P, G, G] grid pair and FFT
    them to image space (the degridding direction's grid stage). Edge tiles
    wrap periodically (the gather adjoint of subgrids_to_grid).

    Implemented as a vmapped dynamic_slice over a wrap-padded grid — a
    windowed batched gather, matching the scatter side's formulation."""
    n = subgrid_size
    g = grid[0].shape[-1]
    cy = coord_y.astype(jnp.int32) % g
    cx = coord_x.astype(jnp.int32) % g

    def gather_one(gp, y, x):
        return lax.dynamic_slice(
            gp, (jnp.int32(0), y, x), (gp.shape[0], n, n)
        )

    out = []
    for v in grid:
        padded = jnp.pad(v, ((0, 0), (0, n), (0, n)), mode="wrap")
        out.append(jax.vmap(gather_one, in_axes=(None, 0, 0))(padded, cy, cx))
    sub = tuple(out)  # [S, P, N, N]
    if apply_fft:
        sub = fft2_pair(fftshift2_pair(sub), inverse=False)
        sub = fftshift2_pair(sub)
    return sub


# --------------------------------------------------------------------------
# Bucketed grid-add: host-planned block routing + dense device reduction
# --------------------------------------------------------------------------
#
# The TPU-native answer to the scatter-add problem. A windowed
# lax.scatter_add serializes its S non-unique window updates (~13 µs each on
# v5e → 333 ms at the default problem); a Pallas kernel with data-dependent
# output blocks defeats Mosaic's pipeliner the same way. Instead: subgrid
# coordinates are HOST data (metadata is host-initialized in the reference
# too, app/CUDA/util.cpp:212-214), so the irregular routing is planned once
# per observation in NumPy, and the device-side hot path is fully dense:
#
#   1. quadrant decomposition (device): each N×N tile straddles ≤4 N×N
#      grid-aligned blocks; roll + mask it into 4 block-aligned pieces.
#   2. slot plan (host): sort pieces by destination block, pad each block's
#      piece list to a common `cap` → a [NB, cap] gather table.
#   3. dense reduce (device): gather pieces by the table and sum over the
#      cap axis — a contiguous, parallel, HBM-bandwidth-bound reduction —
#      then a pure reshape/transpose lays the summed blocks into the grid.
#
# No scatter anywhere: wrap is folded into the block ids by the host mod,
# and placement is a reshape because the blocks tile the grid exactly.


class GridAddPlan:
    """Host-precomputed routing for the bucketed grid-add (one observation).

    slots[b, j] = flat index of the j-th piece destined for block b, or the
    sentinel `4·S` (a zero row appended to the piece buffer) for padding.
    Blocks are the (g/n)² N×N-aligned grid tiles, row-major; block rows are
    padded to a multiple of 8 for the Pallas reduction's sublane blocking.
    """

    def __init__(self, slots: np.ndarray, nby: int, nbx: int, cap: int,
                 nr_subgrids: int, grid_size: int, subgrid_size: int,
                 piece_blocks: np.ndarray | None = None):
        self.slots = slots
        self.nby = nby
        self.nbx = nbx
        self.cap = cap
        self.nr_subgrids = nr_subgrids
        self.grid_size = grid_size
        self.subgrid_size = subgrid_size
        # destination block id per quadrant piece (quadrant-major, the
        # forward form of the slot table) — the vmem-scatter kernel's
        # routing input; host data, so usable inside traced callers
        self.piece_blocks = piece_blocks

    @property
    def slot_inflation(self) -> float:
        """Padded slots per real piece — the dense path's waste factor."""
        if self.nr_subgrids == 0:
            return float("nan")
        return self.slots.size / float(4 * self.nr_subgrids)


def plan_grid_add(coord_x, coord_y, grid_size: int, subgrid_size: int,
                  cap_align: int = 8) -> GridAddPlan:
    """Build the [NB, cap] slot table from host subgrid coordinates."""
    n = subgrid_size
    g = grid_size
    if g % n:
        raise ValueError(f"grid_size {g} must be a multiple of subgrid_size {n}")
    cx = np.asarray(coord_x).astype(np.int64) % g
    cy = np.asarray(coord_y).astype(np.int64) % g
    s = int(cx.shape[0])
    nby = nbx = g // n
    by, bx = cy // n, cx // n
    ids = np.concatenate([
        ((by + qy) % nby) * nbx + ((bx + qx) % nbx)
        for qy in (0, 1) for qx in (0, 1)
    ])  # [4S], quadrant-major — must match _quadrant_pieces order
    nb = nby * nbx
    counts = np.bincount(ids, minlength=nb)
    cap = int(counts.max()) if ids.size else 0
    cap = max(cap_align, ((cap + cap_align - 1) // cap_align) * cap_align)
    order = np.argsort(ids, kind="stable")
    seg_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank = np.arange(4 * s) - seg_start[ids[order]]
    nbp = ((nb + 7) // 8) * 8
    slots = np.full((nbp, cap), 4 * s, np.int32)
    slots[ids[order], rank] = order.astype(np.int32)
    return GridAddPlan(slots, nby, nbx, cap, s, g, n,
                       piece_blocks=ids.astype(np.int32))


def _quadrant_pieces(sub: Pair, coord_y, coord_x, grid_size: int) -> Pair:
    """Roll + mask each tile into its 4 N×N block-aligned pieces (device).

    Piece q·S+s for quadrant q=(qy,qx) is tile s rolled so element (y, x)
    sits at its in-block position, masked to the rows/cols that land in
    block (by+qy, bx+qx). Quadrant order matches plan_grid_add's ids.

    The per-tile cyclic roll is a PERMUTATION MATMUL (rolled = R·t·Cᵀ with
    one-hot R/C built by iota comparison) — MXU work, exact in f32 (one
    nonzero per output row ⇒ no accumulation). The advanced-indexing
    formulation lowered to an XLA gather that measured 3.3 s at the
    default problem (~latency-bound per element, like every dynamic-index
    op on this platform); the matmul form is a few GFLOP."""
    n = sub[0].shape[-1]
    g = grid_size
    cy = coord_y.astype(jnp.int32) % g
    cx = coord_x.astype(jnp.int32) % g
    oy, ox = cy % n, cx % n
    return _mask_pieces(_roll_tiles(sub, oy, ox), oy, ox)


def _roll_tiles(x: Pair, oy, ox) -> Pair:
    """Per-tile cyclic roll by (oy, ox) as a PERMUTATION MATMUL (one-hot
    R/C built by iota comparison) — MXU work, exact in f32 (one nonzero
    per output row ⇒ no accumulation). See _quadrant_pieces docstring."""
    re, im = x
    n = re.shape[-1]
    iota = jnp.arange(n, dtype=jnp.int32)
    diff = (iota[:, None] - iota[None, :]) % n            # [n, n] = i - y
    rmat = (diff[None] == oy[:, None, None]).astype(re.dtype)   # [S, n, n]
    cmat = ((-diff)[None] % n == ox[:, None, None]).astype(re.dtype)
    kw = dict(precision="highest", preferred_element_type=jnp.float32)
    return (
        jnp.einsum("siy,spyx,sxj->spij", rmat, re, cmat, **kw),
        jnp.einsum("siy,spyx,sxj->spij", rmat, im, cmat, **kw),
    )


def _mask_pieces(rolled: Pair, oy, ox, pad_rows: int = 0) -> Pair:
    """Mask ROLLED tiles into their 4 quadrant pieces (quadrant-major
    concat, matching plan_grid_add's ids), optionally appending pad_rows
    zero rows inside the same concatenate (one allocation + in-place
    writes — a separate jnp pad costs a full extra copy of the array)."""
    re, im = rolled
    s, p, n, _ = re.shape
    iota = jnp.arange(n, dtype=jnp.int32)
    row_hi = iota[None, :] >= oy[:, None]
    col_hi = iota[None, :] >= ox[:, None]
    pre, pim = [], []
    for qy in (0, 1):
        rmask = row_hi if qy == 0 else ~row_hi
        for qx in (0, 1):
            cmask = col_hi if qx == 0 else ~col_hi
            m = rmask[:, None, :, None] & cmask[:, None, None, :]
            pre.append(jnp.where(m, re, 0.0))
            pim.append(jnp.where(m, im, 0.0))
    if pad_rows:
        z = jnp.zeros((pad_rows, p, n, n), re.dtype)
        pre.append(z)
        pim.append(z)
    return jnp.concatenate(pre), jnp.concatenate(pim)


def _phase_roll_fourier(sub: Pair, oy, ox, sign: float = -1.0,
                        shifted: bool = False) -> Pair:
    """Fold the per-tile cyclic roll by (oy, ox) into Fourier space:
    roll(ifft2(T), (oy, ox)) == ifft2(T · exp(-2πi(ky·oy + kx·ox)/n)).

    Applied BEFORE the subgrid iDFT, this replaces the permutation-matmul
    roll on the image tiles with a fully elementwise phase multiply. The
    point is LAYOUT, not FLOPs: XLA lays the batched roll-einsum output
    S-minor, and relaying the resulting ~GB piece arrays row-major for
    the grid-add kernel measured +94 ms at the default problem — the
    phase multiply fuses into the DFT matmuls and keeps everything
    row-major. Angles use exact integer mod n (k·o < n² fits int32), so
    the phases are exactly periodic.

    sign=+1 applies the conjugate phases (the extraction side's roll-BACK
    after the forward DFT); shifted=True evaluates the phases at the
    fftshifted frequency index σ(k) = (k+n/2)%n (use when the multiply
    sits OUTSIDE the fftshift∘fft∘fftshift chain rather than inside)."""
    re, im = sub
    s, p, n, _ = re.shape
    k = np.arange(n, dtype=np.int64)
    if shifted:
        k = (k + n // 2) % n
    k = jnp.asarray(k, dtype=jnp.int32)
    ay = (sign * 2.0 * np.pi / n) * ((k[None, :] * oy[:, None]) % n).astype(jnp.float32)
    ax = (sign * 2.0 * np.pi / n) * ((k[None, :] * ox[:, None]) % n).astype(jnp.float32)
    cy_, sy_ = jnp.cos(ay), jnp.sin(ay)                       # [S, n]
    cx_, sx_ = jnp.cos(ax), jnp.sin(ax)
    pc = cy_[:, :, None] * cx_[:, None, :] - sy_[:, :, None] * sx_[:, None, :]
    ps = cy_[:, :, None] * sx_[:, None, :] + sy_[:, :, None] * cx_[:, None, :]
    pc, ps = pc[:, None], ps[:, None]                         # [S, 1, n, n]
    return (re * pc - im * ps, re * ps + im * pc)


def _blocks_to_grid(blocks: Pair, nby: int, nbx: int, n: int, g: int,
                    p: int, grid_in: Pair | None) -> Pair:
    """Lay summed [NBp, P·N·N] blocks into the [P, G, G] grid (pure
    reshape/transpose — blocks tile the grid exactly)."""
    out = []
    for i, v in enumerate(blocks):
        gr = (v[:nby * nbx]
              .reshape(nby, nbx, p, n, n)
              .transpose(2, 0, 3, 1, 4)
              .reshape(p, g, g))
        if grid_in is not None:
            gr = gr + grid_in[i]
        out.append(gr)
    return tuple(out)


def subgrids_to_grid_bucketed(
    sub: Pair, coord_x, coord_y, grid_size: int, apply_fft: bool = True,
    plan: GridAddPlan | None = None, grid_in: Pair | None = None,
) -> Pair:
    """Grid-add via the host slot plan + an XLA gather/reduce (dense,
    scatter-free). Coordinates must be concrete (host) values — inside
    traced code use subgrids_to_grid instead."""
    if plan is None:
        plan = plan_grid_add(coord_x, coord_y, grid_size, sub[0].shape[2])
    if apply_fft:
        sub = fft2_pair(fftshift2_pair(sub), inverse=True)
        sub = fftshift2_pair(sub)
    s, p, n, _ = sub[0].shape
    pre, pim = _quadrant_pieces(sub, coord_y, coord_x, grid_size)
    d = p * n * n
    slots = jnp.asarray(plan.slots)
    blocks = []
    for v in (pre, pim):
        rows = jnp.concatenate([v.reshape(4 * s, d),
                                jnp.zeros((1, d), v.dtype)])
        blocks.append(rows[slots].sum(axis=1))
    return _blocks_to_grid(tuple(blocks), plan.nby, plan.nbx,
                           plan.subgrid_size, plan.grid_size, p, grid_in)


VMEM_GRID_LIMIT = 32 * 1024 * 1024


def block_sort_order(coord_x, coord_y, grid_size: int,
                     subgrid_size: int) -> np.ndarray:
    """Host permutation sorting subgrids by destination grid block
    (row-major). With metadata sorted this way, every block's quadrant-q
    pieces form ONE contiguous range of the piece array — the property
    the "ranges" grid-add kernel needs. Sorting metadata is free (host
    data, and kernels are per-subgrid independent); production pipelines
    apply it once at observation setup."""
    g, n = grid_size, subgrid_size
    cx = np.asarray(coord_x).astype(np.int64) % g
    cy = np.asarray(coord_y).astype(np.int64) % g
    nbx = g // n
    return np.argsort((cy // n) * nbx + (cx // n), kind="stable")


def sorted_block_coords(coord_x, coord_y, grid_size: int, subgrid_size: int):
    """block_sort_order plus the permuted host coord arrays — the common
    prologue of every standalone ranges benchmark path (the pipeline
    sorts the whole observation via sort_observation_blocks instead)."""
    order = block_sort_order(coord_x, coord_y, grid_size, subgrid_size)
    return (order, np.asarray(coord_x)[order], np.asarray(coord_y)[order])


def sort_observation_blocks(obs, grid_size: int, subgrid_size: int):
    """Return (observation with block-sorted per-subgrid metadata, order).

    Sorting metadata is free — it is host data, and the gridder/degridder
    kernels are per-subgrid independent — and gives the grid stage the
    contiguous piece ranges the "ranges" accumulator needs. Production
    pipelines apply this once at observation setup."""
    import dataclasses

    md = obs.metadata
    order = block_sort_order(md.coord_x, md.coord_y, grid_size, subgrid_size)
    md_sorted = type(md)(**{
        f.name: np.asarray(getattr(md, f.name))[order]
        for f in dataclasses.fields(md)
    })
    return dataclasses.replace(obs, metadata=md_sorted), order


class GridAddRangePlan:
    """Host routing for the range-read grid-add: per (quadrant, block)
    contiguous piece ranges. Requires block-sorted coords.

    starts/lens: [4, NBp] int32 — piece-array offsets (quadrant section
    folded in) and run lengths; tstarts: the same offsets in TILE space
    (no quadrant section — the tile-window kernel indexes the [S] tile
    array directly); w: window size = max run length."""

    def __init__(self, starts, lens, w, nby, nbx, nbp, nr_subgrids,
                 grid_size, subgrid_size, tstarts=None):
        self.starts = starts
        self.tstarts = tstarts
        self.lens = lens
        self.w = w
        self.nby = nby
        self.nbx = nbx
        self.nbp = nbp
        self.nr_subgrids = nr_subgrids
        self.grid_size = grid_size
        self.subgrid_size = subgrid_size


def plan_grid_add_ranges(coord_x, coord_y, grid_size: int,
                         subgrid_size: int) -> GridAddRangePlan:
    """Range plan from BLOCK-SORTED host coords (see block_sort_order).

    For block b = (iy, ix) and quadrant q = (qy, qx), the contributing
    subgrids are exactly those whose home block is ((iy−qy) mod nby,
    (ix−qx) mod nbx) — a bijective shift of the sorted home-block order,
    so each (q, b) source set is one contiguous subgrid run [r0, r0+len)
    and the piece range is [q·S + r0, q·S + r0 + len)."""
    n = subgrid_size
    g = grid_size
    if g % n:
        raise ValueError(f"grid_size {g} must be a multiple of subgrid_size {n}")
    cx = np.asarray(coord_x).astype(np.int64) % g
    cy = np.asarray(coord_y).astype(np.int64) % g
    s = int(cx.shape[0])
    nby = nbx = g // n
    nb = nby * nbx
    home = (cy // n) * nbx + (cx // n)
    if np.any(np.diff(home) < 0):
        raise ValueError(
            "plan_grid_add_ranges requires block-sorted coords "
            "(apply block_sort_order to the metadata first)"
        )
    counts = np.bincount(home, minlength=nb)
    seg_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    nbp = ((nb + 7) // 8) * 8
    starts = np.zeros((4, nbp), np.int64)
    tstarts = np.zeros((4, nbp), np.int64)
    lens = np.zeros((4, nbp), np.int32)
    iy, ix = np.divmod(np.arange(nb), nbx)
    for q, (qy, qx) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        src = ((iy - qy) % nby) * nbx + ((ix - qx) % nbx)
        starts[q, :nb] = q * s + seg_start[src]
        tstarts[q, :nb] = seg_start[src]
        lens[q, :nb] = counts[src]
    w = max(8, int(counts.max()) if s else 8)
    return GridAddRangePlan(
        starts.astype(np.int32), lens, w, nby, nbx, nbp, s, g, n,
        tstarts=tstarts.astype(np.int32),
    )


def _pad_to_windows(m: int, w: int) -> int:
    """Zero rows to append to an m-row array so every window a range
    kernel can address (start//w and start//w + 1) is a valid whole
    block of W rows — the single source of the kernels' in-bounds
    guarantee."""
    return (-(-m // w) + 1) * w - m


def range_pad_rows(plan: GridAddRangePlan) -> int:
    """Window padding for the [4S, ...] PIECE array (see
    _pad_to_windows)."""
    return _pad_to_windows(4 * plan.nr_subgrids, plan.w)


# Scalar-prefetch SMEM budget: 4·nbp int32 per table, two tables, 1 MB
# SMEM total on v5e → stripe the block axis so each call's tables are
# ≤ 256 KB each (measured: 262144-entry tables OOM SMEM at 8192²).
MAX_RANGE_BLOCKS = 16384


def _grid_add_ranges(pieces: Pair, plan: GridAddRangePlan,
                     interpret) -> Pair:
    """Range-read reduction: one grid step per block; per quadrant, two
    data-dependent W-row window reads cover the block's (arbitrary-
    offset, length ≤ W) piece range; rows are mask-selected by absolute
    index and summed. All dynamic behavior is block-granular input index
    maps — the only dynamic-access construct this platform runs at full
    DMA bandwidth (per-row gathers, dynamic-offset manual DMA, and
    dynamic VMEM RMW all measured ~1 µs/access; see
    subgrids_to_grid_pallas docstring). Large grids stripe the block
    axis across several calls to bound the SMEM scalar tables."""
    if plan.nbp > MAX_RANGE_BLOCKS:
        stripes = []
        for lo in range(0, plan.nbp, MAX_RANGE_BLOCKS):
            hi = min(lo + MAX_RANGE_BLOCKS, plan.nbp)
            stripes.append(_grid_add_ranges_call(
                pieces, plan, plan.starts[:, lo:hi], plan.lens[:, lo:hi],
                interpret,
            ))
        return tuple(
            jnp.concatenate([s[i] for s in stripes]) for i in range(2)
        )
    return _grid_add_ranges_call(pieces, plan, plan.starts, plan.lens,
                                 interpret)


def _grid_add_ranges_call(pieces: Pair, plan: GridAddRangePlan,
                          starts_np, lens_np, interpret) -> Pair:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m_pad, eight, d8 = pieces[0].shape
    w = plan.w
    nbp = starts_np.shape[1]
    if m_pad != range_pad_rows(plan) + 4 * plan.nr_subgrids:
        raise ValueError("pieces must be pre-padded with range_pad_rows")
    n_wblocks = m_pad // w
    starts = jnp.asarray(starts_np).reshape(-1)
    lens = jnp.asarray(lens_np).reshape(-1)

    def kernel(starts_ref, lens_ref, *refs):
        in_refs = refs[:8]
        o_ref = refs[8]
        b = pl.program_id(0)
        # Empty-block fast path (sparse plans: 16384² is ~91% empty
        # blocks): the select/sum over 8 windows costs ~1.8 µs/block
        # whether or not anything matches — predicate it on occupancy and
        # emit plain zeros otherwise. Window DMAs still issue, but
        # consecutive empty blocks map to the same window index and the
        # pipeline skips the re-fetch. Bit-identical (all-false selects
        # produced exact zeros).
        occupied = (
            lens_ref[0 * nbp + b] + lens_ref[1 * nbp + b]
            + lens_ref[2 * nbp + b] + lens_ref[3 * nbp + b]
        ) > 0

        @pl.when(jnp.logical_not(occupied))
        def _():
            o_ref[...] = jnp.zeros((1, eight, d8), jnp.float32)

        @pl.when(occupied)
        def _():
            acc = jnp.zeros((eight, d8), jnp.float32)
            for q in range(4):
                r0 = starts_ref[q * nbp + b]
                ln = lens_ref[q * nbp + b]
                base = (r0 // w) * w
                rows = jnp.concatenate(
                    [in_refs[2 * q][...], in_refs[2 * q + 1][...]], axis=0
                )                                    # [2W, 8, d8]
                idx = base + jax.lax.broadcasted_iota(
                    jnp.int32, (2 * w, 1, 1), 0)
                sel = ((idx >= r0) & (idx < r0 + ln)).astype(jnp.float32)
                acc = acc + jnp.sum(rows * sel, axis=0)
            o_ref[...] = acc[None]

    def win_spec(q, off):
        return pl.BlockSpec(
            (w, eight, d8),
            lambda b, starts_, lens_, q=q, off=off: (
                jnp.minimum(starts_[q * nbp + b] // w + off, n_wblocks - 1),
                0, 0,
            ),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nbp,),
        in_specs=[win_spec(q, off) for q in range(4) for off in (0, 1)],
        out_specs=pl.BlockSpec((1, eight, d8), lambda b, *_: (b, 0, 0)),
    )
    out = []
    for rows in pieces:
        # Materialize ONCE before fanning out to 8 operand slots: without
        # the barrier XLA can replicate the producing fusion per operand.
        (rows,) = jax.lax.optimization_barrier((rows,))
        out.append(pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nbp, eight, d8), jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
        )(starts, lens, *([rows] * 8)))
    return tuple(out)


class GridAddMergedPlan:
    """Host routing for the m-merged range kernel (sparse plans).

    Merging m consecutive-bx blocks per grid step cuts the step count m×
    — the per-step cost of the range kernels is DMA-issue/pipeline-bound
    (~1.7 µs/block at 16384² whether or not the block is empty; the
    pl.when empty skip recovered only 8%), so sparse HBM-capacity plans
    want FEWER, FATTER steps. Block-sorted order makes the union of m
    adjacent blocks' piece runs one contiguous span per quadrant (the
    per-block runs are back-to-back segments), so one 2·wm window pair
    covers all m positions and the per-position select-and-sum becomes a
    [m, 2wm] 0/1 matrix against the window rows — a tiny MXU dot at
    HIGHEST precision (exact for 0/1 selectors).

    The one exception: qx-shifted quadrants at group ix0 == 0 pull their
    j=0 position from the END of the grid row (periodic wrap) — that run
    usually sits outside the window and its selector is all-false there
    (absolute-index compare), so those few pieces (λ·2·nby ≈ 100 at
    16384²) are host-listed and patched by a scatter-add post-pass; rows
    the window DOES cover select normally and are excluded from the
    list (coverage is computed from the same base arithmetic).

    Fields: m, wm (merged window), gbase [4, ng] window anchors,
    gocc [ng] per-group occupancy (post-pass misses excluded — a group
    whose only pieces are misses writes zeros and lets the patch add),
    miss_rows / miss_blocks: piece-array rows and destination block ids."""

    def __init__(self, m, wm, gbase, gocc, miss_rows, miss_blocks):
        self.m = m
        self.wm = wm
        self.gbase = gbase
        self.gocc = gocc
        self.miss_rows = miss_rows
        self.miss_blocks = miss_blocks


def plan_grid_add_merged(plan: GridAddRangePlan,
                         m: int) -> GridAddMergedPlan | None:
    """Merged-group tables from a per-block range plan. Returns None when
    the plan's geometry doesn't support merging (m ∤ nbx, padded block
    tail, or a pathological window: wm > 16·m suggests a dense plan that
    belongs on the per-block kernels)."""
    nbx, nby, nbp = plan.nbx, plan.nby, plan.nbp
    nb = nby * nbx
    if m < 2 or nbx % m or nbp != nb or nb % m:
        return None
    ng = nb // m
    s4 = plan.starts[:, :nb].reshape(4, ng, m).astype(np.int64)
    l4 = plan.lens[:, :nb].reshape(4, ng, m).astype(np.int64)
    # wrap groups: qx == 1 quadrants (ids 1, 3 in _QUADRANTS order) at
    # ix0 == 0 — position j=0 sources the row-end block
    wrap_g = (np.arange(ng) * m) % nbx == 0
    outlier = np.zeros((4, ng, m), bool)
    outlier[1, wrap_g, 0] = True
    outlier[3, wrap_g, 0] = True
    big = np.int64(1) << 60
    r0 = np.where(outlier, big, s4).min(axis=2)              # [4, ng]
    end = np.where(outlier, -1, s4 + l4).max(axis=2)
    empty = np.where(outlier, 0, l4).sum(axis=2) == 0
    r0 = np.where(empty, 0, r0)
    end = np.where(empty, 0, np.maximum(end, r0))
    span = int((end - r0).max()) if ng else 0
    wm = max(8, -(-span // 8) * 8)
    if wm > 16 * m:
        return None
    gbase = r0.astype(np.int32)
    base = (r0 // wm) * wm
    # misses: outlier rows not covered by [base, base + 2wm)
    miss_rows, miss_blocks = [], []
    for q in (1, 3):
        for g in np.nonzero(wrap_g)[0]:
            o0 = int(s4[q, g, 0])
            oln = int(l4[q, g, 0])
            if not oln:
                continue
            lo_cov, hi_cov = int(base[q, g]), int(base[q, g]) + 2 * wm
            for r in range(o0, o0 + oln):
                if not (lo_cov <= r < hi_cov):
                    miss_rows.append(r)
                    miss_blocks.append(g * m)
    gocc = (
        np.where(outlier, 0, l4).sum(axis=(0, 2)).astype(np.int32)
    )
    return GridAddMergedPlan(
        m, wm, gbase, gocc,
        np.asarray(miss_rows, np.int64), np.asarray(miss_blocks, np.int64),
    )


def _grid_add_ranges_merged_call(pieces: Pair, m: int, wm: int,
                                 starts_np, lens_np, gbase_np, gocc_np,
                                 interpret) -> Pair:
    """One pallas_call of the merged range kernel over one stripe's
    blocks (see GridAddMergedPlan). Tables may be host numpy or
    device arrays (pre-uploaded by the streamed wrapper).

    Output stays in block layout [NBp, 8, d8]; emitting band windows
    directly was tried and Mosaic rejects the required lane→sublane
    in-kernel transpose ("unsupported shape cast") — the dot output
    carries the whole payload on lanes, so the block→band relayout
    lives with XLA in the callers (measured 11 ms/stripe at 16384²)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m_pad, eight, d8 = pieces[0].shape
    nbp = starts_np.shape[1]
    ng = nbp // m
    n_wblocks = m_pad // wm
    starts = jnp.asarray(starts_np).reshape(-1)
    lens = jnp.asarray(lens_np).reshape(-1)
    gbase = jnp.asarray(gbase_np).reshape(-1)
    gocc = jnp.asarray(gocc_np).reshape(-1)
    def kernel(starts_ref, lens_ref, gbase_ref, gocc_ref, *refs):
        in_refs = refs[:8]
        o_ref = refs[8]
        b = pl.program_id(0)

        @pl.when(gocc_ref[b] == 0)
        def _():
            o_ref[...] = jnp.zeros((m, eight, d8), jnp.float32)

        @pl.when(gocc_ref[b] > 0)
        def _():
            acc = jnp.zeros((m, eight * d8), jnp.float32)
            for q in range(4):
                rows = jnp.concatenate(
                    [in_refs[2 * q][...], in_refs[2 * q + 1][...]], axis=0
                ).reshape(2 * wm, eight * d8)
                base = (gbase_ref[q * ng + b] // wm) * wm
                idx = base + lax.broadcasted_iota(jnp.int32, (1, 2 * wm), 1)
                r0s = jnp.stack(
                    [starts_ref[q * nbp + b * m + j] for j in range(m)]
                ).reshape(m, 1)
                lns = jnp.stack(
                    [lens_ref[q * nbp + b * m + j] for j in range(m)]
                ).reshape(m, 1)
                sel = ((idx >= r0s) & (idx < r0s + lns)).astype(jnp.float32)
                # 0/1 selector contraction on the MXU: HIGHEST (3-way
                # split) is exact for selector · f32-row products
                acc = acc + jax.lax.dot_general(
                    sel, rows, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
            o_ref[...] = acc.reshape(m, eight, d8)

    def win_spec(q, off):
        return pl.BlockSpec(
            (wm, eight, d8),
            lambda b, starts_, lens_, gbase_, gocc_, q=q, off=off: (
                jnp.minimum(gbase_[q * ng + b] // wm + off, n_wblocks - 1),
                0, 0,
            ),
            memory_space=pltpu.VMEM,
        )

    out_spec = pl.BlockSpec((m, eight, d8), lambda b, *_: (b, 0, 0))
    out_shape = jax.ShapeDtypeStruct((nbp, eight, d8), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ng,),
        in_specs=[win_spec(q, off) for q in range(4) for off in (0, 1)],
        out_specs=out_spec,
    )
    out = []
    for rows in pieces:
        (rows,) = jax.lax.optimization_barrier((rows,))
        out.append(pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
        )(starts, lens, gbase, gocc, *([rows] * 8)))
    return tuple(out)


def tile_pad_rows(plan: GridAddRangePlan) -> int:
    """Zero rows to append to the [S, ...] TILE array so every window the
    tile-range kernel can address (tstart//w and tstart//w + 1) is a
    valid whole block of W rows."""
    return _pad_to_windows(plan.nr_subgrids, plan.w)


def _grid_add_ranges_tiles(tiles: Pair, oyx, plan: GridAddRangePlan,
                           interpret, row_form: bool = False) -> Pair:
    """Range-read reduction DIRECTLY from rolled tiles: same contiguous-
    run window scheme as _grid_add_ranges, but the quadrant masking
    happens IN-KERNEL (per-row oy/ox offsets ride along as tiny [W,1,2]
    windows sharing the tile windows' index maps), so the 4×-inflated
    masked piece array is never materialized. At the default problem
    that producer stage — quadrant where-masks, concat DUS writes, and
    the S-minor→row-major relayout copies XLA inserts before the custom
    call — cost ~24 ms of the 67 ms pass (xplane attribution); the
    in-kernel masks are a few extra VPU compares on data already in
    VMEM."""
    if tiles[0].shape[0] < tile_pad_rows(plan) + plan.nr_subgrids:
        raise ValueError("tiles must be pre-padded with tile_pad_rows "
                         "(extra rows beyond that are allowed: window "
                         "reads are masked by run membership)")
    if plan.nbp > MAX_RANGE_BLOCKS:
        stripes = []
        for lo in range(0, plan.nbp, MAX_RANGE_BLOCKS):
            hi = min(lo + MAX_RANGE_BLOCKS, plan.nbp)
            stripes.append(_grid_add_ranges_tiles_call(
                tiles, oyx, plan.w, plan.subgrid_size,
                plan.tstarts[:, lo:hi], plan.lens[:, lo:hi], interpret,
                row_form=row_form,
            ))
        return tuple(
            jnp.concatenate([s[i] for s in stripes]) for i in range(2)
        )
    return _grid_add_ranges_tiles_call(
        tiles, oyx, plan.w, plan.subgrid_size, plan.tstarts, plan.lens,
        interpret, row_form=row_form,
    )


_QUADRANTS = ((0, 0), (0, 1), (1, 0), (1, 1))  # matches plan ids order


def _grid_add_ranges_tiles_call(tiles: Pair, oyx, w: int, n: int,
                                tstarts_in, lens_in, interpret,
                                row_form: bool = False) -> Pair:
    """Single pallas_call of the tile-range reduction. tstarts_in/lens_in
    are [4, nbp] tables — host numpy when called with a static plan, or
    traced arrays inside shard_map (the per-shard mesh path).

    `row_form`: tiles are [R, N, N·P] (element (i, p·N + j) — the fused
    gridder epilogue's native output shape, exact (8,128) tiles at
    N·P = 128) instead of the flat [R, 8, P·N²/8] (p, i, j) rows; the
    output blocks come back in the same shape and the caller converts
    to the flat block order before _blocks_to_grid."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s_pad, eight, d8 = tiles[0].shape
    nbp = tstarts_in.shape[1]
    n_wblocks = s_pad // w
    tstarts = jnp.asarray(tstarts_in).reshape(-1)
    lens = jnp.asarray(lens_in).reshape(-1)

    def kernel(ts_ref, ln_ref, *refs):
        tile_refs = refs[0:8]
        oyx_refs = refs[8:16]
        o_ref = refs[16]
        b = pl.program_id(0)
        # Empty-block fast path — see _grid_add_ranges_call. Bit-identical.
        occupied = (
            ln_ref[0 * nbp + b] + ln_ref[1 * nbp + b]
            + ln_ref[2 * nbp + b] + ln_ref[3 * nbp + b]
        ) > 0

        @pl.when(jnp.logical_not(occupied))
        def _():
            o_ref[...] = jnp.zeros((1, eight, d8), jnp.float32)

        @pl.when(occupied)
        def _():
            # static lane→pixel maps of the payload: flat (p, i, j) rows
            # or the fused epilogue's (i, p·N + j) row form
            r_iota = lax.broadcasted_iota(jnp.int32, (1, eight, d8), 1)
            c_iota = lax.broadcasted_iota(jnp.int32, (1, eight, d8), 2)
            if row_form:
                i_map = r_iota
                j_map = c_iota % n
            else:
                flat = r_iota * d8 + c_iota
                i_map = (flat // n) % n
                j_map = flat % n
            acc = jnp.zeros((eight, d8), jnp.float32)
            for q, (qy, qx) in enumerate(_QUADRANTS):
                t0 = ts_ref[q * nbp + b]
                ln = ln_ref[q * nbp + b]
                base = (t0 // w) * w
                rows = jnp.concatenate(
                    [tile_refs[2 * q][...], tile_refs[2 * q + 1][...]],
                    axis=0,
                )                                    # [2W, 8, d8]
                oyx_rows = jnp.concatenate(
                    [oyx_refs[2 * q][...], oyx_refs[2 * q + 1][...]],
                    axis=0,
                )                                    # [2W, 1, 2]
                oy_r = oyx_rows[:, :, 0:1]           # [2W, 1, 1]
                ox_r = oyx_rows[:, :, 1:2]
                idx = base + lax.broadcasted_iota(
                    jnp.int32, (2 * w, 1, 1), 0)
                sel = (idx >= t0) & (idx < t0 + ln)
                my = (i_map >= oy_r) if qy == 0 else (i_map < oy_r)
                mx = (j_map >= ox_r) if qx == 0 else (j_map < ox_r)
                mult = (sel & my & mx).astype(jnp.float32)
                acc = acc + jnp.sum(rows * mult, axis=0)
            o_ref[...] = acc[None]

    def win_spec(q, off, block):
        return pl.BlockSpec(
            block,
            lambda b, ts_, ln_, q=q, off=off: (
                jnp.minimum(ts_[q * nbp + b] // w + off, n_wblocks - 1),
                0, 0,
            ),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nbp,),
        in_specs=(
            [win_spec(q, off, (w, eight, d8))
             for q in range(4) for off in (0, 1)]
            + [win_spec(q, off, (w, 1, 2))
               for q in range(4) for off in (0, 1)]
        ),
        out_specs=pl.BlockSpec((1, eight, d8), lambda b, *_: (b, 0, 0)),
    )
    out = []
    for rows in tiles:
        # Materialize ONCE before fanning out to 8 operand slots: without
        # the barrier XLA can replicate the producing fusion per operand.
        (rows,) = jax.lax.optimization_barrier((rows,))
        out.append(pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nbp, eight, d8), jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
        )(tstarts, lens, *([rows] * 8), *([oyx] * 8)))
    return tuple(out)


class GridExtractRangePlan:
    """Host routing for the range-read grid EXTRACT (the gather dual of
    GridAddRangePlan). Requires block-sorted coords.

    qb0: i32[n_chunks] — first tile's unwrapped padded-block id per
    chunk; tmeta: i32[S_pad, 1, 4] — per-tile (block id relative to its
    chunk's qb0, oy, ox, 0); k_span: max relative id + 1 = the static
    window height; wc: tiles per chunk."""

    def __init__(self, qb0, tmeta, k_span, wc, n_chunks, nby, nbx,
                 nr_subgrids, grid_size, subgrid_size):
        self.qb0 = qb0
        self.tmeta = tmeta
        self.k_span = k_span
        self.wc = wc
        self.n_chunks = n_chunks
        self.nby = nby
        self.nbx = nbx
        self.nr_subgrids = nr_subgrids
        self.grid_size = grid_size
        self.subgrid_size = subgrid_size


# Above this window height the select loop (k_span unrolled compares per
# quadrant) stops paying vs the blocked XLA gather — callers fall back.
MAX_EXTRACT_SPAN = 64

# Auto-tune candidates for tiles-per-chunk, largest first; wc=1 always
# satisfies the span bound (per-tile chunks have rel ≡ 0). Shared with
# callers that must re-plan under a chunk-divisibility constraint.
EXTRACT_WC_LADDER = (64, 32, 16, 8, 4, 2, 1)


def extract_ranges_eligible(plan, p: int, g: int, n: int) -> bool:
    """True when the range-window extraction kernel applies: lane-divisible
    payload, window height within MAX_EXTRACT_SPAN (unreachable for
    auto-tuned plans — wc=1 always satisfies it — but explicit-wc plans
    can exceed), and the periodic-padded block copy fits: it costs ~a
    full extra grid per component, which at HBM-capacity grids (16384²
    full-pol ≈ 8.6 GB of copies next to the 8.6 GB grid) OOMs — those go
    to the windowed XLA gather (IDG_MAX_EXTRACT_BYTES overrides)."""
    d = p * n * n
    nb1 = g // n + 1
    return (
        d % 1024 == 0
        and plan.k_span <= MAX_EXTRACT_SPAN
        and 2 * nb1 * nb1 * d * 4
        <= get_env_var("IDG_MAX_EXTRACT_BYTES", 6 << 30)
    )


def extract_streamed_eligible(plan, p: int, g: int, n: int) -> bool:
    """True when the per-stripe streamed extraction applies: everything
    extract_ranges_eligible requires EXCEPT the block-copy memory bound
    (the stripes exist to dodge it). Keeps the 'memory is the only
    failing condition' routing rule co-located with the conditions."""
    d = p * n * n
    return d % 1024 == 0 and plan.k_span <= MAX_EXTRACT_SPAN


def plan_grid_extract_ranges(coord_x, coord_y, grid_size: int,
                             subgrid_size: int,
                             wc: int | None = None) -> GridExtractRangePlan:
    """Extraction plan from BLOCK-SORTED host coords (block_sort_order).

    Tiles are processed in chunks of wc; within a chunk, every tile's
    quadrant-q source block is its own (unwrapped, periodic-padded) home
    block plus a STATIC offset qy·(nbx+1)+qx, and sorted home blocks are
    monotonic — so one [k_span, ...] window per quadrant covers the whole
    chunk and the per-tile pick is a static-unrolled select.

    wc=None auto-tunes: the largest chunk whose window height fits
    MAX_EXTRACT_SPAN (sparse block occupancy inflates the span — smaller
    chunks trade step count for window height); the base ids are built
    once and only the cheap span computation repeats per candidate."""
    n = subgrid_size
    g = grid_size
    if g % n:
        raise ValueError(f"grid_size {g} must be a multiple of subgrid_size {n}")
    cx = np.asarray(coord_x).astype(np.int64) % g
    cy = np.asarray(coord_y).astype(np.int64) % g
    s = int(cx.shape[0])
    nby = nbx = g // n
    by, bx = cy // n, cx // n
    home = by * nbx + bx
    if np.any(np.diff(home) < 0):
        raise ValueError(
            "plan_grid_extract_ranges requires block-sorted coords "
            "(apply block_sort_order to the metadata first)"
        )
    base_u = by * (nbx + 1) + bx                     # unwrapped padded ids

    def span_for(w):
        n_chunks = max(1, -(-s // w))
        s_pad = n_chunks * w
        base_pad = np.concatenate([base_u, np.full(s_pad - s, base_u[-1]
                                                   if s else 0, np.int64)])
        qb0 = base_pad[::w].astype(np.int32)         # [n_chunks]
        rel = base_pad - np.repeat(qb0, w)
        k_span = int(rel.max()) + 1 if s else 1
        return n_chunks, s_pad, qb0, rel, k_span

    if wc is None:
        # the ladder ends at wc=1, so arbitrarily sparse plans — blocks
        # ≫ subgrids, e.g. S=24500 on a 16384² grid — stay on the range
        # kernel (per-tile static windows) instead of the blocked XLA
        # gather fallback
        for wc in EXTRACT_WC_LADDER:
            n_chunks, s_pad, qb0, rel, k_span = span_for(wc)
            if k_span <= MAX_EXTRACT_SPAN:
                break
    else:
        n_chunks, s_pad, qb0, rel, k_span = span_for(wc)
    tmeta = np.zeros((s_pad, 1, 4), np.int32)
    tmeta[:s, 0, 0] = rel[:s]
    tmeta[:s, 0, 1] = cy % n
    tmeta[:s, 0, 2] = cx % n
    return GridExtractRangePlan(qb0, tmeta, k_span, wc, n_chunks, nby,
                                nbx, s, g, n)


def slice_extract_plan(plan: GridExtractRangePlan, lo: int,
                       hi: int) -> GridExtractRangePlan:
    """Sub-plan over tile rows [lo, hi) — for per-consumer-chunk
    extraction (e.g. one extraction per degridder MAX_CHUNK, so the
    full-S subgrid intermediate and its slice copies never exist).

    lo/hi must be multiples of plan.wc so chunk boundaries align. Rows
    past the parent's table are padded by repeating its last row (same
    relative block id → still inside every window; the values extracted
    there are real grid data the consumer discards). The sub-plan
    claims all hi−lo rows as real (nr_subgrids = hi−lo) so the
    extraction returns a full uniform chunk — pass coords edge-padded
    the same way for the roll phases, and drop rows ≥ the parent's
    nr_subgrids downstream. k_span is inherited from the parent so
    every sub-plan shares one _grid_to_blocks_padded layout."""
    if lo % plan.wc or hi % plan.wc:
        raise ValueError(
            f"slice bounds ({lo}, {hi}) must be multiples of wc={plan.wc}"
        )
    if not lo < hi:
        raise ValueError(f"empty slice ({lo}, {hi})")
    rows = hi - lo
    sp = plan.tmeta.shape[0]
    tm = np.asarray(plan.tmeta)[lo:min(hi, sp)]
    if tm.shape[0] < rows:
        fill = tm[-1:] if tm.shape[0] else np.zeros((1, 1, 4), np.int32)
        tm = np.concatenate(
            [tm, np.repeat(fill, rows - tm.shape[0], axis=0)]
        )
    qb = np.asarray(plan.qb0)[lo // plan.wc:hi // plan.wc]
    nq = rows // plan.wc
    if qb.shape[0] < nq:
        fill = qb[-1:] if qb.shape[0] else np.zeros(1, np.int32)
        qb = np.concatenate([qb, np.repeat(fill, nq - qb.shape[0])])
    return GridExtractRangePlan(qb, tm, plan.k_span, plan.wc, nq,
                                plan.nby, plan.nbx, rows, plan.grid_size,
                                plan.subgrid_size)


def _grid_to_blocks_padded(grid: Pair, n: int, k_span: int,
                           row_form: bool = False) -> Pair:
    """[P, G, G] grid → periodic-padded unwrapped block rows
    [(nby+1)·(nbx+1) + pad, 8, d8] (wrap pad, pure reshape/transpose,
    plus zero rows so both aligned k_span-windows of any in-range start
    — including the +nbu+1 quadrant offset — stay in bounds).

    `row_form`: rows are [(i, p·N + j)] shaped [..., N, N·P] instead of
    the flat (p, i, j) [..., 8, d8] — the degridder fused prologue's
    native input shape (exact (8,128) tiles at N·P = 128; see
    _grid_add_ranges_tiles_call for the gridder-direction mirror)."""
    p, g, _ = grid[0].shape
    nb1 = g // n + 1
    d = p * n * n
    pad = 2 * k_span + nb1 + 2
    # round the row count to a whole number of k_span windows
    pad += -(nb1 * nb1 + pad) % k_span
    out = []
    for v in grid:
        vp = jnp.pad(v, ((0, 0), (0, n), (0, n)), mode="wrap")
        if row_form:
            rows = (vp.reshape(p, nb1, n, nb1, n)
                    .transpose(1, 3, 2, 0, 4)
                    .reshape(nb1 * nb1, n, p * n))
        else:
            rows = (vp.reshape(p, nb1, n, nb1, n)
                    .transpose(1, 3, 0, 2, 4)
                    .reshape(nb1 * nb1, 8, d // 8))
        out.append(jnp.concatenate(
            [rows, jnp.zeros((pad,) + rows.shape[1:], rows.dtype)]
        ))
    return tuple(out)


def _grid_extract_ranges(blocks: Pair, plan: GridExtractRangePlan,
                         interpret, row_form: bool = False) -> Pair:
    """Chunked tile gather: per chunk, 4 static-height block windows (one
    per quadrant, data-dependent index maps off the qb0 scalar table) +
    a [wc,1,4] per-tile meta window; the kernel composes each ROLLED
    tile by an unrolled masked select over the window rows. Static
    output maps, full-bandwidth DMA — the per-tile dynamic-slice gather
    this replaces costs ~0.94 µs/access (157 ms at the default problem)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nrows, eight, d8 = blocks[0].shape
    n = plan.subgrid_size
    wc, ks, nc = plan.wc, plan.k_span, plan.n_chunks
    nbu = plan.nbx + 1
    n_kblocks = nrows // ks
    qb0 = jnp.asarray(plan.qb0)
    tmeta = jnp.asarray(plan.tmeta)
    qoffs = [qy * nbu + qx for qy, qx in _QUADRANTS]

    def kernel(qb0_ref, *refs):
        win = refs[0:8]
        tm = refs[8]
        o_ref = refs[9]
        v = pl.program_id(0)
        bid = tm[:, :, 0:1]                          # [wc, 1, 1]
        oy_r = tm[:, :, 1:2]
        ox_r = tm[:, :, 2:3]
        r_iota = lax.broadcasted_iota(jnp.int32, (1, eight, d8), 1)
        c_iota = lax.broadcasted_iota(jnp.int32, (1, eight, d8), 2)
        if row_form:
            i_map = r_iota
            j_map = c_iota % n
        else:
            flat = r_iota * d8 + c_iota
            i_map = (flat // n) % n
            j_map = flat % n
        acc = jnp.zeros((wc, eight, d8), jnp.float32)
        for q, (qy, qx) in enumerate(_QUADRANTS):
            bstart = qb0_ref[v] + qoffs[q]
            shift = bstart - (bstart // ks) * ks     # window-local offset
            rows = jnp.concatenate(
                [win[2 * q][...], win[2 * q + 1][...]], axis=0
            )                                        # [2ks, 8, d8]
            need = shift + bid                       # [wc, 1, 1] in [0, 2ks)
            picked = jnp.zeros((wc, eight, d8), jnp.float32)
            for k in range(2 * ks):
                m = (need == k).astype(jnp.float32)
                picked = picked + m * rows[k][None]
            my = (i_map >= oy_r) if qy == 0 else (i_map < oy_r)
            mx = (j_map >= ox_r) if qx == 0 else (j_map < ox_r)
            acc = acc + picked * (my & mx).astype(jnp.float32)
        o_ref[...] = acc

    def bwin_spec(q, off):
        qoff = qoffs[q]
        return pl.BlockSpec(
            (ks, eight, d8),
            lambda v, qb0_, q=q, qoff=qoff, off=off: (
                jnp.minimum((qb0_[v] + qoff) // ks + off, n_kblocks - 1),
                0, 0,
            ),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=(
            [bwin_spec(q, off) for q in range(4) for off in (0, 1)]
            + [pl.BlockSpec((wc, 1, 4), lambda v, *_: (v, 0, 0),
                            memory_space=pltpu.VMEM)]
        ),
        out_specs=pl.BlockSpec((wc, eight, d8), lambda v, *_: (v, 0, 0)),
    )
    out = []
    for rows in blocks:
        # materialize once before the 8-slot fanout (see _grid_add_ranges)
        (rows,) = jax.lax.optimization_barrier((rows,))
        out.append(pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nc * wc, eight, d8),
                                           jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
        )(qb0, *([rows] * 8), tmeta))
    return tuple(out)


def grid_to_subgrids_ranges(
    grid: Pair, coord_x, coord_y, subgrid_size: int, apply_fft: bool = True,
    interpret=None, plan: GridExtractRangePlan | None = None,
    pieces: bool = False,
) -> Pair:
    """grid_to_subgrids via the range-window Pallas gather
    (_grid_extract_ranges). REQUIRES block-sorted coords; the tile
    roll-back rides the forward DFT as conjugate Fourier phases. Falls
    back to the blocked XLA gather when the plan's window would be
    taller than MAX_EXTRACT_SPAN (sparse block occupancy) or the payload
    is not lane-divisible.

    pieces=True returns the block-rolled image-domain PIECES ([S, P, N, N]
    row-major, BEFORE the forward DFT + roll-back) for a downstream
    consumer that fuses the DFT into its own kernel (the degridder's
    fused prologue); pieces="rows" returns them in the prologue's NATIVE
    row form [S, N, N·P] (element (i, p·N + j), exact (8,128) tiles at
    N·P = 128 — the [S,P,N,N] form's 32-lane trailing dim is physically
    lane-padded 4× under T(8,128), costing ~8.8 ms/pass of XLA boundary
    copies at the default problem; round-5 trace). Not available on the
    fallback paths — callers must pre-check extract_ranges_eligible."""
    from .pallas.common import use_interpret

    if interpret is None:
        interpret = use_interpret()
    n = subgrid_size
    p, g, _ = grid[0].shape
    d = p * n * n
    # check the payload guard BEFORE planning: the fallback path needs no
    # block-sorted coords (and works on traced coords), so planning first
    # would raise on inputs the contract promises to fall back on
    if d % 1024:
        if pieces:
            raise ValueError("pieces=True requires the range-kernel path "
                             f"(payload {d} not lane-divisible)")
        return grid_to_subgrids(grid, coord_x, coord_y, n, apply_fft)
    if plan is None:
        plan = plan_grid_extract_ranges(coord_x, coord_y, g, n)
    if not extract_ranges_eligible(plan, p, g, n):
        if pieces:
            raise ValueError("pieces=True requires the range-kernel path "
                             "(plan not eligible)")
        return grid_to_subgrids(grid, coord_x, coord_y, n, apply_fft)
    s = plan.nr_subgrids
    row_form = pieces == "rows"
    blocks = _grid_to_blocks_padded(grid, n, plan.k_span,
                                    row_form=row_form)
    rolled = _grid_extract_ranges(blocks, plan, interpret,
                                  row_form=row_form)
    if row_form:
        return tuple(v[:s] for v in rolled)
    rolled = tuple(v[:s].reshape(s, p, n, n) for v in rolled)
    if pieces:
        return rolled
    return _finish_extract(rolled, coord_x, coord_y, g, n, apply_fft)


def _finish_extract(rolled: Pair, coord_x, coord_y, g: int, n: int,
                    apply_fft: bool) -> Pair:
    """Shared tail of the range extractions: undo the block roll — in
    image space for the no-fft path, or folded into the forward DFT as
    conjugate Fourier phases."""
    cy = coord_y.astype(jnp.int32) % g
    cx = coord_x.astype(jnp.int32) % g
    if not apply_fft:
        return _roll_tiles(rolled, (n - cy % n) % n, (n - cx % n) % n)
    x = fft2_shift_pair(rolled, inverse=False)
    return _phase_roll_fourier(x, cy % n, cx % n, sign=+1.0, shifted=True)


@lru_cache(maxsize=8)
def _extract_streamed_fns(p: int, g: int, n: int, hr: int, ch: int,
                          k_span: int, wc: int, nbx: int, interpret: bool):
    """Cached jitted one_stripe for the streamed extraction: one traced
    program serves every stripe — uniform hr block-rows and ch chunks;
    the stripe's grid-row indices, validity mask, and rebased plan
    tables enter as arguments."""
    d = p * n * n
    d8 = d // 8
    nbu = nbx + 1
    rows_real = hr * nbu
    zpad = 2 * k_span + (-(rows_real + 2 * k_span) % k_span)

    @jax.jit
    def one_stripe(grid, y_idx, y_ok, qb0, tmeta):
        shim = GridExtractRangePlan(qb0, tmeta, k_span, wc, ch,
                                    0, nbx, ch * wc, g, n)
        blocks = []
        for v in grid:
            vp = jnp.take(v, y_idx, axis=1) * y_ok[None, :, None]
            vp = jnp.pad(vp, ((0, 0), (0, 0), (0, n)), mode="wrap")
            rows = (vp.reshape(p, hr, n, nbu, n)
                    .transpose(1, 3, 0, 2, 4)
                    .reshape(rows_real, 8, d8))
            blocks.append(jnp.concatenate(
                [rows, jnp.zeros((zpad, 8, d8), rows.dtype)]
            ))
        return _grid_extract_ranges(tuple(blocks), shim, interpret)

    return one_stripe


def grid_to_subgrids_ranges_streamed(
    grid: Pair, coord_x, coord_y, subgrid_size: int, apply_fft: bool = True,
    interpret=None, plan: GridExtractRangePlan | None = None,
    stripe_rows: int | None = None,
) -> Pair:
    """grid_to_subgrids_ranges for HBM-capacity grids (e.g. 16384²
    full-pol, where the monolithic periodic-padded block copy costs a
    full extra grid per component and OOMs next to the grid): the grid
    is processed in BLOCK-ROW STRIPES — each stripe materializes only
    its own hr padded block-rows and extracts the contiguous,
    block-sorted chunk range whose home rows fall in it. Requires
    block-sorted coords; output matches grid_to_subgrids_ranges.

    The [S, P, N, N] result (~0.8 GB at the default S) is still built
    whole — it is the grid-side block copy this avoids. Chunk counts
    are padded to the max per stripe (dummy chunks read stripe row 0
    and are dropped) so ONE traced program serves every stripe."""
    from .pallas.common import use_interpret

    if interpret is None:
        interpret = use_interpret()
    n = subgrid_size
    p, g, _ = grid[0].shape
    d = p * n * n
    if d % 1024:
        raise ValueError("streamed extraction needs a lane-divisible payload")
    if plan is None:
        plan = plan_grid_extract_ranges(coord_x, coord_y, g, n)
    if plan.k_span > MAX_EXTRACT_SPAN:
        raise ValueError(
            f"plan window {plan.k_span} > {MAX_EXTRACT_SPAN}; auto-tuned "
            "plans always satisfy this — re-plan without an explicit wc"
        )
    s = plan.nr_subgrids
    ks, wc = plan.k_span, plan.wc
    nbu = plan.nbx + 1
    nb1 = g // n + 1
    qb0 = np.asarray(plan.qb0).astype(np.int32)
    tmeta = np.asarray(plan.tmeta)
    r_chunk = qb0 // nbu                      # home block-row per chunk
    # rows a chunk can touch beyond its home row: within-chunk id spread
    # (k_span) + the +1 quadrant row offset
    cover = int(np.ceil((ks + nbu + 1) / nbu)) + 1
    if stripe_rows is None:
        budget = get_env_var("IDG_EXTRACT_STRIPE_BYTES", 1 << 29)
        stripe_rows = max(cover + 1, budget // (nbu * d * 4))
    h = int(stripe_rows)
    hr = h + cover
    edges = np.searchsorted(r_chunk, np.arange(0, nb1 + h, h), side="left")
    spans = [(k, int(edges[k]), int(edges[k + 1]))
             for k in range(len(edges) - 1) if edges[k + 1] > edges[k]]
    if not spans:
        raise ValueError("empty extraction plan")
    ch = max(c1 - c0 for _, c0, c1 in spans)
    one_stripe = _extract_streamed_fns(p, g, n, hr, ch, ks, wc, plan.nbx,
                                       bool(interpret))
    outs = []
    for k, c0, c1 in spans:
        r0 = k * h
        qb = qb0[c0:c1] - np.int32(r0 * nbu)
        tm = tmeta[c0 * wc:c1 * wc]
        if c1 - c0 < ch:
            pad = ch - (c1 - c0)
            qb = np.concatenate([qb, np.zeros(pad, np.int32)])
            tm = np.concatenate([tm, np.zeros((pad * wc, 1, 4), tm.dtype)])
        rows_i = r0 * n + np.arange(hr * n)
        y_idx = (rows_i % g).astype(np.int32)
        y_ok = (rows_i // n < nb1).astype(np.float32)
        out = one_stripe(grid, y_idx, y_ok, qb, tm)
        outs.append(tuple(v[:(c1 - c0) * wc] for v in out))
    rolled = tuple(
        jnp.concatenate([o[i] for o in outs])[:s].reshape(s, p, n, n)
        for i in (0, 1)
    )
    return _finish_extract(rolled, coord_x, coord_y, g, n, apply_fft)


@lru_cache(maxsize=8)
def _ranges_streamed_fns(g: int, p: int, n: int, s: int, apply_fft: bool,
                         w: int, nr_subgrids: int, nbx: int,
                         interpret: bool):
    """Cached jitted (prep, one_stripe) for the streamed ranges path —
    keyed on the static problem shape so repeated calls (e.g. the CLI
    bench's timing reps) reuse ONE traced program instead of re-tracing
    fresh closures every invocation. The plan's arrays enter one_stripe
    as arguments; only w/nr_subgrids (the pad geometry) are baked in via
    a starts/lens-free shim plan."""
    d = p * n * n
    d8 = d // 8
    shim = GridAddRangePlan(None, None, w, 0, nbx, 0, nr_subgrids, g, n)
    pad = range_pad_rows(shim)
    m_pad = 4 * s + pad

    @jax.jit
    def prep(sub, coord_x, coord_y):
        cy = coord_y.astype(jnp.int32) % g
        cx = coord_x.astype(jnp.int32) % g
        oy, ox = cy % n, cx % n
        x = sub
        if apply_fft:
            x = _phase_roll_fourier(x, oy, ox, shifted=True)
            x = fft2_shift_pair(x, inverse=True)
            pre, pim = _mask_pieces(x, oy, ox, pad_rows=pad)
        else:
            pre, pim = _quadrant_pieces(x, coord_y, coord_x, g)
            z = jnp.zeros((pad, p, n, n), pre.dtype)
            pre, pim = jnp.concatenate([pre, z]), jnp.concatenate([pim, z])
        return pre.reshape(m_pad, 8, d8), pim.reshape(m_pad, 8, d8)

    @partial(jax.jit, static_argnums=3)
    def one_stripe(pieces, st, ln, rows):
        blocks = _grid_add_ranges_call(pieces, shim, st, ln, interpret)
        return tuple(
            b.reshape(rows, nbx, p, n, n)
            .transpose(2, 0, 3, 1, 4)
            .reshape(p, rows * n, g)
            for b in blocks
        )

    return prep, one_stripe


def subgrids_to_grid_ranges_streamed(
    sub: Pair, coord_x, coord_y, grid_size: int, apply_fft: bool = True,
    interpret=None, plan: GridAddRangePlan | None = None,
    merge: int | None = None, consume=None,
):
    """subgrids_to_grid_ranges for grids near HBM capacity (e.g. 16384²
    full-pol = 8.6 GB split-pair output): the masked piece array is
    prepared ONCE in its own jit, then each block-row stripe runs in its
    own jit producing a [P, rows, G] grid band — peak liveness is the
    pieces + completed bands + one stripe's transients (a fused pass
    would hold the [NBp, d] block array AND the assembled grid, ~17 GB).

    Returns (re_bands, im_bands): tuples of [P, rows, G] arrays in row
    order, deliberately not concatenated (the concat is one more
    full-grid copy — exactly what OOMs at this scale).

    merge: blocks per grid step (see GridAddMergedPlan) — None
    auto-selects (sparse plans merge 16; dense plans keep the per-block
    kernel, whose windows would blow up under merging); 0 forces
    per-block.

    consume: optional per-band reducer (band_pair -> small arrays). When
    set, each full [P, rows, G] band pair is reduced as soon as its
    stripe is issued and the big buffers are dropped, with a 2-stripe
    pipeline throttle — PJRT allocates outputs at ENQUEUE time, so an
    unthrottled loop allocates every band before the first stripe
    executes (~8.6 GB of transient at 16384², the OOM). Benchmarks pass
    a corner-slice; real consumers can write bands out or reduce them."""
    from .pallas.common import use_interpret

    if interpret is None:
        interpret = use_interpret()
    s, p, n, _ = sub[0].shape
    g = grid_size
    d = p * n * n
    if plan is None:
        plan = plan_grid_add_ranges(coord_x, coord_y, grid_size, n)
    if d % 1024:
        raise ValueError("streamed ranges needs a lane-divisible payload")
    if merge is None:
        # IDG_GRID_MERGE overrides the auto-pick for merge-width A/Bs.
        # Auto tries the widest group the geometry supports: the round-5
        # sweep at 16384² measured 336.7 (m64) / 349.5 (m32) / 353.7 ms
        # (m16) — wider groups amortize more per-step fixed cost, and
        # plan_grid_add_merged declines incompatible geometries so the
        # ladder falls through safely.
        from ..config import get_env_var

        nb = plan.nby * plan.nbx
        sparse = nb >= 8 * plan.nr_subgrids
        env = get_env_var("IDG_GRID_MERGE", -1)
        candidates = (
            [env] if env >= 0 else ([64, 32, 16] if sparse else [])
        )
    else:
        candidates = [merge]
    for m_try in candidates:
        if not m_try:
            break
        mplan = plan_grid_add_merged(plan, m_try)
        if mplan is not None:
            return _subgrids_to_grid_merged_streamed(
                sub, coord_x, coord_y, g, apply_fft, interpret, plan,
                mplan, consume,
            )
    prep, one_stripe = _ranges_streamed_fns(
        g, p, n, s, apply_fft, plan.w, plan.nr_subgrids, plan.nbx,
        interpret,
    )
    pieces = prep(sub, coord_x, coord_y)
    nbx = plan.nbx
    nb = plan.nby * plan.nbx
    stripe = max(nbx, (MAX_RANGE_BLOCKS // nbx) * nbx)
    # Upload the per-stripe range tables once per plan (memoized on the
    # plan object): per-call jnp.asarray(host) costs a tunnel round trip
    # per stripe per timing rep (~18 ms/call at 16384²).
    tabs = getattr(plan, "_streamed_tables", None)
    if tabs is None or tabs[0] != stripe:
        tabs = (stripe, [
            (
                jnp.asarray(np.ascontiguousarray(plan.starts[:, lo:hi])),
                jnp.asarray(np.ascontiguousarray(plan.lens[:, lo:hi])),
                (hi - lo) // nbx,
            )
            for lo, hi in (
                (lo, min(lo + stripe, nb))
                for lo in range(0, nb, stripe)
            )
        ])
        plan._streamed_tables = tabs
    re_bands, im_bands = [], []
    consumed = []
    for st, ln, rows in tabs[1]:
        band = one_stripe(pieces, st, ln, rows)
        if consume is not None:
            consumed.append(consume(band))
            # throttle every 4th stripe (each host sync costs ~10 ms over
            # the tunnel; a 4-deep backlog stays well under HBM capacity)
            if len(consumed) % 4 == 0:
                jax.block_until_ready(consumed[-4])
        else:
            re_bands.append(band[0])
            im_bands.append(band[1])
    if consume is not None:
        return consumed
    return tuple(re_bands), tuple(im_bands)


@lru_cache(maxsize=None)
def _merged_streamed_fns(g: int, p: int, n: int, s: int, apply_fft: bool,
                         m: int, wm: int, nbx: int, kmiss: int,
                         interpret: bool):
    """Cached jitted (prep, one_stripe) for the MERGED streamed path.
    Pieces are window-padded for wm (not the per-block plan's w); the
    stripe body runs the merged kernel, patches the ≤kmiss wrap misses
    via a scatter-add (padded entries point at a guaranteed-zero pad
    piece row and block 0), and assembles the band."""
    d = p * n * n
    d8 = d // 8
    pad = _pad_to_windows(4 * s, wm)
    m_pad = 4 * s + pad

    @jax.jit
    def prep(sub, coord_x, coord_y):
        cy = coord_y.astype(jnp.int32) % g
        cx = coord_x.astype(jnp.int32) % g
        oy, ox = cy % n, cx % n
        x = sub
        if apply_fft:
            x = _phase_roll_fourier(x, oy, ox, shifted=True)
            x = fft2_shift_pair(x, inverse=True)
            pre, pim = _mask_pieces(x, oy, ox, pad_rows=pad)
        else:
            pre, pim = _quadrant_pieces(x, coord_y, coord_x, g)
            z = jnp.zeros((pad, p, n, n), pre.dtype)
            pre, pim = jnp.concatenate([pre, z]), jnp.concatenate([pim, z])
        return pre.reshape(m_pad, 8, d8), pim.reshape(m_pad, 8, d8)

    @partial(jax.jit, static_argnums=7)
    def one_stripe(pieces, st, ln, gb, go, miss_rows, miss_blocks, rows):
        blocks = _grid_add_ranges_merged_call(
            pieces, m, wm, st, ln, gb, go, interpret
        )
        if kmiss:
            # wrap-miss patch: a handful of scatter-adds (padded entries
            # point at a zero pad piece row and block 0)
            blocks = tuple(
                b.at[miss_blocks].add(jnp.take(pc, miss_rows, axis=0))
                for b, pc in zip(blocks, pieces)
            )
        return tuple(
            b.reshape(rows, nbx, p, n, n)
            .transpose(2, 0, 3, 1, 4)
            .reshape(p, rows * n, g)
            for b in blocks
        )

    return prep, one_stripe


def _subgrids_to_grid_merged_streamed(sub, coord_x, coord_y, g, apply_fft,
                                      interpret, plan, mplan, consume=None):
    s, p, n, _ = sub[0].shape
    nbx = plan.nbx
    nb = plan.nby * plan.nbx
    m, wm = mplan.m, mplan.wm
    stripe = max(nbx, (MAX_RANGE_BLOCKS // nbx) * nbx)
    # per-stripe miss lists, padded to one static width
    per = []
    for lo in range(0, nb, stripe):
        hi = min(lo + stripe, nb)
        in_s = (mplan.miss_blocks >= lo) & (mplan.miss_blocks < hi)
        per.append((mplan.miss_rows[in_s], mplan.miss_blocks[in_s] - lo))
    kmiss = max((len(r) for r, _ in per), default=0)
    prep, one_stripe = _merged_streamed_fns(
        g, p, n, s, apply_fft, m, wm, nbx, kmiss, interpret
    )
    pieces = prep(sub, coord_x, coord_y)
    pad_row = 4 * s + _pad_to_windows(4 * s, wm) - 1   # guaranteed zero
    tabs = getattr(plan, "_merged_tables", None)
    if tabs is None or tabs[0] != (stripe, m):
        rows_list = []
        for i, lo in enumerate(range(0, nb, stripe)):
            hi = min(lo + stripe, nb)
            mr = np.full(kmiss, pad_row, np.int32)
            mb = np.zeros(kmiss, np.int32)
            mr[:len(per[i][0])] = per[i][0]
            mb[:len(per[i][1])] = per[i][1]
            rows_list.append((
                jnp.asarray(np.ascontiguousarray(plan.starts[:, lo:hi])),
                jnp.asarray(np.ascontiguousarray(plan.lens[:, lo:hi])),
                jnp.asarray(
                    np.ascontiguousarray(mplan.gbase[:, lo // m:hi // m])),
                jnp.asarray(np.ascontiguousarray(mplan.gocc[lo // m:hi // m])),
                jnp.asarray(mr), jnp.asarray(mb),
                (hi - lo) // nbx,
            ))
        tabs = ((stripe, m), rows_list)
        plan._merged_tables = tabs
    re_bands, im_bands = [], []
    consumed = []
    for st, ln, gb, go, mr, mb, rows in tabs[1]:
        band = one_stripe(pieces, st, ln, gb, go, mr, mb, rows)
        if consume is not None:
            consumed.append(consume(band))
            # throttle every 4th stripe (each host sync costs ~10 ms over
            # the tunnel; a 4-deep backlog stays well under HBM capacity)
            if len(consumed) % 4 == 0:
                jax.block_until_ready(consumed[-4])
        else:
            re_bands.append(band[0])
            im_bands.append(band[1])
    if consume is not None:
        return consumed
    return tuple(re_bands), tuple(im_bands)


def subgrids_to_grid_ranges_local(
    sub: Pair, coord_x, coord_y, grid_size: int, tstarts, lens, w: int,
    interpret=None, grid_in: Pair | None = None,
) -> Pair:
    """shard_map-body variant of subgrids_to_grid_ranges: the [4, NBp]
    range tables arrive as TRACED arrays (per-shard values, uniform
    shapes across the mesh) and w is the mesh-global window size, so one
    traced program serves every shard. No host-side checks — callers
    guarantee per-shard block-sorted coords (see
    parallel.sharded.shard_observation_block_sorted). Returns this
    shard's PARTIAL [P, G, G] grid pair; the caller reduces with
    psum / psum_scatter."""
    from .pallas.common import use_interpret

    if interpret is None:
        interpret = use_interpret()
    s, p, n, _ = sub[0].shape
    g = grid_size
    d = p * n * n
    d8 = d // 8
    cy = coord_y.astype(jnp.int32) % g
    cx = coord_x.astype(jnp.int32) % g
    oy, ox = cy % n, cx % n
    x = _phase_roll_fourier(sub, oy, ox, shifted=True)
    x = fft2_shift_pair(x, inverse=True)
    tpad = _pad_to_windows(s, w)
    z = jnp.zeros((tpad, p, n, n), x[0].dtype)
    tiles = tuple(
        jnp.concatenate([v, z]).reshape(s + tpad, 8, d8) for v in x
    )
    oyx = jnp.concatenate([
        jnp.stack([oy, ox], axis=-1).astype(jnp.int32),
        jnp.zeros((tpad, 2), jnp.int32),
    ]).reshape(s + tpad, 1, 2)
    nbp = tstarts.shape[1]
    if nbp > MAX_RANGE_BLOCKS:
        # stripe the block axis to bound the SMEM scalar tables (same
        # budget as _grid_add_ranges_tiles; the tables are traced here
        # but their SHAPES are static, so static-bound slices work)
        stripes = []
        for lo in range(0, nbp, MAX_RANGE_BLOCKS):
            hi = min(lo + MAX_RANGE_BLOCKS, nbp)
            stripes.append(_grid_add_ranges_tiles_call(
                tiles, oyx, w, n, tstarts[:, lo:hi], lens[:, lo:hi],
                interpret,
            ))
        blocks = tuple(
            jnp.concatenate([st[i] for st in stripes]) for i in range(2)
        )
    else:
        blocks = _grid_add_ranges_tiles_call(tiles, oyx, w, n, tstarts,
                                             lens, interpret)
    return _blocks_to_grid(
        tuple(b.reshape(nbp, d) for b in blocks), g // n, g // n, n, g, p,
        grid_in,
    )


def _grid_add_vmem_scatter(pieces: Pair, plan: GridAddPlan, bids: np.ndarray,
                           interpret, chunk: int = 512) -> Pair:
    """Piece scatter with the GRID resident in VMEM (grids ≤
    VMEM_GRID_LIMIT per split component, e.g. the default 1024² full-pol
    = 16 MB): pieces stream CONTIGUOUSLY through the pipeliner in
    `chunk`-piece blocks (big sequential DMAs — the gather formulation's
    147k slot-indexed row DMAs cost ~0.94 µs EACH on this platform, a
    flat 138 ms whatever the lookahead), and the body scatters each piece
    into the whole-array revisited output by a dynamic leading-axis
    VMEM read-modify-write (bisect-verified legal, unlike dynamic DMA
    offsets). No slot table, no sentinel padding — per-piece block ids
    ride as one [4S] scalar-prefetch array."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nbp = plan.slots.shape[0]
    m, eight, d8 = pieces[0].shape
    ch = min(chunk, m)
    m_pad = -(-m // ch) * ch
    bids_pad = np.zeros(m_pad, np.int32)
    bids_pad[:m] = bids
    bids_dev = jnp.asarray(bids_pad)

    def kernel(bids_ref, rows_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            o_ref[...] = jnp.zeros_like(o_ref)

        def body(t, _):
            b = bids_ref[i * ch + t]
            o_ref[b] = o_ref[b] + rows_ref[t]
            return 0

        lax.fori_loop(0, ch, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m_pad // ch,),
        in_specs=[
            pl.BlockSpec((ch, eight, d8), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nbp, eight, d8), lambda i, *_: (0, 0, 0)),
    )
    out = []
    for v in pieces:
        rows = v
        if m_pad != m:
            rows = jnp.concatenate(
                [rows, jnp.zeros((m_pad - m, eight, d8), rows.dtype)]
            )
        out.append(pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nbp, eight, d8), jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
        )(bids_dev, rows))
    return tuple(out)


def subgrids_to_grid_ranges(
    sub: Pair, coord_x, coord_y, grid_size: int, apply_fft: bool = True,
    interpret=None, grid_in: Pair | None = None,
    plan: GridAddRangePlan | None = None,
    tiles_pair: Pair | None = None,
) -> Pair:
    """Grid-add via the range-read Pallas kernel (_grid_add_ranges).

    REQUIRES block-sorted coords (block_sort_order); raises otherwise
    when planning. This is the fast path a production pipeline gets by
    sorting metadata once at observation setup: contiguous piece runs →
    8 static-size window DMAs per block instead of per-piece dynamic
    accesses (which cost ~1 µs each on this platform, however issued).

    With apply_fft=True the per-tile roll rides the subgrid iDFT as
    Fourier phases (_phase_roll_fourier) and the quadrant masks are pure
    elementwise ops — the whole producer stays row-major and fuses into
    the piece concat, where the roll-einsum path pays ~94 ms of S-minor
    relayout copies at the default problem.

    `tiles_pair` supplies PRE-TRANSFORMED tiles (phase-rolled iDFT
    output, e.g. from the fused gridder epilogue,
    pallas.gridder.gridder_pallas_v6_pieces) and skips the producer
    entirely; `sub` is ignored and apply_fft must be True. Entries may
    be [S, P, N, N] (padded/reshaped here) or ALREADY in the kernel's
    native padded row form [R, N, N·P] (element (i, p·N + j)) with
    R ≥ S + tile_pad_rows(plan) (requires `plan`, tile path only): the
    fused gridder epilogue emits that form directly (rows_out=True) and
    the range kernel reads it natively, so the composition has no
    boundary op at all — the 4-D form's 32-lane trailing dim is
    physically lane-padded 4× under T(8,128) and cost ~10.7 ms/pass of
    XLA pad+relayout copies at the default problem (round-5 trace)."""
    from .pallas.common import use_interpret

    if interpret is None:
        interpret = use_interpret()
    if tiles_pair is not None and not apply_fft:
        raise ValueError("tiles_pair implies apply_fft=True (the tiles "
                         "are already phase-rolled iDFT output)")
    rows_form = tiles_pair is not None and tiles_pair[0].ndim == 3
    if rows_form:
        if plan is None:
            raise ValueError("row-form tiles_pair requires an explicit "
                             "plan (S/N are not derivable from the "
                             "padded row array)")
        s, n = plan.nr_subgrids, plan.subgrid_size
        if tiles_pair[0].shape[1] != n:
            raise ValueError(
                f"row-form tiles must be [R, N, N·P] with N = "
                f"{n}; got {tiles_pair[0].shape}")
        p = tiles_pair[0].shape[2] // n
    else:
        s, p, n, _ = (tiles_pair if tiles_pair is not None else sub)[0].shape
    d = p * n * n
    if plan is None:
        plan = plan_grid_add_ranges(coord_x, coord_y, grid_size, n)
    if d % 1024:
        if tiles_pair is not None:
            raise ValueError("tiles_pair requires the range-kernel row "
                             "size P·N² to be a multiple of 1024")
        if apply_fft:
            sub = fft2_pair(fftshift2_pair(sub), inverse=True)
            sub = fftshift2_pair(sub)
        return subgrids_to_grid_bucketed(
            sub, coord_x, coord_y, grid_size, apply_fft=False,
            grid_in=grid_in,
        )
    d8 = d // 8
    cy = coord_y.astype(jnp.int32) % grid_size
    cx = coord_x.astype(jnp.int32) % grid_size
    oy, ox = cy % n, cx % n
    if apply_fft and plan.nbp <= 2 * s:
        # tile path: roll rides the iDFT as Fourier phases, quadrant
        # masking happens in-kernel — no materialized piece array
        tpad = tile_pad_rows(plan)
        if rows_form:
            r = tiles_pair[0].shape[0]
            if r < s + tpad:
                raise ValueError(
                    f"row-form tiles have {r} rows; the plan needs at "
                    f"least {s + tpad} (S + tile_pad_rows)")
            tiles = tiles_pair
            tpad = r - s  # windows may read any padded row
        else:
            if tiles_pair is not None:
                x = tiles_pair
            else:
                x = _phase_roll_fourier(sub, oy, ox, shifted=True)
                x = fft2_shift_pair(x, inverse=True)
            z = jnp.zeros((tpad, p, n, n), x[0].dtype)
            tiles = tuple(
                jnp.concatenate([v, z]).reshape(s + tpad, 8, d8) for v in x
            )
        oyx = jnp.concatenate([
            jnp.stack([oy, ox], axis=-1).astype(jnp.int32),
            jnp.zeros((tpad, 2), jnp.int32),
        ]).reshape(s + tpad, 1, 2)
        blocks = _grid_add_ranges_tiles(tiles, oyx, plan, interpret,
                                        row_form=rows_form)
        if rows_form:
            # blocks come back in the (i, p·N + j) row form — convert to
            # the flat (p, i, j) block order _blocks_to_grid expects
            # (nbp·d floats, ~0.1 ms at the default problem)
            blocks = tuple(
                b.reshape(plan.nbp, n, p, n).transpose(0, 2, 1, 3)
                for b in blocks
            )
    elif apply_fft:
        # sparse plans (blocks ≫ subgrids, e.g. lofar4096/8192²): the
        # per-step in-kernel mask compares dominate on mostly-empty
        # blocks — materialize the masked pieces once and run the lean
        # piece kernel instead (measured 58.4 vs 45.8 ms at lofar4096)
        pad = range_pad_rows(plan)
        m_pad = 4 * s + pad
        if rows_form:
            raise ValueError("row-form tiles_pair is tile-path only "
                             "(sparse plans materialize masked pieces); "
                             "pass 4-D tiles for nbp > 2·S plans")
        if tiles_pair is not None:
            x = tiles_pair
        else:
            x = _phase_roll_fourier(sub, oy, ox, shifted=True)
            x = fft2_shift_pair(x, inverse=True)
        pre, pim = _mask_pieces(x, oy, ox, pad_rows=pad)
        blocks = _grid_add_ranges(
            (pre.reshape(m_pad, 8, d8), pim.reshape(m_pad, 8, d8)),
            plan, interpret,
        )
    else:
        pad = range_pad_rows(plan)
        m_pad = 4 * s + pad
        pieces = _quadrant_pieces(sub, coord_y, coord_x, grid_size)
        z = jnp.zeros((pad, p, n, n), pieces[0].dtype)
        pre, pim = (jnp.concatenate([v, z]) for v in pieces)
        blocks = _grid_add_ranges(
            (pre.reshape(m_pad, 8, d8), pim.reshape(m_pad, 8, d8)),
            plan, interpret,
        )
    return _blocks_to_grid(
        tuple(b.reshape(plan.nbp, d) for b in blocks), plan.nby, plan.nbx,
        plan.subgrid_size, plan.grid_size, p, grid_in,
    )


def subgrids_to_grid_pallas(
    sub: Pair, coord_x, coord_y, grid_size: int, apply_fft: bool = True,
    interpret=None, grid_in: Pair | None = None,
    plan: GridAddPlan | None = None, rows_per_step: int = 8,
    mode: str = "auto",
) -> Pair:
    """Grid-add with the slot reduction as a Pallas kernel. Two device
    formulations, picked by `mode` ("auto" | "vmem" | "gather"):

    - "vmem": pieces stream sequentially and scatter into a VMEM-resident
      grid (dynamic leading-axis RMW). Fastest by far, but the whole
      [NB, N, N·P] block array must fit scoped VMEM (default 1024²
      full-pol = 16 MB: yes; 4096²: no).
    - "gather": scalar-prefetch slot-table gather (below).

    Same host slot plan as subgrids_to_grid_bucketed, but the irregular
    piece gather runs through data-dependent INPUT BlockSpec index maps:
    the slot table rides in SMEM as a scalar-prefetch arg, the grid is
    (block, cap/K), and each step's K row inputs map to the slot-indexed
    piece rows — Mosaic's pipeliner then streams the (dynamic-offset) row
    DMAs double-buffered while the body does K masked adds into the
    revisited output block. Sentinel slots are clamped to the last row in
    the index map and masked out of the accumulate in the body.

    Why this exact formulation (all alternatives measured on v5e/axon):
    - lax gather of slot rows: latency-bound ~20 µs/row (2.8 s/pass).
    - lax.scatter_add windows: ~13 µs/window (333 ms/pass).
    - Pallas with data-dependent OUTPUT blocks: 39-135 µs/step (defeats
      the pipeliner's block revisiting).
    - Manual make_async_copy with DATA-DEPENDENT source offsets: crashes
      this platform's Mosaic compile helper outright (subprocess exit 1;
      static-offset manual DMA compiles fine — bisected 2026-08-17).
    Data-dependent input index maps are the one dynamic-gather construct
    this toolchain both accepts and pipelines."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .pallas.common import use_interpret

    if interpret is None:
        interpret = use_interpret()
    if plan is None:
        plan = plan_grid_add(coord_x, coord_y, grid_size, sub[0].shape[2])
    if apply_fft:
        sub = fft2_pair(fftshift2_pair(sub), inverse=True)
        sub = fftshift2_pair(sub)
    s, p, n, _ = sub[0].shape
    d = p * n * n
    if d % 1024:
        # rows ride as [m, 8, d/8] so each gathered block is a full
        # (8, d/8) tile (Mosaic requires trailing block dims equal to the
        # array dims or (8,128)-divisible — a (1, d) block is rejected);
        # odd shapes take the XLA reduction instead.
        return subgrids_to_grid_bucketed(
            sub, coord_x, coord_y, grid_size, apply_fft=False,
            plan=plan, grid_in=grid_in,
        )
    d8 = d // 8
    pre, pim = _quadrant_pieces(sub, coord_y, coord_x, grid_size)
    nbp, cap = plan.slots.shape
    m = 4 * s
    if mode == "auto":
        mode = ("vmem" if nbp * d * 4 <= VMEM_GRID_LIMIT else "gather")
    if mode == "vmem" and plan.piece_blocks is None:
        # a hand-built/deserialized plan without the vmem kernel's
        # routing input — take the gather formulation instead of failing
        # deep inside _grid_add_vmem_scatter with a broadcast error
        mode = "gather"
    if mode == "vmem":
        blocks = _grid_add_vmem_scatter(
            (pre.reshape(m, 8, d8), pim.reshape(m, 8, d8)),
            plan, plan.piece_blocks, interpret,
        )
        return _blocks_to_grid(
            tuple(b.reshape(nbp, d) for b in blocks), plan.nby, plan.nbx,
            plan.subgrid_size, plan.grid_size, p, grid_in,
        )
    K = rows_per_step
    cap_k = -(-cap // K)
    slots_h = plan.slots
    if cap_k * K != cap:
        slots_h = np.pad(slots_h, ((0, 0), (0, cap_k * K - cap)),
                         constant_values=m)
    slots_dev = jnp.asarray(slots_h.reshape(-1))     # [nbp · cap_k · K]
    capp = cap_k * K

    def kernel(slots_ref, *refs):
        row_refs = refs[:K]
        o_ref = refs[K]
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            o_ref[...] = jnp.zeros_like(o_ref)

        acc = o_ref[...]
        for k in range(K):
            w = jnp.where(
                slots_ref[(i * cap_k + j) * K + k] < m, 1.0, 0.0
            ).astype(jnp.float32)
            acc = acc + w * row_refs[k][...]
        o_ref[...] = acc

    def row_spec(k):
        return pl.BlockSpec(
            (1, 8, d8),
            lambda i, j, slots, k=k: (
                jnp.minimum(slots[(i * cap_k + j) * K + k], m - 1), 0, 0
            ),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbp, cap_k),
        in_specs=[row_spec(k) for k in range(K)],
        out_specs=pl.BlockSpec((1, 8, d8), lambda i, j, *_: (i, 0, 0)),
    )
    blocks = []
    for v in (pre, pim):
        rows = v.reshape(m, 8, d8)
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nbp, 8, d8), jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(slots_dev, *([rows] * K))
        blocks.append(out.reshape(nbp, d))
    return _blocks_to_grid(tuple(blocks), plan.nby, plan.nbx,
                           plan.subgrid_size, plan.grid_size, p, grid_in)
