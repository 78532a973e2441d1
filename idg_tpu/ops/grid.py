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

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

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
    a padded [P, G+N, G+N] grid, then fold the wrap margins back.

    One lax.scatter_add with N×N UPDATE WINDOWS — orders of magnitude
    faster on TPU than the elementwise-index formulation (each window is a
    dynamic-slice-add, not S·N² scattered elements). Coordinates are taken
    mod G, so every window lands in-bounds of the padded grid; the N-wide
    right/bottom margins are then added onto the opposite edges, which is
    exactly periodic wrap."""
    s_count, p, n, _ = tiles.shape
    g = grid_size
    padded = jnp.zeros((p, g + n, g + n), tiles.dtype)
    idx = jnp.stack([cy % g, cx % g], axis=-1)       # [S, 2]
    dn = lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(1, 2),
    )
    padded = lax.scatter_add(
        padded, idx, tiles, dn,
        indices_are_sorted=False, unique_indices=False,
    )
    # fold x margin, then y margin (periodic wrap)
    main = padded[:, :, :g].at[:, :, :n].add(padded[:, :, g:])
    return main[:, :g, :].at[:, :n, :].add(main[:, g:, :])


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
# Pallas grid-add: block-bucketed accumulation (no XLA scatter)
# --------------------------------------------------------------------------

def _quadrant_pieces(sub: Pair, coord_y, coord_x, grid_size: int,
                     block_w: int):
    """Decompose tiles into block-aligned quadrant pieces (XLA-side staging).

    Grid blocked N rows × `block_w` cols (block_w = 128 on hardware: Mosaic
    requires the trailing block dim to be lane-divisible, so N-wide blocks
    are not lowerable). A tile at (cy, cx) intersects up to 4 blocks; the
    piece for quadrant (qy, qx) is the tile rolled to its in-block offset
    inside an [N, block_w] window and masked to that quadrant — so every
    piece drops whole into ONE aligned block at its final in-block position
    (grid-edge wrap handled by the mod on block ids). Returns
    (pieces_re, pieces_im, block_ids, first) sorted by block id; `first`
    marks each block's first visit (the kernel reads the aliased grid
    block there instead of accumulating, so untouched blocks cost nothing).
    """
    re, im = sub
    s, p, n, _ = re.shape
    g = grid_size
    bw = block_w
    nby = g // n
    nbx = g // bw
    assert g % n == 0, "grid_size must be a multiple of subgrid_size"
    assert g % bw == 0, "grid_size must be a multiple of the block width"
    cy = coord_y.astype(jnp.int32) % g
    cx = coord_x.astype(jnp.int32) % g
    by, bx = cy // n, cx // bw
    oy, ox = cy % n, cx % bw

    # roll each tile into its [n, bw] window:
    #   rolled[(oy+y)%n, (ox+x)%bw] = t[y, x]
    # (x-pad the tile to bw with zeros so out-of-extent columns read 0)
    rows = (jnp.arange(n, dtype=jnp.int32)[None, :] - oy[:, None]) % n  # [S, n]
    cols = (jnp.arange(bw, dtype=jnp.int32)[None, :] - ox[:, None]) % bw
    re_p = jnp.pad(re, ((0, 0), (0, 0), (0, 0), (0, bw - n))) if bw > n else re
    im_p = jnp.pad(im, ((0, 0), (0, 0), (0, 0), (0, bw - n))) if bw > n else im
    rolled_re = re_p[
        jnp.arange(s)[:, None, None, None],
        jnp.arange(p)[None, :, None, None],
        rows[:, None, :, None],
        cols[:, None, None, :],
    ]
    rolled_im = im_p[
        jnp.arange(s)[:, None, None, None],
        jnp.arange(p)[None, :, None, None],
        rows[:, None, :, None],
        cols[:, None, None, :],
    ]
    # quadrant masks on the rolled positions
    row_hi = jnp.arange(n, dtype=jnp.int32)[None, :] >= oy[:, None]
    col_hi = jnp.arange(bw, dtype=jnp.int32)[None, :] >= ox[:, None]
    pieces_re, pieces_im, ids = [], [], []
    for qy in (0, 1):
        rmask = row_hi if qy == 0 else ~row_hi
        for qx in (0, 1):
            cmask = col_hi if qx == 0 else ~col_hi
            m = (rmask[:, None, :, None] & cmask[:, None, None, :])
            pieces_re.append(jnp.where(m, rolled_re, 0.0))
            pieces_im.append(jnp.where(m, rolled_im, 0.0))
            ids.append(((by + qy) % nby) * nbx + ((bx + qx) % nbx))
    pieces_re = jnp.concatenate(pieces_re)         # [4S, P, n, bw]
    pieces_im = jnp.concatenate(pieces_im)
    ids = jnp.concatenate(ids)                     # [4S]

    # sort by block id so Mosaic's output-block revisiting keeps each grid
    # block VMEM-resident across its consecutive pieces
    order = jnp.argsort(ids, stable=True)
    ids = ids[order]
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (ids[1:] != ids[:-1]).astype(jnp.int32)]
    )
    return pieces_re[order], pieces_im[order], ids, first


# Bound on the pieces buffer: chunk the subgrid batch so the staged
# [4·chunk, P, N, 128] pieces stay ~1 GB (the aliased grid carries the
# partial sum between chunk calls).
GRID_ADD_CHUNK = 4096


def subgrids_to_grid_pallas(
    sub: Pair, coord_x, coord_y, grid_size: int, apply_fft: bool = True,
    interpret=None, grid_in: Pair | None = None,
) -> Pair:
    """TPU-native grid-add: quadrant-piece staging + a Pallas kernel that
    accumulates pieces into [N, 128]-aligned grid blocks selected by
    scalar-prefetched block ids (128-wide blocks: Mosaic requires the
    trailing block dim to be lane-divisible). Pieces are SORTED by block
    id, so Mosaic's output-block revisiting keeps each block resident in
    VMEM across its consecutive pieces — no XLA scatter, no
    read-modify-write races (grid steps are sequential on the core).

    The output ALIASES `grid_in` (default: a fresh zero grid), so the
    kernel ACCUMULATES into an existing grid — production-IDG semantics for
    multi-pass imaging — and blocks with no pieces cost nothing: only each
    visited block's first piece reads the aliased grid block. Large subgrid
    batches are chunked (GRID_ADD_CHUNK) with the partial sum riding the
    alias between chunk calls."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .pallas.common import use_interpret

    if apply_fft:
        sub = fft2_pair(fftshift2_pair(sub), inverse=True)
        sub = fftshift2_pair(sub)
    s, p, n, _ = sub[0].shape
    g = grid_size
    bw = min(128, g)
    nbx = g // bw
    if interpret is None:
        interpret = use_interpret()
    if grid_in is None:
        grid_in = (
            jnp.zeros((p, g, g), jnp.float32),
            jnp.zeros((p, g, g), jnp.float32),
        )

    def kernel(ids_ref, first_ref, pre_ref, pim_ref, gr_ref, gi_ref,
               outr_ref, outi_ref):
        i = pl.program_id(0)

        @pl.when(first_ref[i] != 0)
        def _init():
            outr_ref[...] = gr_ref[...] + pre_ref[0]
            outi_ref[...] = gi_ref[...] + pim_ref[0]

        @pl.when(first_ref[i] == 0)
        def _acc():
            outr_ref[...] += pre_ref[0]
            outi_ref[...] += pim_ref[0]

    block_idx = lambda i, ids, first: (0, ids[i] // nbx, ids[i] % nbx)
    grid_block = pl.BlockSpec((p, n, bw), block_idx, memory_space=pltpu.VMEM)

    def one_chunk(sub_c: Pair, cx_c, cy_c, grid_pair: Pair) -> Pair:
        pre, pim, ids, first = _quadrant_pieces(sub_c, cy_c, cx_c, g, bw)
        total = pre.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(total,),
            in_specs=[
                pl.BlockSpec((1, p, n, bw), lambda i, ids, first: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p, n, bw), lambda i, ids, first: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                grid_block,
                grid_block,
            ],
            out_specs=(grid_block, grid_block),
        )
        out_shape = (
            jax.ShapeDtypeStruct((p, g, g), jnp.float32),
            jax.ShapeDtypeStruct((p, g, g), jnp.float32),
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret,
            input_output_aliases={4: 0, 5: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(ids, first, pre, pim, grid_pair[0], grid_pair[1])

    grid_pair = grid_in
    for lo in range(0, s, GRID_ADD_CHUNK):
        hi = min(lo + GRID_ADD_CHUNK, s)
        grid_pair = one_chunk(
            (sub[0][lo:hi], sub[1][lo:hi]),
            coord_x[lo:hi], coord_y[lo:hi], grid_pair,
        )
    return grid_pair
