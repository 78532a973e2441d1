"""Pallas gridder ladder — hand-scheduled TPU kernels, one grid step per
subgrid (the analogue of one thread-block per subgrid, gridder_reference.cu:14).

Optimization deltas (each rung documented like the reference's v1..v8 ladder,
SURVEY.md §2.4):

  pallas_v1  naive in-VMEM kernel: full-phase sincos per (t,c,pixel), VPU
             MAC in flat pixel space, time-tiled to bound VMEM (≈ GPU
             gridder_v1's thread-parallel direct form).
  pallas_v2  channel-recurrence phasor: sincos only at channel 0 plus a
             per-(t,pixel) delta; channels advance by one complex multiply;
             per-channel MAC via [P,Tt]×[Tt,N²] MXU dots
             (≈ GPU gridder_v8's phasor recurrence, gridder_v8.cu:135-186).
  pallas_v3  separable phasor (ops/xla/separable.py math): per-axis
             exponentials Φx/Φy + rank-w Taylor of the tiny w·n term; the MAC
             becomes one packed [2N, V]×[V, 2·N·P] MXU matmul per rank with
             only O(V·N) sincos. Fuses W-forming in VMEM (the XLA version
             spills ~100 GB of W traffic to HBM per pass).
  pallas_v4  v3 + mixed-precision MXU passes: the rank-0 term runs bf16_3x
             (hi/lo mantissa split, 3 single-bf16-pass dots); the rank-1
             correction (≤2.5e-3 of the signal) runs single-pass bf16.
  pallas_v5  v4 + channel-recurrence phasor GENERATION: sincos only for the
             channel-0 Φ planes and the per-channel delta (O(N·T) instead of
             O(N·V) transcendentals), c-major lanes, VMEM scratch planes.
             Assumes uniform channel spacing, like GPU v8.
  pallas_v6  v5 + multi-subgrid grid steps: 4 subgrids per step amortize
             per-step fixed costs; W parts write straight into the RHS VMEM
             scratch, formed ONCE — the rank-r Taylor coefficient rides on
             the cheap Φy (LHS) side instead.
  pallas_v7  w-free specialization of v6: rank 1, exact for w ≡ 0 data.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import IDGParams
from ...types import SplitObservation
from ..registry import register
from .common import jones_gridder, kcmul, stage, use_interpret

P_POLS = 4


def _dot_mixed(lhs, rhs, mode: str, transpose_rhs: bool = False, dims=None):
    """MXU matmul with explicit pass control. Mosaic exposes only DEFAULT
    (1 bf16 pass) and HIGHEST (6 passes) — emulate bf16_3x ("3x", f32-quality
    at half the HIGHEST cost) by hi/lo bf16 mantissa splitting.
    `transpose_rhs` contracts rhs's LAST axis (A·Bᵀ); `dims` overrides the
    dot_general dimension numbers entirely (to contract without relayouts)."""
    if dims is None:
        dims = (((1,), (1,)), ((), ())) if transpose_rhs else (((1,), (0,)), ((), ()))

    def d(a, b, precision=None):
        return jax.lax.dot_general(
            a, b, dimension_numbers=dims,
            preferred_element_type=jnp.float32, precision=precision,
        )

    if mode in ("highest", "default"):
        return d(lhs, rhs, mode)
    lh = lhs.astype(jnp.bfloat16)
    ll = (lhs - lh.astype(jnp.float32)).astype(jnp.bfloat16)
    rh = rhs.astype(jnp.bfloat16)
    rl = (rhs - rh.astype(jnp.float32)).astype(jnp.bfloat16)
    if mode == "3x2":
        # 2-pass packed variant for M ≤ 64 dots (the gridder's M = 2N = 64
        # wastes half a 128-row MXU tile): stack the hi/lo LHS split on the
        # M axis so each pass fills the tile, recovering ALL FOUR split
        # products in two passes — one fewer pass than 3x AND full
        # (lh+ll)·(rh+rl) accuracy.
        assert dims[0] == ((1,), (1,)), "3x2 requires the A·Bᵀ orientation"
        m = lhs.shape[0]
        l2 = jnp.concatenate([lh, ll], axis=0)
        pa = d(l2, rh)
        pb = d(l2, rl)
        return (pa[:m] + pa[m:]) + (pb[:m] + pb[m:])
    if mode == "3x2k":
        # 2-pass K-packed variant for K ≤ 64 dots (the degridder's K = 2N =
        # 64 loads only half the MXU's 128-deep contraction): stack the
        # hi/lo splits on the CONTRACTION axis — each pass then sums two of
        # the four split products at the same tile cost. One fewer pass
        # than 3x AND full (lh+ll)·(rh+rl) accuracy.
        assert dims == (((1,), (0,)), ((), ())), "3x2k requires A·B orientation"
        l2 = jnp.concatenate([lh, ll], axis=1)
        ra = jnp.concatenate([rh, rl], axis=0)
        rb = jnp.concatenate([rl, rh], axis=0)
        return d(l2, ra) + d(l2, rb)
    assert mode == "3x", mode
    return d(lh, rh) + (d(lh, rl) + d(ll, rh))



def gridder_precisions(w_rank: int):
    """Gridder MXU pass policy: bf16_3x for the rank-0 signal (A/B-measured
    fastest — the packed M=128 "3x2" variant loses because MXU cost scales
    with M rows streamed); corrections run single-pass bf16 at the default
    rank, full splits for guard-escalated ranks (larger correction
    magnitudes, cf. common.rank_precisions)."""
    return ("3x", "default") if w_rank <= 2 else ("3x",) * w_rank


def _fuse_pack() -> bool:
    """Trace-time knob for the fully-packed fused-DFT schedule (one dot
    per stage instead of the K-packed 2-pass pairs). IDG_FUSE_PACK=1/0
    overrides; see _fused_dft_apply."""
    import os

    return os.environ.get("IDG_FUSE_PACK", "0") == "1"


def _fused_dft_apply(pcs, a2k_ref, b4_refs, N, pack=None):
    """Shared MXU core of the fused grid-stage kernel halves: apply the
    constant pre-split folded-shift DFT factors to a step's per-subgrid
    [N, NP] tiles (roll phases already on the tile — see
    common.fused_dft_factor_inputs). Both stages run K-packed 2-pass
    dots (all four bf16 split products, full quality): stage 1 contracts
    tile rows with the shared hi|lo [Wᵀre; Wᵀim] LHS; stage 2 contracts
    tile columns with the pre-packed hi;lo / lo;hi pol-block-diagonal W
    RHS pairs. When NP is a whole number of 128-lane tiles the stages
    run BATCHED across the step (tiles on columns, then b-blocks
    restacked on rows — lane-aligned, no cross-lane movement): 6 dots
    per step instead of 6·B small ones. For NP % 128 != 0 the restack
    would concatenate vregs at mixed lane offsets (Mosaic rejects it),
    so each subgrid runs its own dots — still with constant factors and
    tile-side phases."""
    NP = pcs[0][0].shape[1]
    batch = len(pcs)
    if pack is None:
        pack = _fuse_pack()

    def _split(x):
        h = x.astype(jnp.bfloat16)
        return h, (x - h.astype(jnp.float32)).astype(jnp.bfloat16)

    def _d(a, b_):
        return jax.lax.dot_general(
            a, b_, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    l2 = a2k_ref[...]                                   # [2N, 2N] hi|lo

    def dot_k(p_):
        ph_, pl_ = _split(p_)
        return _d(l2, jnp.concatenate([ph_, pl_], axis=0)) + \
            _d(l2, jnp.concatenate([pl_, ph_], axis=0))

    b4r_a, b4r_b = b4_refs[0][...], b4_refs[1][...]     # [2NP, NP]
    b4i_a, b4i_b = b4_refs[2][...], b4_refs[3][...]

    def stage2(t2m):
        th, tl = _split(t2m)
        t2 = jnp.concatenate([th, tl], axis=1)
        u1 = _d(t2, b4r_a) + _d(t2, b4r_b)
        u2 = _d(t2, b4i_a) + _d(t2, b4i_b)
        return u1, u2

    if NP % 128 == 0:
        pr = jnp.concatenate([r_ for r_, _ in pcs], axis=1)  # [N, B·NP]
        pi = jnp.concatenate([i_ for _, i_ in pcs], axis=1)
        if pack:
            # fully K/column-packed schedule (kmerge precedent: fewer,
            # larger dots amortize per-pass drain overheads; MXU-internal
            # accumulation regroups the split-product sums — comparator-
            # gated, not bit-identical to the 2-pass form):
            #   stage 1: ONE dot  [2N, 4N] × [4N, 2·B·NP]   (was 4)
            #   stage 2: ONE dot  [B·2N, 4NP] × [4NP, 2NP]  (was 4)
            l2k2 = jnp.concatenate([l2, l2], axis=1)         # [2N, 4N]

            def krhs(p_):
                ph_, pl_ = _split(p_)
                return jnp.concatenate(
                    [jnp.concatenate([ph_, pl_], axis=0),
                     jnp.concatenate([pl_, ph_], axis=0)], axis=0)

            t12 = _d(l2k2, jnp.concatenate([krhs(pr), krhs(pi)], axis=1))
            w = batch * NP
            t1, t2 = t12[:, 0:w], t12[:, w:2 * w]
        else:
            t1 = dot_k(pr)                                   # [2N, B·NP]
            t2 = dot_k(pi)
        tmp_re = t1[0:N] - t2[N:2 * N]
        tmp_im = t2[0:N] + t1[N:2 * N]
        t2m = jnp.concatenate(
            [jnp.concatenate([tmp_re[:, b * NP:(b + 1) * NP],
                              tmp_im[:, b * NP:(b + 1) * NP]], axis=0)
             for b in range(batch)],
            axis=0,
        )                                                    # [B·2N, NP]
        if pack:
            th, tl = _split(t2m)
            # same [th|tl] LHS for both K-pair factors (the _b factors
            # carry the swapped halves themselves)
            tk2 = jnp.concatenate([th, tl, th, tl], axis=1)  # [B·2N, 4NP]
            bmat = jnp.concatenate(
                [jnp.concatenate([b4r_a, b4i_a], axis=1),
                 jnp.concatenate([b4r_b, b4i_b], axis=1)], axis=0)
            u12 = _d(tk2, bmat)                              # [B·2N, 2NP]
            u1, u2 = u12[:, 0:NP], u12[:, NP:2 * NP]
        else:
            u1, u2 = stage2(t2m)
        outs = []
        for b in range(batch):
            lo = b * 2 * N
            outs.append((u1[lo:lo + N] - u2[lo + N:lo + 2 * N],
                         u2[lo:lo + N] + u1[lo + N:lo + 2 * N]))
        return outs

    outs = []
    for p_re, p_im in pcs:
        t1 = dot_k(p_re)
        t2 = dot_k(p_im)
        tmp_re = t1[0:N] - t2[N:2 * N]
        tmp_im = t2[0:N] + t1[N:2 * N]
        u1, u2 = stage2(jnp.concatenate([tmp_re, tmp_im], axis=0))
        outs.append((u1[0:N] - u2[N:2 * N], u2[0:N] + u1[N:2 * N]))
    return outs


def _roll_phase_outer(oy, ox, N, NP, sign):
    """Exact integer-mod roll phases as a complex [N, NP] outer product,
    evaluated at the fftshifted index (grid.py:_phase_roll_fourier
    shifted=True semantics; columns cycle per pol block)."""
    two_pi_n = jnp.float32(sign * 2.0 * 3.141592653589793 / N)
    irow = lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    sk = (irow + N // 2) % N
    ay = two_pi_n * ((sk * oy) % N).astype(jnp.float32)   # [N, 1]
    cy_, sy_ = jnp.cos(ay), jnp.sin(ay)
    jcol = lax.broadcasted_iota(jnp.int32, (1, NP), 1)
    skx = ((jcol % N) + N // 2) % N
    ax = two_pi_n * ((skx * ox) % N).astype(jnp.float32)  # [1, NP]
    cx_, sx_ = jnp.cos(ax), jnp.sin(ax)
    return cy_ * cx_ - sy_ * sx_, sy_ * cx_ + cy_ * sx_


def _epilogue(pix, sph, a1, a2):
    """Jones correction + taper; pix/a1/a2 are per-pol tile lists (any
    consistent tile shape). Returns corrected per-pol (re, im) tiles."""
    corrected = jones_gridder(pix, a1, a2)
    return [(r * sph, i * sph) for (r, i) in corrected]


def _at_specs(last_dim: int, flat: bool):
    """The four metadata-selected aterm blocks (scalar-prefetch index maps)."""
    if flat:
        shape = (1, 1, P_POLS, last_dim)
        idx = lambda which: (
            lambda i, aidx, st1, st2, which=which: (
                aidx[i], (st1 if which == 1 else st2)[i], 0, 0
            )
        )
    else:
        shape = (1, 1, P_POLS, last_dim, last_dim)
        idx = lambda which: (
            lambda i, aidx, st1, st2, which=which: (
                aidx[i], (st1 if which == 1 else st2)[i], 0, 0, 0
            )
        )
    return [
        pl.BlockSpec(shape, idx(1), memory_space=pltpu.VMEM),
        pl.BlockSpec(shape, idx(1), memory_space=pltpu.VMEM),
        pl.BlockSpec(shape, idx(2), memory_space=pltpu.VMEM),
        pl.BlockSpec(shape, idx(2), memory_space=pltpu.VMEM),
    ]


# --------------------------------------------------------------------------
# pallas_v1 / v2: direct kernels in flat pixel space
# --------------------------------------------------------------------------

def _kernel_direct(aidx, st1, st2,
                   uvw_ref, vre_ref, vim_ref, k_ref, po_ref, lmn_ref,
                   sph_ref, a1re_ref, a1im_ref, a2re_ref, a2im_ref,
                   out_re_ref, out_im_ref,
                   *, T, C, N, t_tile, recurrence):
    """phase[t,c,pix] = po[pix] − (u·l + v·m + w·n)[t,pix]·k_c, accumulated
    over (t, c) into [P, N²] (the reference kernel's math,
    gridder_reference.cu:40-107). recurrence=True → v2 (sincos twice per
    (t,pixel), complex-mul per channel; MAC on the MXU)."""
    NN = N * N
    uvw = uvw_ref[0]                      # [T, 3]
    k = k_ref[0]                          # [C]
    po = po_ref[0]                        # [1, N²]
    lmn = lmn_ref[...]                    # [3, N²]
    dk = k[1] - k[0] if C > 1 else jnp.float32(0.0)
    def dot(v, ph):
        # [Tt, P] × [Tt, N²] -> [P, N²], contracting the time axis
        return lax.dot_general(
            v, ph, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision="highest",
        )

    acc_re = jnp.zeros((P_POLS, NN), jnp.float32)
    acc_im = jnp.zeros((P_POLS, NN), jnp.float32)
    for t0 in range(0, T, t_tile):
        u = uvw[t0:t0 + t_tile, 0:1]      # [Tt, 1]
        v = uvw[t0:t0 + t_tile, 1:2]
        w = uvw[t0:t0 + t_tile, 2:3]
        pi = u * lmn[0:1] + v * lmn[1:2] + w * lmn[2:3]      # [Tt, N²]
        if recurrence:
            phase0 = po - pi * k[0]
            ph_re, ph_im = jnp.cos(phase0), jnp.sin(phase0)
            d_re, d_im = jnp.cos(pi * dk), jnp.sin(-(pi * dk))
        for c in range(C):
            if recurrence:
                pc_re, pc_im = ph_re, ph_im
                if c + 1 < C:
                    ph_re, ph_im = kcmul(ph_re, ph_im, d_re, d_im)
            else:
                phase = po - pi * k[c]
                pc_re, pc_im = jnp.cos(phase), jnp.sin(phase)
            vr = vre_ref[0, t0:t0 + t_tile, c, :]            # [Tt, P]
            vi = vim_ref[0, t0:t0 + t_tile, c, :]
            # acc[p, pix] += Σ_t vis[t,p]·phasor[t,pix]  (contract time)
            acc_re = acc_re + dot(vr, pc_re) - dot(vi, pc_im)
            acc_im = acc_im + dot(vr, pc_im) + dot(vi, pc_re)

    sph = sph_ref[...]                    # [1, N²]
    pix = [(acc_re[p:p + 1, :], acc_im[p:p + 1, :]) for p in range(P_POLS)]
    a1 = [(a1re_ref[0, 0, p:p + 1], a1im_ref[0, 0, p:p + 1]) for p in range(P_POLS)]
    a2 = [(a2re_ref[0, 0, p:p + 1], a2im_ref[0, 0, p:p + 1]) for p in range(P_POLS)]
    for p, (r, i) in enumerate(_epilogue(pix, sph, a1, a2)):
        out_re_ref[0, p:p + 1, :] = r
        out_im_ref[0, p:p + 1, :] = i


def _gridder_direct(params, sobs, recurrence, interpret, t_tile, canonical=False):
    stg = stage(params, sobs, canonical)
    S = stg.uvw.shape[0]
    T, C, N = params.nr_timesteps_subgrid, params.nr_channels, params.subgrid_size
    NN = N * N
    l, m = stg.lrow[0], stg.mrow[0]
    lmn = jnp.stack([
        jnp.tile(l[None, :], (N, 1)).reshape(-1),      # l over x
        jnp.tile(m[:, None], (1, N)).reshape(-1),      # m over y
        stg.n_yx.reshape(-1),
    ])                                                  # [3, N²]
    po_full = (
        stg.po_x[:, 0, None, :] + stg.po_y[:, 0, :, None]
    ).reshape(-1, 1, NN)
    if params.w_step != 0.0:
        # the axis-separable parts exclude the (non-separable) w_off·n term
        # (ops/common.phase_offset_parts); add it for the direct kernels
        from ..common import w_offset_scalar

        w_off = w_offset_scalar(params, sobs.metadata)
        po_full = po_full + (
            w_off[:, None, None] * stg.n_yx.reshape(1, 1, NN)
        )
    if interpret is None:
        interpret = use_interpret()
    t_tile = min(t_tile, T)
    while T % t_tile:  # keep every time slice in bounds
        t_tile -= 1
    kernel = functools.partial(
        _kernel_direct, T=T, C=C, N=N, t_tile=t_tile,
        recurrence=recurrence,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, T, 3), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, C, P_POLS), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, C, P_POLS), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NN), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, NN), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NN), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ] + _at_specs(NN, flat=True),
        out_specs=(
            pl.BlockSpec((1, P_POLS, NN), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_POLS, NN), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    out_shape = (
        jax.ShapeDtypeStruct((S, P_POLS, NN), jnp.float32),
        jax.ShapeDtypeStruct((S, P_POLS, NN), jnp.float32),
    )
    re, im = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # the unrolled recurrence body needs ~19 MB scoped VMEM at the
            # perf problem (T=128, C=16) — the 16 MB default OOMs
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(
        stg.aterm_index, stg.station1, stg.station2,
        stg.uvw, stg.vis_re, stg.vis_im, stg.wavenumbers,
        po_full, lmn, stg.sph_flat,
        stg.at_re_flat, stg.at_im_flat, stg.at_re_flat, stg.at_im_flat,
    )
    return re.reshape(S, P_POLS, N, N), im.reshape(S, P_POLS, N, N)


@register(
    "gridder", "pallas_v1",
    "naive Pallas: full-phase sincos per (t,c,pixel), flat-pixel MAC, time-tiled",
    family="pallas",
)
def gridder_pallas_v1(params: IDGParams, sobs: SplitObservation,
                      interpret=None, t_tile: int = 16, canonical=False):
    return _gridder_direct(params, sobs, False, interpret, t_tile, canonical)


@register(
    "gridder", "pallas_v2",
    "channel-recurrence phasor: 2 sincos per (t,pixel), complex-mul per channel, MXU MAC",
    family="pallas", uniform_channels=True, fallback="pallas_v1",
)
def gridder_pallas_v2(params: IDGParams, sobs: SplitObservation,
                      interpret=None, t_tile: int = 8, canonical=False):
    # t_tile=8 keeps the unrolled recurrence chain small enough for the
    # Mosaic compiler (t_tile=32 crashed the remote compile helper).
    return _gridder_direct(params, sobs, True, interpret, t_tile, canonical)


# --------------------------------------------------------------------------
# pallas_v3 / v4: separable-phasor MXU kernel
# --------------------------------------------------------------------------

def _kernel_separable(aidx, st1, st2,
                      upr_ref, vpr_ref, mur_ref, vre_ref, vim_ref,
                      poxc_ref, poyc_ref, mcol_ref, npack_ref,
                      sph_ref, a1re_ref, a1im_ref, a2re_ref, a2im_ref,
                      out_re_ref, out_im_ref,
                      *, V, N, w_rank, precisions, ablate=""):
    """Separable MAC (see ops/xla/separable.py for the math), V-on-lanes
    orientation (every elementwise op runs at full 128-lane width):
      LHS   [2N, V]   = [Φyᵀ_re ; Φyᵀ_im]
      RHSᵀ  [2NP, V]  per rank, row p·N+x: Φxᵀ[x,v]·ṽ_r[p,v]
      prod  [2N, 2NP] via dot_general contracting the shared V axis
      → per-pol [N,N] tiles (rows y, cols p·N+x), native subgrid layout.
    `precisions[r]` sets the MXU pass count per rank (v4: ('3x','default'))."""
    NP = N * P_POLS
    up = upr_ref[0]                                 # [1, V]
    vp = vpr_ref[0]                                 # [1, V]
    mu = mur_ref[0]                                 # [1, V]
    m_col = mcol_ref[...]                           # [N, 1]

    # Φyᵀ [N, V]: po_y[y] − v'_v·m[y]
    phase_y = poyc_ref[0] - m_col * vp              # [N, V]
    # Φxᵀ [N, V]: po_x[x] − u'_v·l[x]
    phase_x = poxc_ref[0] - m_col * up              # [N, V] (l ≡ m grid)
    if ablate == "no_sincos":  # debug: isolate transcendental cost
        lhs = jnp.concatenate([phase_y, phase_y], axis=0)
        phx_re, phx_im = phase_x, -phase_x
    else:
        lhs = jnp.concatenate([jnp.cos(phase_y), jnp.sin(phase_y)], axis=0)
        phx_re = jnp.cos(phase_x)
        phx_im = jnp.sin(phase_x)

    vre = vre_ref[0]                                # [P, V]
    vim = vim_ref[0]

    outs = []
    cr = jnp.ones_like(mu)
    ci = jnp.zeros_like(mu)
    for r in range(w_rank):
        if r:
            # coefficient (iμ)^r/r!: multiply by iμ/r
            cr, ci = -ci * mu / r, cr * mu / r
        parts_re, parts_im = [], []
        for p in range(P_POLS):
            tr = vre[p:p + 1] * cr - vim[p:p + 1] * ci         # [1, V]
            ti = vre[p:p + 1] * ci + vim[p:p + 1] * cr
            w_re, w_im = kcmul(phx_re, phx_im, tr, ti)         # [N, V]
            parts_re.append(w_re)
            parts_im.append(w_im)
        rhs_t = jnp.concatenate(parts_re + parts_im, axis=0)   # [2NP, V]
        if ablate == "no_matmul":  # debug: keep W live, skip the MXU stage
            c_re = lhs[0:N, 0:NP] + rhs_t[0:N, 0:NP]
            c_im = lhs[N:2 * N, 0:NP] + rhs_t[NP:NP + N, 0:NP]
            outs.append((c_re, c_im))
            continue
        if ablate == "tmatmul":  # debug: explicit transposes + Aᵀ·B pattern
            prod = _dot_mixed(
                lhs.T, rhs_t.T, precisions[min(r, len(precisions) - 1)],
                dims=(((0,), (0,)), ((), ())),
            )
        else:
            prod = _dot_mixed(
                lhs, rhs_t, precisions[min(r, len(precisions) - 1)],
                transpose_rhs=True,
            )                                                  # [2N, 2NP]
        c_re = prod[0:N, 0:NP] - prod[N:2 * N, NP:2 * NP]
        c_im = prod[0:N, NP:2 * NP] + prod[N:2 * N, 0:NP]
        outs.append((c_re, c_im))

    npack = npack_ref[...]                                     # [N, P·N]
    pix_re, pix_im = outs[0]
    npow = npack
    for r in range(1, w_rank):
        pix_re = pix_re + outs[r][0] * npow
        pix_im = pix_im + outs[r][1] * npow
        npow = npow * npack

    sph = sph_ref[...]
    pix = [
        (pix_re[:, p * N:(p + 1) * N], pix_im[:, p * N:(p + 1) * N])
        for p in range(P_POLS)
    ]
    a1 = [(a1re_ref[0, 0, p], a1im_ref[0, 0, p]) for p in range(P_POLS)]
    a2 = [(a2re_ref[0, 0, p], a2im_ref[0, 0, p]) for p in range(P_POLS)]
    for p, (r_, i_) in enumerate(_epilogue(pix, sph, a1, a2)):
        out_re_ref[0, p] = r_
        out_im_ref[0, p] = i_


def _gridder_separable(params, sobs, w_rank, precisions, interpret, ablate="",
                       canonical=False):
    return _gridder_separable_run(
        params, stage(params, sobs, canonical), w_rank, precisions,
        interpret, ablate,
    )


def _gridder_separable_run(params, stg, w_rank, precisions, interpret,
                           ablate=""):
    """Launch-only phase: pallas_call on pre-staged device arrays (the
    reference times exactly this, app/CUDA/util.cpp:109-126)."""
    S = stg.uvw.shape[0]
    T, C, N = params.nr_timesteps_subgrid, params.nr_channels, params.subgrid_size
    V = T * C
    npack = jnp.tile(stg.n_yx, (1, P_POLS))        # [N, P·N], col p·N+x
    if interpret is None:
        interpret = use_interpret()
    kernel = functools.partial(
        _kernel_separable, V=V, N=N, w_rank=w_rank, precisions=precisions,
        ablate=ablate,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, 1, V), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, V), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, V), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_POLS, V), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_POLS, V), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 1), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N * P_POLS), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ] + _at_specs(N, flat=False),
        out_specs=(
            pl.BlockSpec((1, P_POLS, N, N), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_POLS, N, N), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    out_shape = (
        jax.ShapeDtypeStruct((S, P_POLS, N, N), jnp.float32),
        jax.ShapeDtypeStruct((S, P_POLS, N, N), jnp.float32),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(
        stg.aterm_index, stg.station1, stg.station2,
        stg.up_row, stg.vp_row, stg.mu_row, stg.vis_re_pv, stg.vis_im_pv,
        stg.po_x_col, stg.po_y_col, stg.mcol, npack, stg.sph,
        stg.at_re, stg.at_im, stg.at_re, stg.at_im,
    )


@register(
    "gridder", "pallas_v3",
    "separable phasor: fused W-forming + packed [2N,V]×[V,2NP] MXU matmul in VMEM",
    family="pallas",
)
def gridder_pallas_v3(params: IDGParams, sobs: SplitObservation,
                      interpret=None, w_rank: int = 2, canonical=False):
    return _gridder_separable(
        params, sobs, w_rank, ("highest",), interpret, canonical=canonical
    )


@register(
    "gridder", "pallas_v4",
    "v3 + mixed-precision MXU: rank-0 bf16_3x, rank-1 correction single-pass bf16",
    family="pallas",
)
def gridder_pallas_v4(params: IDGParams, sobs: SplitObservation,
                      interpret=None, w_rank: int = 2, canonical=False):
    return _gridder_separable(
        params, sobs, w_rank, gridder_precisions(w_rank), interpret, canonical=canonical
    )


# --------------------------------------------------------------------------
# pallas_v5: separable phasor with channel-recurrence generation (c-major)
# --------------------------------------------------------------------------

def _kernel_sep_recur(aidx, st1, st2,
                      uvwr_ref, mur_ref, vre_ref, vim_ref, k_ref,
                      poxc_ref, poyc_ref, mcol_ref, npack_ref,
                      sph_ref, a1re_ref, a1im_ref, a2re_ref, a2im_ref,
                      out_re_ref, out_im_ref,
                      lhs_s, phxr_s, phxi_s,
                      *, V, N, T, C, w_rank, precisions):
    """v4's packed MXU matmul, but the Φ planes are GENERATED by the
    channel recurrence (gridder_v8.cu:135-186 idea applied to phasor
    construction): sincos only for the channel-0 plane and the per-channel
    delta — 2·(base+delta)·2 axes = O(N·T) transcendentals instead of
    O(N·V). Effective visibilities are c-major (v = c·T + t) so each
    channel writes one contiguous lane block of the scratch planes.
    Assumes uniform channel spacing (init.cpp:27-36 data always is)."""
    NP = N * P_POLS
    uvw = uvwr_ref[0]                               # [3, T]
    k0 = k_ref[0, 0]
    dk = k_ref[0, 1] - k0 if C > 1 else jnp.float32(0.0)
    m_col = mcol_ref[...]                           # [N, 1]
    u_row = uvw[0:1, :]                             # [1, T]
    v_row = uvw[1:2, :]

    py = poyc_ref[0] - m_col * (v_row * k0)         # [N, T]
    px = poxc_ref[0] - m_col * (u_row * k0)
    dpy = -(m_col * (v_row * dk))
    dpx = -(m_col * (u_row * dk))
    cy_re, cy_im = jnp.cos(py), jnp.sin(py)
    cx_re, cx_im = jnp.cos(px), jnp.sin(px)
    dy_re, dy_im = jnp.cos(dpy), jnp.sin(dpy)
    dx_re, dx_im = jnp.cos(dpx), jnp.sin(dpx)
    for c in range(C):
        if c and c % 16 == 0:
            # periodic exact resync bounds recurrence drift (engages for C > 16; one extra
            # [N,T] sincos pair per 16 channels)
            kc = k0 + c * dk
            pyc = poyc_ref[0] - m_col * (v_row * kc)
            pxc = poxc_ref[0] - m_col * (u_row * kc)
            cy_re, cy_im = jnp.cos(pyc), jnp.sin(pyc)
            cx_re, cx_im = jnp.cos(pxc), jnp.sin(pxc)
        lo = c * T
        lhs_s[0:N, lo:lo + T] = cy_re
        lhs_s[N:2 * N, lo:lo + T] = cy_im
        phxr_s[:, lo:lo + T] = cx_re
        phxi_s[:, lo:lo + T] = cx_im
        if c + 1 < C:
            cy_re, cy_im = kcmul(cy_re, cy_im, dy_re, dy_im)
            cx_re, cx_im = kcmul(cx_re, cx_im, dx_re, dx_im)
    lhs = lhs_s[...]                                # [2N, V]
    phx_re = phxr_s[...]                            # [N, V]
    phx_im = phxi_s[...]

    mu = mur_ref[0]                                 # [1, V] (c-major)
    vre = vre_ref[0]                                # [P, V] (c-major)
    vim = vim_ref[0]

    outs = []
    cr = jnp.ones_like(mu)
    ci = jnp.zeros_like(mu)
    for r in range(w_rank):
        if r:
            cr, ci = -ci * mu / r, cr * mu / r
        parts_re, parts_im = [], []
        for p in range(P_POLS):
            tr = vre[p:p + 1] * cr - vim[p:p + 1] * ci
            ti = vre[p:p + 1] * ci + vim[p:p + 1] * cr
            w_re, w_im = kcmul(phx_re, phx_im, tr, ti)
            parts_re.append(w_re)
            parts_im.append(w_im)
        rhs_t = jnp.concatenate(parts_re + parts_im, axis=0)   # [2NP, V]
        prod = _dot_mixed(
            lhs, rhs_t, precisions[min(r, len(precisions) - 1)],
            transpose_rhs=True,
        )                                                      # [2N, 2NP]
        c_re = prod[0:N, 0:NP] - prod[N:2 * N, NP:2 * NP]
        c_im = prod[0:N, NP:2 * NP] + prod[N:2 * N, 0:NP]
        outs.append((c_re, c_im))

    npack = npack_ref[...]
    pix_re, pix_im = outs[0]
    npow = npack
    for r in range(1, w_rank):
        pix_re = pix_re + outs[r][0] * npow
        pix_im = pix_im + outs[r][1] * npow
        npow = npow * npack

    sph = sph_ref[...]
    pix = [
        (pix_re[:, p * N:(p + 1) * N], pix_im[:, p * N:(p + 1) * N])
        for p in range(P_POLS)
    ]
    a1 = [(a1re_ref[0, 0, p], a1im_ref[0, 0, p]) for p in range(P_POLS)]
    a2 = [(a2re_ref[0, 0, p], a2im_ref[0, 0, p]) for p in range(P_POLS)]
    for p, (r_, i_) in enumerate(_epilogue(pix, sph, a1, a2)):
        out_re_ref[0, p] = r_
        out_im_ref[0, p] = i_


def _gridder_sep_recur(params, sobs, w_rank, precisions, interpret,
                       canonical=False):
    return _gridder_sep_recur_run(
        params, stage(params, sobs, canonical), w_rank, precisions, interpret
    )


def _gridder_sep_recur_run(params, stg, w_rank, precisions, interpret):
    """Launch-only phase (see _gridder_separable_run)."""
    S = stg.uvw.shape[0]
    T, C, N = params.nr_timesteps_subgrid, params.nr_channels, params.subgrid_size
    V = T * C
    npack = jnp.tile(stg.n_yx, (1, P_POLS))
    if interpret is None:
        interpret = use_interpret()
    kernel = functools.partial(
        _kernel_sep_recur, V=V, N=N, T=T, C=C, w_rank=w_rank,
        precisions=precisions,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, 3, T), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, V), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_POLS, V), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_POLS, V), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 1), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N * P_POLS), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ] + _at_specs(N, flat=False),
        out_specs=(
            pl.BlockSpec((1, P_POLS, N, N), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_POLS, N, N), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * N, V), jnp.float32),
            pltpu.VMEM((N, V), jnp.float32),
            pltpu.VMEM((N, V), jnp.float32),
        ],
    )
    out_shape = (
        jax.ShapeDtypeStruct((S, P_POLS, N, N), jnp.float32),
        jax.ShapeDtypeStruct((S, P_POLS, N, N), jnp.float32),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(
        stg.aterm_index, stg.station1, stg.station2,
        stg.uvw_rows, stg.mu_row_cm, stg.vis_re_pv_cm, stg.vis_im_pv_cm,
        stg.wavenumbers, stg.po_x_col, stg.po_y_col, stg.mcol, npack, stg.sph,
        stg.at_re, stg.at_im, stg.at_re, stg.at_im,
    )


@register(
    "gridder", "pallas_v5",
    "v4 + channel-recurrence phasor generation: O(N·T) sincos, c-major lanes",
    family="pallas", uniform_channels=True, fallback="pallas_v4",
)
def gridder_pallas_v5(params: IDGParams, sobs: SplitObservation,
                      interpret=None, w_rank: int = 2, canonical=False):
    # Uniform channel spacing assumed (reference v8 makes the same
    # assumption; init.cpp frequencies always satisfy it).
    return _gridder_sep_recur(
        params, sobs, w_rank, gridder_precisions(w_rank), interpret, canonical
    )


# Launch-only entry points for the benchmarking harness (stage once, time
# bare launches — the reference's p_run_kernel semantics).
def gridder_pallas_v3_staged(params, stg, interpret=None, w_rank: int = 2):
    return _gridder_separable_run(params, stg, w_rank, ("highest",), interpret)


def gridder_pallas_v4_staged(params, stg, interpret=None, w_rank: int = 2):
    return _gridder_separable_run(params, stg, w_rank, gridder_precisions(w_rank), interpret)


def gridder_pallas_v5_staged(params, stg, interpret=None, w_rank: int = 2):
    return _gridder_sep_recur_run(params, stg, w_rank, gridder_precisions(w_rank), interpret)


# --------------------------------------------------------------------------
# pallas_v6: v5 with multi-subgrid grid steps (fixed-cost amortization)
# --------------------------------------------------------------------------

def _kernel_sep_recur_batch(aidx, st1, st2,
                            uvwr_ref, mur_ref, vre_ref, vim_ref, k_ref,
                            poxc_ref, poyc_ref, mcol_ref, npack_ref, sph_ref,
                            *rest,
                            V, N, T, C, w_rank, precisions, batch,
                            dbuf=False, fuse=False, rows_out=False):
    """v5's body unrolled over `batch` subgrids per grid step: per-step
    fixed costs (DMA setup, grid bookkeeping) amortize across the batch.
    Each subgrid's Jones terms arrive through its own scalar-prefetch-
    indexed aterm blocks (4·batch input specs).

    The rank-r Taylor coefficient (iμ)^r/r! rides on the Φy (LHS) side:
    W = Φx ⊛ vis is formed ONCE (rank 0) and reused by every rank, whose
    LHS is the cheap [2N, V] product Φy ⊛ coef — this replaces the 24·N·V-op
    per-rank W-forming with an 8·N·V-op LHS re-weighting.

    Scratches stay f32 and the bf16 hi/lo splits happen inside _dot_mixed:
    a round-2 A/B showed pre-split bf16 scratches REGRESS (sub-f32-tile
    bf16 stores force packing relayouts per store) and that the packed
    M=128 dot loses to 3 passes at M=64 (MXU cost scales with M rows
    streamed, not occupied tiles).

    `dbuf=True` (round-3 VPU/MXU-overlap schedule): the Φ/W scratches are
    double-buffered by subgrid parity and all dot-dependent VPU work (rank
    combine, Jones epilogue, output stores) is deferred to a second loop.
    With a single scratch set, subgrid b+1's Φ/W-forming (pure VPU) has a
    write-after-read hazard on subgrid b's MXU dot inputs, serializing the
    two units; with per-parity buffers the chains are independent and
    Mosaic's scheduler can run VPU(b+1) under MXU(b)."""
    at_refs = rest[:4 * batch]
    pos = 4 * batch
    if fuse:
        # fused grid-stage epilogue inputs: per-subgrid roll offsets and
        # the folded-shift iDFT factors, pre-split to bf16 hi/lo and
        # K-packed OUTSIDE the kernel (constants — the roll phases ride
        # on the tile, not the factors, so no per-subgrid factor work)
        (oyx_ref, a2k_ref,
         b4ra_ref, b4rb_ref, b4ia_ref, b4ib_ref) = rest[pos:pos + 6]
        pos += 6
    out_re_ref, out_im_ref = rest[pos:pos + 2]
    scr = rest[pos + 2:]
    NP = N * P_POLS
    k0 = k_ref[0, 0]
    dk = k_ref[0, 1] - k0 if C > 1 else jnp.float32(0.0)
    m_col = mcol_ref[...]                           # [N, 1]
    npack = npack_ref[...]
    sph = sph_ref[...]

    deferred = []
    pieces = []
    for b in range(batch):
        lhs_s, phxr_s, phxi_s, rhs_s = (
            scr[4 * (b % 2):4 * (b % 2) + 4] if dbuf else scr[:4]
        )
        uvw = uvwr_ref[b]                           # [3, T]
        u_row = uvw[0:1, :]
        v_row = uvw[1:2, :]
        py = poyc_ref[b] - m_col * (v_row * k0)     # [N, T]
        px = poxc_ref[b] - m_col * (u_row * k0)
        dpy = -(m_col * (v_row * dk))
        dpx = -(m_col * (u_row * dk))
        cy_re, cy_im = jnp.cos(py), jnp.sin(py)
        cx_re, cx_im = jnp.cos(px), jnp.sin(px)
        dy_re, dy_im = jnp.cos(dpy), jnp.sin(dpy)
        dx_re, dx_im = jnp.cos(dpx), jnp.sin(dpx)
        for c in range(C):
            if c and c % 16 == 0:
                # periodic exact resync bounds recurrence drift (engages for C > 16; one extra
                # [N,T] sincos pair per 16 channels)
                kc = k0 + c * dk
                pyc = poyc_ref[b] - m_col * (v_row * kc)
                pxc = poxc_ref[b] - m_col * (u_row * kc)
                cy_re, cy_im = jnp.cos(pyc), jnp.sin(pyc)
                cx_re, cx_im = jnp.cos(pxc), jnp.sin(pxc)
            lo = c * T
            lhs_s[0:N, lo:lo + T] = cy_re
            lhs_s[N:2 * N, lo:lo + T] = cy_im
            phxr_s[:, lo:lo + T] = cx_re
            phxi_s[:, lo:lo + T] = cx_im
            if c + 1 < C:
                cy_re, cy_im = kcmul(cy_re, cy_im, dy_re, dy_im)
                cx_re, cx_im = kcmul(cx_re, cx_im, dx_re, dx_im)
        lhs = lhs_s[...]                            # [2N, V] (Φy re; im)
        phx_re = phxr_s[...]
        phx_im = phxi_s[...]

        mu = mur_ref[b]                             # [1, V]
        vre = vre_ref[b]                            # [P, V]
        vim = vim_ref[b]

        # rank 0: form W = Φx ⊛ vis once, straight into the RHS scratch
        for p in range(P_POLS):
            w_re, w_im = kcmul(phx_re, phx_im, vre[p:p + 1], vim[p:p + 1])
            rhs_s[p * N:(p + 1) * N, :] = w_re
            rhs_s[NP + p * N:NP + (p + 1) * N, :] = w_im
        prods = [_dot_mixed(lhs, rhs_s[...], precisions[0], transpose_rhs=True)]

        # ranks ≥ 1: (iμ)^r/r! rides on the Φy side; the W scratch is reused
        cr = jnp.ones_like(mu)
        ci = jnp.zeros_like(mu)
        for r in range(1, w_rank):
            mode = precisions[min(r, len(precisions) - 1)]
            cr, ci = -ci * mu / r, cr * mu / r
            l1 = jnp.concatenate(
                [lhs[0:N] * cr - lhs[N:2 * N] * ci,
                 lhs[0:N] * ci + lhs[N:2 * N] * cr],
                axis=0,
            )                                       # [2N, V]
            prods.append(_dot_mixed(l1, rhs_s[...], mode, transpose_rhs=True))

        def finish(b=b, prods=prods):
            outs = [
                (p_[0:N, 0:NP] - p_[N:2 * N, NP:2 * NP],
                 p_[0:N, NP:2 * NP] + p_[N:2 * N, 0:NP])
                for p_ in prods
            ]
            pix_re, pix_im = outs[0]
            npow = npack
            for r in range(1, w_rank):
                pix_re = pix_re + outs[r][0] * npow
                pix_im = pix_im + outs[r][1] * npow
                npow = npow * npack

            pix = [
                (pix_re[:, p * N:(p + 1) * N], pix_im[:, p * N:(p + 1) * N])
                for p in range(P_POLS)
            ]
            a1 = [(at_refs[4 * b + 0][0, 0, p], at_refs[4 * b + 1][0, 0, p])
                  for p in range(P_POLS)]
            a2 = [(at_refs[4 * b + 2][0, 0, p], at_refs[4 * b + 3][0, 0, p])
                  for p in range(P_POLS)]
            ep = _epilogue(pix, sph, a1, a2)
            if not fuse:
                if rows_out:
                    # [N, N·P] row form (lane-concat of the per-pol
                    # tiles, same move the fused epilogue pays): the
                    # [S,P,N,N] form's 32-lane trailing dim is
                    # physically lane-padded 4× under T(8,128), so the
                    # 4-D output writes 4× the HBM bytes
                    out_re_ref[b] = jnp.concatenate(
                        [r_ for r_, _ in ep], axis=1)
                    out_im_ref[b] = jnp.concatenate(
                        [i_ for _, i_ in ep], axis=1)
                    return
                for p, (r_, i_) in enumerate(ep):
                    out_re_ref[b, p] = r_
                    out_im_ref[b, p] = i_
                return
            # Fused grid-stage epilogue, per-subgrid half: apply the roll
            # phases to the TILE. piece = Wᵀ·diag(phy)·tile·diag(phx)·W,
            # so the per-subgrid phases commute onto the [N, NP] tile and
            # the iDFT factors stay CONSTANT — scaled tiles are collected
            # here and hit the MXU in ONE batched pass after the b loop
            # (16 tiny per-subgrid dots/step → 4 large ones, round-5
            # rescue of the 93.3 vs 60.5 ms fused-kernel regression).
            pe_re = jnp.concatenate([r_ for r_, _ in ep], axis=1)  # [N, NP]
            pe_im = jnp.concatenate([i_ for _, i_ in ep], axis=1)
            ph_re, ph_im = _roll_phase_outer(
                oyx_ref[b, 0, 0], oyx_ref[b, 0, 1], N, NP, sign=-1.0
            )
            pieces.append((pe_re * ph_re - pe_im * ph_im,
                           pe_re * ph_im + pe_im * ph_re))

        if dbuf:
            # one-deep software pipeline: emit finish(b-1) only after
            # stage(b)+dots(b), so each subgrid's dot-dependent VPU tail
            # fills the shadow of the NEXT subgrid's MXU dots (liveness
            # bounded to two subgrids' prods)
            deferred.append(finish)
            if len(deferred) > 1:
                deferred.pop(0)()
        else:
            finish()
    for fin in deferred:
        fin()

    if fuse:
        # Batched grid-stage epilogue: the whole step's phase-scaled tiles
        # go through the constant folded-shift iDFT factors in (at NP a
        # whole number of lane tiles) 4 dots per step — see
        # _fused_dft_apply for the schedule and its NP%128 fallback.
        outs = _fused_dft_apply(
            pieces, a2k_ref, (b4ra_ref, b4rb_ref, b4ia_ref, b4ib_ref), N,
        )
        for b, (o_re, o_im) in enumerate(outs):
            if rows_out:
                # [N, N·P] row form, written whole: exact (8,128) VMEM
                # tiles at the default size (N·P = 128), no per-pol
                # slicing — the consuming range kernel reads this shape
                # directly (the [S,P,N,N] form's 32-lane trailing dim is
                # physically lane-padded 4× under T(8,128) and XLA can't
                # bitcast it into the range row form; round-5 trace:
                # ~8 ms/pass of boundary copies)
                out_re_ref[b] = o_re
                out_im_ref[b] = o_im
            else:
                for p in range(P_POLS):
                    out_re_ref[b, p] = o_re[:, p * N:(p + 1) * N]
                    out_im_ref[b, p] = o_im[:, p * N:(p + 1) * N]


def _fuse_io(fuse, fuse_oyx, s_pad, B, N, inverse: bool):
    """BlockSpecs + inputs for the fused grid-stage kernel halves (the
    gridder's iDFT epilogue / degridder's forward-DFT prologue): the
    [B, 1, 2] per-step roll offsets and the six pre-split constant factor
    arrays from common.fused_dft_factor_inputs."""
    if not fuse:
        return [], []
    from .common import fused_dft_factor_inputs

    oyx = jnp.asarray(fuse_oyx, jnp.int32).reshape(-1, 1, 2)
    if oyx.shape[0] != s_pad:
        oyx = jnp.pad(oyx, ((0, s_pad - oyx.shape[0]), (0, 0), (0, 0)))
    consts = fused_dft_factor_inputs(N, P_POLS, inverse=inverse)
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i, *_: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    fuse_specs = [
        pl.BlockSpec((B, 1, 2), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        const_spec((2 * N, 2 * N)),
        const_spec((2 * N * P_POLS, N * P_POLS)),
        const_spec((2 * N * P_POLS, N * P_POLS)),
        const_spec((2 * N * P_POLS, N * P_POLS)),
        const_spec((2 * N * P_POLS, N * P_POLS)),
    ]
    return fuse_specs, [oyx, *consts]


def _gridder_sep_recur_batch_run(params, stg, w_rank, precisions, interpret,
                                 batch: int = 4, dbuf: bool = False,
                                 fuse_oyx=None, rows_out: bool = False):
    import dataclasses as _dc

    from .common import _PER_SUBGRID_FIELDS

    S = stg.uvw.shape[0]
    T, C, N = params.nr_timesteps_subgrid, params.nr_channels, params.subgrid_size
    V = T * C
    s_pad = -(-S // batch) * batch
    if s_pad != S:
        pad = s_pad - S
        updates = {
            name: jnp.pad(
                getattr(stg, name),
                [(0, pad)] + [(0, 0)] * (getattr(stg, name).ndim - 1),
            )
            for name in _PER_SUBGRID_FIELDS
            if getattr(stg, name) is not None
        }
        stg = _dc.replace(stg, **updates)
    npack = jnp.tile(stg.n_yx, (1, P_POLS))
    if interpret is None:
        interpret = use_interpret()
    fuse = fuse_oyx is not None
    kernel = functools.partial(
        _kernel_sep_recur_batch, V=V, N=N, T=T, C=C, w_rank=w_rank,
        precisions=precisions, batch=batch, dbuf=dbuf, fuse=fuse,
        rows_out=rows_out,
    )
    B = batch

    def at_spec(sel, b):
        return pl.BlockSpec(
            (1, 1, P_POLS, N, N),
            lambda i, aidx, st1, st2, sel=sel, b=b: (
                aidx[i * B + b], (st1 if sel == 1 else st2)[i * B + b], 0, 0, 0
            ),
            memory_space=pltpu.VMEM,
        )

    at_specs = []
    at_inputs = []
    for b in range(B):
        at_specs += [at_spec(1, b), at_spec(1, b), at_spec(2, b), at_spec(2, b)]
        at_inputs += [stg.at_re, stg.at_im, stg.at_re, stg.at_im]

    fuse_specs, fuse_inputs = _fuse_io(fuse, fuse_oyx, s_pad, B, N,
                                       inverse=True)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(s_pad // B,),
        in_specs=[
            pl.BlockSpec((B, 3, T), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1, V), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, P_POLS, V), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, P_POLS, V), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, N, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, N, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 1), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N * P_POLS), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ] + at_specs + fuse_specs,
        out_specs=(
            pl.BlockSpec((B, N, N * P_POLS), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, N, N * P_POLS), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ) if rows_out else (
            pl.BlockSpec((B, P_POLS, N, N), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, P_POLS, N, N), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * N, V), jnp.float32),              # Φy [re; im]
            pltpu.VMEM((N, V), jnp.float32),                  # Φx re
            pltpu.VMEM((N, V), jnp.float32),                  # Φx im
            pltpu.VMEM((2 * N * P_POLS, V), jnp.float32),    # W
        ] * (2 if dbuf else 1),                               # per-parity sets
    )
    out_shape = (
        jax.ShapeDtypeStruct((s_pad, N, N * P_POLS), jnp.float32),
        jax.ShapeDtypeStruct((s_pad, N, N * P_POLS), jnp.float32),
    ) if rows_out else (
        jax.ShapeDtypeStruct((s_pad, P_POLS, N, N), jnp.float32),
        jax.ShapeDtypeStruct((s_pad, P_POLS, N, N), jnp.float32),
    )
    re, im = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(
        stg.aterm_index, stg.station1, stg.station2,
        stg.uvw_rows, stg.mu_row_cm, stg.vis_re_pv_cm, stg.vis_im_pv_cm,
        stg.wavenumbers, stg.po_x_col, stg.po_y_col, stg.mcol, npack, stg.sph,
        *at_inputs, *fuse_inputs,
    )
    if rows_out:
        # range grid-add row form [s_pad, N, N·P], emitted by the kernel
        # directly (exact (8,128) tiling at N·P=128 — no lane padding,
        # no boundary copy); the caller pre-padded the staging to the
        # plan's padded row count so the composition with
        # subgrids_to_grid_ranges has NO XLA op at the stage boundary
        return re, im
    return re[:S], im[:S]


@register(
    "gridder", "pallas_v6",
    "v5 + multi-subgrid grid steps: per-step fixed costs amortized over 4 subgrids",
    family="pallas", uniform_channels=True, fallback="pallas_v4",
)
def gridder_pallas_v6(params: IDGParams, sobs: SplitObservation,
                      interpret=None, w_rank: int = 2, canonical=False,
                      batch: int = 4):
    return _gridder_sep_recur_batch_run(
        params, stage(params, sobs, canonical), w_rank, gridder_precisions(w_rank),
        interpret, batch,
    )


def gridder_pallas_v6_staged(params, stg, interpret=None, w_rank: int = 2,
                             batch: int = 4, precisions=None,
                             dbuf: bool = False, rows_out: bool = False):
    return _gridder_sep_recur_batch_run(
        params, stg, w_rank, precisions or gridder_precisions(w_rank),
        interpret, batch, dbuf, rows_out=rows_out,
    )


PIECES_STEP_BATCH = 4  # gridder_pallas_v6_pieces default step batch


def pieces_pad_rows(s: int, pad_rows: int) -> int:
    """Batch-rounded total row count the fused pieces kernel emits when
    staging is pre-padded for rows_out (api.staged_gridder_pieces_runner
    pad_rows=...): the single source for the rounding the runner, the
    hardware validation, and the unit tests must agree on."""
    return -(-(s + pad_rows) // PIECES_STEP_BATCH) * PIECES_STEP_BATCH


def gridder_pallas_v6_pieces(params, stg, oyx, interpret=None,
                             w_rank: int = 2,
                             batch: int = PIECES_STEP_BATCH,
                             precisions=None, rows_out: bool = False):
    """v6 with the grid-stage producer fused into the kernel epilogue:
    returns phase-rolled iDFT PIECES ([S, P, N, N] row-major) ready for
    the range grid-add kernel (subgrids_to_grid_ranges(tiles_pair=...))
    instead of uv-domain subgrids. `oyx` is the [S, 2] int32 per-subgrid
    roll (coord_y % N, coord_x % N) from the block-sorted metadata.

    This moves the pipeline's XLA producer (phase multiply + two iDFT
    matmul passes) onto the MXU inside the kernel. The roll phases ride
    on the tile (piece = Wᵀ·diag(phy)·tile·diag(phx)·W), so the iDFT
    factors are constant: they arrive pre-split to bf16 hi/lo and the
    whole step's tiles share 4 batched dots ([2N, 2N]×[2N, B·NP] K-packed
    stage 1; [B·2N, NP]×[NP, NP] 3x stage 2). Because the pieces leave
    the kernel row-major, this also skips both the producer's S-minor →
    row-major relayout and the pipeline's explicit S-minor boundary
    transpose. `rows_out=True` (with staging pre-padded to the plan's
    padded row count, see api.staged_gridder_pieces_runner) emits the
    range kernel's NATIVE row form [R, N, N·P] instead — zero boundary
    ops (see the in-kernel comment for the T(8,128) lane-padding
    rationale)."""
    return _gridder_sep_recur_batch_run(
        params, stg, w_rank, precisions or gridder_precisions(w_rank),
        interpret, batch, fuse_oyx=oyx, rows_out=rows_out,
    )


@register(
    "gridder", "pallas_v7",
    "w-free specialization: rank-1 (drops the w-term correction; exact for w==0 data)",
    family="pallas", uniform_channels=True, fallback="pallas_v4",
    fixed_w_rank=1,
)
def gridder_pallas_v7(params: IDGParams, sobs: SplitObservation,
                      interpret=None, canonical=False, batch: int = 4):
    """v6 with the w·n Taylor correction dropped (w_rank=1): one fewer MXU
    pass and half the W-forming. EXACT for observations with w ≡ 0 and
    w_step = 0 — which includes every in-tree generator (initialize_uvw
    sets w = 0, init.cpp:4-25) — and a documented approximation otherwise
    (error ≈ |μ·n| ≲ 1e-3 rad per visibility at reference scales). The
    general-w kernels are v3–v6."""
    return _gridder_sep_recur_batch_run(
        params, stage(params, sobs, canonical), 1, ("3x",), interpret, batch
    )


def gridder_pallas_v7_staged(params, stg, interpret=None, batch: int = 4,
                             w_rank: int = 1, precisions=None,
                             dbuf: bool = False):
    return _gridder_sep_recur_batch_run(
        params, stg, w_rank, precisions or ("3x",), interpret, batch, dbuf
    )
