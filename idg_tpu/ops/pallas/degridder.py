"""Pallas degridder ladder (adjoint direction: subgrids → visibilities).

Rungs mirror the gridder family (SURVEY.md §2.4 degridder ladder):

  pallas_v1  naive: taper+Jones prologue, then full-phase sincos per
             (t,c,pixel) and a VPU reduction over pixels
             (≈ GPU degridder_v1's timestep-parallel direct form).
  pallas_v2  channel-recurrence phasor + per-channel [Tt,N²]×[N²,P] MXU dots
             (≈ GPU degridder_v6's cmac refactor with v8-style recurrence).
  pallas_v3  separable phasor: stage 1 contracts y on the MXU as a packed
             [V, 2N]×[2N, 2·N·P] matmul per w-rank; stage 2 contracts x on
             the VPU against Φx* (the x-contraction is per-visibility, so it
             stays elementwise — the adjoint of the gridder's KR matmul).
  pallas_v4  v3 + mixed-precision MXU passes per rank.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import IDGParams
from ...types import SplitObservation
from ..complexpair import Pair
from ..registry import register
from .common import Staged, jones_degridder, kcmul, kcmul_conj, stage, use_interpret

P_POLS = 4


def _prologue(sub_re_ref, sub_im_ref, sph_ref, a1re_ref, a1im_ref,
              a2re_ref, a2im_ref):
    """Taper + Jones staging of the input subgrid
    (degridder_reference.cpp:35-74): per-pol [N,N] tiles A1·(sph·P)·A2ᴴ."""
    sph = sph_ref[...]
    pix = [
        (sub_re_ref[0, p] * sph, sub_im_ref[0, p] * sph)
        for p in range(P_POLS)
    ]
    a1 = [(a1re_ref[0, 0, p], a1im_ref[0, 0, p]) for p in range(P_POLS)]
    a2 = [(a2re_ref[0, 0, p], a2im_ref[0, 0, p]) for p in range(P_POLS)]
    return jones_degridder(pix, a1, a2)


def _common_specs(T: int, C: int, N: int):
    """uvw, k, po_x, po_y, w_off, subgrids(re,im)."""
    return [
        pl.BlockSpec((1, T, 3), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i, *_: (i, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, P_POLS, N, N), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P_POLS, N, N), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
    ]


def _epilogue_specs(N: int):
    at = lambda which: pl.BlockSpec(
        (1, 1, P_POLS, N, N),
        lambda i, aidx, st1, st2, which=which: (
            aidx[i], (st1 if which == 1 else st2)[i], 0, 0, 0
        ),
        memory_space=pltpu.VMEM,
    )
    return [
        pl.BlockSpec((N, N), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        at(1), at(1), at(2), at(2),
    ]


def _grid_call(params: IDGParams, stg: Staged, subgrids: Pair, kernel,
               extra_inputs=(), extra_specs=(), interpret=None):
    S = stg.uvw.shape[0]
    T = params.nr_timesteps_subgrid
    C, N = params.nr_channels, params.subgrid_size
    if interpret is None:
        interpret = use_interpret()
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S,),
        in_specs=_common_specs(T, C, N) + list(extra_specs) + _epilogue_specs(N),
        out_specs=(
            pl.BlockSpec((1, T, C, P_POLS), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, C, P_POLS), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    out_shape = (
        jax.ShapeDtypeStruct((S, T, C, P_POLS), jnp.float32),
        jax.ShapeDtypeStruct((S, T, C, P_POLS), jnp.float32),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        stg.aterm_index, stg.station1, stg.station2,
        stg.uvw, stg.wavenumbers, stg.po_x, stg.po_y, stg.w_off,
        subgrids[0], subgrids[1],
        *extra_inputs,
        stg.sph, stg.at_re, stg.at_im, stg.at_re, stg.at_im,
    )


# --------------------------------------------------------------------------
# pallas_v1 / v2: direct kernels (full phase / channel recurrence)
# --------------------------------------------------------------------------

def _kernel_direct(aidx, st1, st2,
                   uvw_ref, k_ref, pox_ref, poy_ref, woff_ref,
                   sub_re_ref, sub_im_ref,
                   lmn_ref, po_ref,
                   sph_ref, a1re_ref, a1im_ref, a2re_ref, a2im_ref,
                   out_re_ref, out_im_ref,
                   *, T, C, N, t_tile, recurrence):
    """Direct degridder: vis[t,c,p] = Σ_pix conj(phasor)·pixels[pix,p]
    (degridder_reference.cu:39-115). `recurrence=True` swaps per-channel
    sincos for one complex multiply (v2)."""
    NN = N * N
    pix = _prologue(sub_re_ref, sub_im_ref, sph_ref,
                    a1re_ref, a1im_ref, a2re_ref, a2im_ref)
    # [P, N²] matrices of prepared pixels
    pix_re = jnp.concatenate([p[0].reshape(1, NN) for p in pix], axis=0)
    pix_im = jnp.concatenate([p[1].reshape(1, NN) for p in pix], axis=0)
    uvw = uvw_ref[0]
    k = k_ref[0]
    po = po_ref[...]
    lmn = lmn_ref[...]
    dk = k[1] - k[0] if C > 1 else jnp.float32(0.0)
    dot = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32, precision="highest"
    )

    for t0 in range(0, T, t_tile):
        u = uvw[t0:t0 + t_tile, 0:1]
        v = uvw[t0:t0 + t_tile, 1:2]
        w = uvw[t0:t0 + t_tile, 2:3]
        pi = u * lmn[0:1] + v * lmn[1:2] + w * lmn[2:3]      # [Tt, N²]
        if recurrence:
            phase0 = pi * k[0] - po
            ph_re, ph_im = jnp.cos(phase0), jnp.sin(phase0)
            d_re, d_im = jnp.cos(pi * dk), jnp.sin(pi * dk)
        for c in range(C):
            if recurrence:
                pc_re, pc_im = ph_re, ph_im
                if c + 1 < C:
                    ph_re, ph_im = kcmul(ph_re, ph_im, d_re, d_im)
            else:
                phase = pi * k[c] - po
                pc_re, pc_im = jnp.cos(phase), jnp.sin(phase)
            # vis[t, p] = Σ_pix phasor[t,pix]·pixels[p,pix]
            vr = dot(pc_re, pix_re.T) - dot(pc_im, pix_im.T)   # [Tt, P]
            vi = dot(pc_re, pix_im.T) + dot(pc_im, pix_re.T)
            out_re_ref[0, t0:t0 + t_tile, c, :] = vr
            out_im_ref[0, t0:t0 + t_tile, c, :] = vi


def _degridder_direct(params, sobs, subgrids, recurrence, interpret, t_tile):
    stg = stage(params, sobs)
    T, C, N = params.nr_timesteps_subgrid, params.nr_channels, params.subgrid_size
    l, m = stg.lrow[0], stg.mrow[0]
    lmn = jnp.stack([
        jnp.tile(l[None, :], (N, 1)).reshape(-1),
        jnp.tile(m[:, None], (1, N)).reshape(-1),
        stg.n_yx.reshape(-1),
    ])
    po_full = (stg.po_x[:, None, :] + stg.po_y[:, :, None]).reshape(-1, N * N)
    extra_specs = [
        pl.BlockSpec((3, N * N), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N * N), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(
        _kernel_direct, T=T, C=C, N=N,
        t_tile=min(t_tile, T), recurrence=recurrence,
    )
    return _grid_call(
        params, stg, subgrids, kernel, (lmn, po_full), extra_specs, interpret
    )


@register(
    "degridder", "pallas_v1",
    "naive Pallas: full-phase sincos per (t,c,pixel), MXU pixel reduction",
    family="pallas",
)
def degridder_pallas_v1(params: IDGParams, sobs: SplitObservation,
                        subgrids: Pair, interpret=None, t_tile: int = 16):
    return _degridder_direct(params, sobs, subgrids, False, interpret, t_tile)


@register(
    "degridder", "pallas_v2",
    "channel-recurrence phasor: 2 sincos per (t,pixel), complex-mul per channel",
    family="pallas",
)
def degridder_pallas_v2(params: IDGParams, sobs: SplitObservation,
                        subgrids: Pair, interpret=None, t_tile: int = 32):
    return _degridder_direct(params, sobs, subgrids, True, interpret, t_tile)


# --------------------------------------------------------------------------
# pallas_v3 / v4: separable-phasor kernels
# --------------------------------------------------------------------------

def _kernel_separable(aidx, st1, st2,
                      uvw_ref, k_ref, pox_ref, poy_ref, woff_ref,
                      sub_re_ref, sub_im_ref,
                      mrow_ref, npack_ref,
                      sph_ref, a1re_ref, a1im_ref, a2re_ref, a2im_ref,
                      out_re_ref, out_im_ref,
                      *, T, C, N, w_rank, precisions):
    """vis[v,p] = Σ_r conj(coef_r) Σ_x Φx*[v,x] Σ_y Φy*[v,y]·(n^r ⊙ pix)[y, p·N+x]

    Stage 1 (Σ_y) is a packed complex matmul [V, 2N]×[2N, 2·N·P] per rank;
    stage 2 (Σ_x) is a per-pol lane reduction against Φx*."""
    V = T * C
    NP = N * P_POLS
    pix = _prologue(sub_re_ref, sub_im_ref, sph_ref,
                    a1re_ref, a1im_ref, a2re_ref, a2im_ref)
    # B0 [N(y), P·N(x)]: col p·N+x
    b_re = jnp.concatenate([p[0] for p in pix], axis=1)
    b_im = jnp.concatenate([p[1] for p in pix], axis=1)

    uvw = uvw_ref[0]
    k = k_ref[0]
    up = (uvw[:, 0:1] * k[None, :]).reshape(V, 1)
    vp = (uvw[:, 1:2] * k[None, :]).reshape(V, 1)
    wp = (uvw[:, 2:3] * k[None, :]).reshape(V, 1)
    mu = woff_ref[0, 0] - wp                        # [V, 1]

    m_row = mrow_ref[...]                           # [1, N]
    phase_y = poy_ref[...] - vp * m_row             # [V, N]
    phy_re, phy_im = jnp.cos(phase_y), jnp.sin(phase_y)
    lhs = jnp.concatenate([phy_re, -phy_im], axis=1)   # Φy*: [V, 2N]

    phase_x = pox_ref[...] - up * m_row             # [V, N]
    phx_re, phx_im = jnp.cos(phase_x), jnp.sin(phase_x)

    npack = npack_ref[...]                          # [N, P·N]
    acc_re = jnp.zeros((V, P_POLS), jnp.float32)
    acc_im = jnp.zeros((V, P_POLS), jnp.float32)
    cr, ci = jnp.ones_like(mu), jnp.zeros_like(mu)
    npow = jnp.ones_like(npack)
    for r in range(w_rank):
        if r:
            # conj coefficient (−iμ)^r/r!
            cr, ci = ci * mu / r, -cr * mu / r
            npow = npow * npack
        rhs = jnp.concatenate(
            [
                jnp.concatenate([b_re * npow, b_im * npow], axis=1),
                jnp.concatenate([-(b_im * npow), b_re * npow], axis=1),
            ],
            axis=0,
        )                                            # [2N, 2NP]
        prod = jnp.dot(
            lhs, rhs,
            preferred_element_type=jnp.float32,
            precision=precisions[min(r, len(precisions) - 1)],
        )                                            # [V, 2NP]
        r_re, r_im = prod[:, 0:NP], prod[:, NP:2 * NP]
        for p in range(P_POLS):
            rp_re = r_re[:, p * N:(p + 1) * N]       # [V, N(x)]
            rp_im = r_im[:, p * N:(p + 1) * N]
            sr, si = kcmul_conj(rp_re, rp_im, phx_re, phx_im)
            vr = jnp.sum(sr, axis=1, keepdims=True)  # [V, 1]
            vi = jnp.sum(si, axis=1, keepdims=True)
            er, ei = kcmul(vr, vi, cr, ci)
            acc_re = acc_re.at[:, p:p + 1].add(er)
            acc_im = acc_im.at[:, p:p + 1].add(ei)
    out_re_ref[0] = acc_re.reshape(T, C, P_POLS)
    out_im_ref[0] = acc_im.reshape(T, C, P_POLS)


def _degridder_separable(params, sobs, subgrids, w_rank, precisions, interpret):
    stg = stage(params, sobs)
    T, C, N = params.nr_timesteps_subgrid, params.nr_channels, params.subgrid_size
    npack = jnp.tile(stg.n_yx, (1, P_POLS))
    extra_specs = [
        pl.BlockSpec((1, N), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((N, N * P_POLS), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(
        _kernel_separable, T=T, C=C, N=N, w_rank=w_rank, precisions=precisions
    )
    return _grid_call(
        params, stg, subgrids, kernel, (stg.mrow, npack), extra_specs, interpret
    )


@register(
    "degridder", "pallas_v3",
    "separable phasor: packed [V,2N]×[2N,2NP] MXU stage + VPU Φx* contraction",
    family="pallas",
)
def degridder_pallas_v3(params: IDGParams, sobs: SplitObservation,
                        subgrids: Pair, interpret=None, w_rank: int = 2):
    return _degridder_separable(
        params, sobs, subgrids, w_rank, ("highest",), interpret
    )


@register(
    "degridder", "pallas_v4",
    "v3 + mixed-precision MXU passes per rank",
    family="pallas",
)
def degridder_pallas_v4(params: IDGParams, sobs: SplitObservation,
                        subgrids: Pair, interpret=None, w_rank: int = 2):
    return _degridder_separable(
        params, sobs, subgrids, w_rank, ("high", "default"), interpret
    )
