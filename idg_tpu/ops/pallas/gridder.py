"""Pallas gridder ladder — hand-scheduled TPU kernels, one grid step per
subgrid (the analogue of one thread-block per subgrid, gridder_reference.cu:14).

Optimization deltas (each rung documented like the reference's v1..v8 ladder,
SURVEY.md §2.4):

  pallas_v1  naive in-VMEM kernel: full-phase sincos per (t,c,pixel), VPU
             MAC, time-tiled to bound VMEM (≈ GPU gridder_v1's
             thread-parallel direct form).
  pallas_v2  channel-recurrence phasor: sincos only at channel 0 plus a
             per-(t,pixel) delta; channels advance by one complex multiply;
             per-channel MAC via [P,T]×[T,N²] MXU dots
             (≈ GPU gridder_v8's phasor recurrence, gridder_v8.cu:135-186).
  pallas_v3  separable phasor (ops/xla/separable.py math): per-axis
             exponentials Φx/Φy + rank-w Taylor of the tiny w·n term; the MAC
             becomes one packed [2N, V]×[V, 2·rank·N·P] MXU matmul with only
             O(V·N) sincos. Fuses W-forming in VMEM (the XLA version spills
             ~100 GB of W traffic to HBM per pass).
  pallas_v4  v3 + mixed-precision MXU passes: the rank-0 term runs bf16_3x
             ('high'), the rank-1 correction (≤1e-3 of the signal) runs
             single-pass bf16 — 4 MXU passes instead of 12.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import IDGParams
from ...types import SplitObservation
from ..registry import register
from .common import Staged, jones_gridder, kcmul, stage, use_interpret

P_POLS = 4


def _epilogue_and_store(pix, stg_refs, out_re_ref, out_im_ref):
    """Jones correction + spheroidal taper on per-pol [N,N] tiles, then
    store into the [1, P, N, N] output block."""
    sph_ref, a1re_ref, a1im_ref, a2re_ref, a2im_ref = stg_refs
    sph = sph_ref[...]
    a1 = [(a1re_ref[0, 0, p], a1im_ref[0, 0, p]) for p in range(P_POLS)]
    a2 = [(a2re_ref[0, 0, p], a2im_ref[0, 0, p]) for p in range(P_POLS)]
    corrected = jones_gridder(pix, a1, a2)
    for p in range(P_POLS):
        out_re_ref[0, p] = corrected[p][0] * sph
        out_im_ref[0, p] = corrected[p][1] * sph


def _common_specs(T: int, C: int, N: int):
    """(in_specs, consumed_count) for the input prefix shared by all rungs:
    uvw, vis_re, vis_im, k, po_x, po_y, w_off."""
    return [
        pl.BlockSpec((1, T, 3), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T, C, P_POLS), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T, C, P_POLS), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i, *_: (i, 0), memory_space=pltpu.SMEM),
    ]


def _epilogue_specs(N: int):
    """sph + the four metadata-selected aterm blocks (scalar-prefetch-driven
    index maps: args after the grid index are the prefetch refs)."""
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


def _grid_call(params: IDGParams, stg: Staged, kernel, extra_inputs=(),
               extra_specs=(), interpret=None):
    """Assemble the per-subgrid pallas_call shared by every rung."""
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
            pl.BlockSpec((1, P_POLS, N, N), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_POLS, N, N), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    out_shape = (
        jax.ShapeDtypeStruct((S, P_POLS, N, N), jnp.float32),
        jax.ShapeDtypeStruct((S, P_POLS, N, N), jnp.float32),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        stg.aterm_index, stg.station1, stg.station2,
        stg.uvw, stg.vis_re, stg.vis_im, stg.wavenumbers,
        stg.po_x, stg.po_y, stg.w_off,
        *extra_inputs,
        stg.sph, stg.at_re, stg.at_im, stg.at_re, stg.at_im,
    )


# --------------------------------------------------------------------------
# pallas_v1: naive full-phase kernel
# --------------------------------------------------------------------------

def _kernel_v1(aidx, st1, st2,
               uvw_ref, vre_ref, vim_ref, k_ref, pox_ref, poy_ref, woff_ref,
               lmn_ref, po_ref,
               sph_ref, a1re_ref, a1im_ref, a2re_ref, a2im_ref,
               out_re_ref, out_im_ref,
               *, T, C, N, t_tile):
    """Direct form: phase[t,c,pix] = po[pix] − (u·l + v·m + w·n)[t,pix]·k_c,
    sincos for every element (the reference kernel's math,
    gridder_reference.cu:40-107), tiled over time."""
    NN = N * N
    uvw = uvw_ref[0]                      # [T, 3]
    k = k_ref[0]                          # [C]
    po = po_ref[...]                      # [1, N²]  (full exact offset)
    lmn = lmn_ref[...]                    # [3, N²]

    acc = [
        (jnp.zeros((N, N), jnp.float32), jnp.zeros((N, N), jnp.float32))
        for _ in range(P_POLS)
    ]
    for t0 in range(0, T, t_tile):
        u = uvw[t0:t0 + t_tile, 0:1]      # [Tt, 1]
        v = uvw[t0:t0 + t_tile, 1:2]
        w = uvw[t0:t0 + t_tile, 2:3]
        pi = u * lmn[0:1] + v * lmn[1:2] + w * lmn[2:3]      # [Tt, N²]
        for c in range(C):
            phase = po - pi * k[c]
            ph_re = jnp.cos(phase)
            ph_im = jnp.sin(phase)
            for p in range(P_POLS):
                vr = vre_ref[0, t0:t0 + t_tile, c, p:p + 1]     # [Tt, 1]
                vi = vim_ref[0, t0:t0 + t_tile, c, p:p + 1]
                dr = jnp.sum(vr * ph_re - vi * ph_im, axis=0, keepdims=True)
                di = jnp.sum(vr * ph_im + vi * ph_re, axis=0, keepdims=True)
                acc[p] = (
                    acc[p][0] + dr.reshape(N, N),
                    acc[p][1] + di.reshape(N, N),
                )
    _epilogue_and_store(
        acc, (sph_ref, a1re_ref, a1im_ref, a2re_ref, a2im_ref),
        out_re_ref, out_im_ref,
    )


@register(
    "gridder", "pallas_v1",
    "naive Pallas: full-phase sincos per (t,c,pixel), VPU MAC, time-tiled",
    family="pallas",
)
def gridder_pallas_v1(params: IDGParams, sobs: SplitObservation,
                      interpret=None, t_tile: int = 16):
    stg = stage(params, sobs)
    T, C, N = params.nr_timesteps_subgrid, params.nr_channels, params.subgrid_size
    l, m = stg.lrow[0], stg.mrow[0]
    lmn = jnp.stack([
        jnp.tile(l[None, :], (N, 1)).reshape(-1),      # l over x
        jnp.tile(m[:, None], (1, N)).reshape(-1),      # m over y
        stg.n_yx.reshape(-1),
    ])                                                  # [3, N²]
    po_full = (stg.po_x[:, None, :] + stg.po_y[:, :, None]).reshape(-1, N * N)
    extra_specs = [
        pl.BlockSpec((3, N * N), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N * N), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(
        _kernel_v1, T=T, C=C, N=N, t_tile=min(t_tile, T)
    )
    return _grid_call(params, stg, kernel, (lmn, po_full), extra_specs, interpret)


# --------------------------------------------------------------------------
# pallas_v2: channel-recurrence phasor (GPU v8 analogue)
# --------------------------------------------------------------------------

def _kernel_v2(aidx, st1, st2,
               uvw_ref, vre_ref, vim_ref, k_ref, pox_ref, poy_ref, woff_ref,
               lmn_ref, po_ref,
               sph_ref, a1re_ref, a1im_ref, a2re_ref, a2im_ref,
               out_re_ref, out_im_ref,
               *, T, C, N, t_tile):
    """Two sincos per (t,pixel) — phasor at channel 0 and the uniform-spacing
    channel delta — then C−1 complex multiplies (gridder_v8.cu:135-186).
    MAC per channel runs as a [P,Tt]×[Tt,N²] dot on the MXU."""
    NN = N * N
    uvw = uvw_ref[0]
    k = k_ref[0]
    po = po_ref[...]
    lmn = lmn_ref[...]
    dk = k[1] - k[0] if C > 1 else jnp.float32(0.0)

    acc_re = jnp.zeros((P_POLS, NN), jnp.float32)
    acc_im = jnp.zeros((P_POLS, NN), jnp.float32)
    for t0 in range(0, T, t_tile):
        u = uvw[t0:t0 + t_tile, 0:1]
        v = uvw[t0:t0 + t_tile, 1:2]
        w = uvw[t0:t0 + t_tile, 2:3]
        pi = u * lmn[0:1] + v * lmn[1:2] + w * lmn[2:3]      # [Tt, N²]
        phase0 = po - pi * k[0]
        ph_re, ph_im = jnp.cos(phase0), jnp.sin(phase0)
        d_re, d_im = jnp.cos(pi * dk), jnp.sin(-pi * dk)
        for c in range(C):
            vr = vre_ref[0, t0:t0 + t_tile, c, :].T          # [P, Tt]
            vi = vim_ref[0, t0:t0 + t_tile, c, :].T
            dot = functools.partial(
                jnp.dot, preferred_element_type=jnp.float32, precision="highest"
            )
            acc_re = acc_re + dot(vr, ph_re) - dot(vi, ph_im)
            acc_im = acc_im + dot(vr, ph_im) + dot(vi, ph_re)
            if c + 1 < C:
                ph_re, ph_im = kcmul(ph_re, ph_im, d_re, d_im)
    pix = [
        (acc_re[p].reshape(N, N), acc_im[p].reshape(N, N))
        for p in range(P_POLS)
    ]
    _epilogue_and_store(
        pix, (sph_ref, a1re_ref, a1im_ref, a2re_ref, a2im_ref),
        out_re_ref, out_im_ref,
    )


@register(
    "gridder", "pallas_v2",
    "channel-recurrence phasor: 2 sincos per (t,pixel), complex-mul per channel, MXU MAC",
    family="pallas",
)
def gridder_pallas_v2(params: IDGParams, sobs: SplitObservation,
                      interpret=None, t_tile: int = 32):
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
        _kernel_v2, T=T, C=C, N=N, t_tile=min(t_tile, T)
    )
    return _grid_call(params, stg, kernel, (lmn, po_full), extra_specs, interpret)


# --------------------------------------------------------------------------
# pallas_v3 / v4: separable-phasor MXU kernel
# --------------------------------------------------------------------------

def _kernel_separable(aidx, st1, st2,
                      uvw_ref, vre_ref, vim_ref, k_ref, pox_ref, poy_ref,
                      woff_ref, mrow_ref, npack_ref,
                      sph_ref, a1re_ref, a1im_ref, a2re_ref, a2im_ref,
                      out_re_ref, out_im_ref,
                      *, T, C, N, w_rank, precisions):
    """Separable MAC (see ops/xla/separable.py for the math):
      LHS  [2N, V]              = [Φyᵀ_re ; Φyᵀ_im]
      RHS  [V, 2·rank·(P·N)]    = per-rank W = tile_P(Φx) ⊛ repeat_N(ṽ_r)
      out  rows y, cols p·N+x  → per-pol [N,N] tiles, native subgrid layout.
    `precisions[r]` sets the MXU pass count per rank (v4: ('high','default'))."""
    V = T * C
    NP = N * P_POLS
    uvw = uvw_ref[0]
    k = k_ref[0]                                   # [C]
    # effective visibilities, t-major (v = t·C + c)
    up = (uvw[:, 0:1] * k[None, :]).reshape(1, V)  # [1, V]
    vp = (uvw[:, 1:2] * k[None, :]).reshape(V, 1)  # [V, 1]
    wp = (uvw[:, 2:3] * k[None, :]).reshape(V, 1)
    mu = woff_ref[0, 0] - wp                       # [V, 1]

    # Φyᵀ [N, V]: po_y[y] − v'_v·m[y]  (LHS rows; lanes = V)
    m_col = mrow_ref[...].reshape(N, 1)
    phase_y = poy_ref[...].reshape(N, 1) - m_col * vp.reshape(1, V)
    lhs = jnp.concatenate([jnp.cos(phase_y), jnp.sin(phase_y)], axis=0)  # [2N, V]

    # Φx [V, N]: po_x[x] − u'_v·l[x] ... tiled over pols to [V, P·N]
    phase_x = pox_ref[...] - mrow_ref[...] * up.reshape(V, 1)  # [V, N] (l≡m grid)
    phx_re = jnp.cos(phase_x)
    phx_im = jnp.sin(phase_x)
    phx_re_t = jnp.concatenate([phx_re] * P_POLS, axis=1)      # [V, P·N]
    phx_im_t = jnp.concatenate([phx_im] * P_POLS, axis=1)

    vre = jnp.repeat(vre_ref[0].reshape(V, P_POLS), N, axis=1)  # [V, P·N]
    vim = jnp.repeat(vim_ref[0].reshape(V, P_POLS), N, axis=1)

    # rank coefficients (iμ)^r / r! as [V,1] split scalars
    cr, ci = jnp.ones_like(mu), jnp.zeros_like(mu)
    rhs_parts = []
    for r in range(w_rank):
        if r:
            cr, ci = -ci * mu / r, cr * mu / r
        tr = vre * cr - vim * ci
        ti = vre * ci + vim * cr
        w_re, w_im = kcmul(phx_re_t, phx_im_t, tr, ti)
        rhs_parts += [w_re, w_im]

    outs = []
    for r in range(w_rank):
        rhs = jnp.concatenate(rhs_parts[2 * r:2 * r + 2], axis=1)  # [V, 2NP]
        prod = jnp.dot(
            lhs, rhs,
            preferred_element_type=jnp.float32,
            precision=precisions[min(r, len(precisions) - 1)],
        )                                                          # [2N, 2NP]
        c_re = prod[0:N, 0:NP] - prod[N:2 * N, NP:2 * NP]
        c_im = prod[0:N, NP:2 * NP] + prod[N:2 * N, 0:NP]
        outs.append((c_re, c_im))

    npack = npack_ref[...]                                         # [N, P·N]
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
    _epilogue_and_store(
        pix, (sph_ref, a1re_ref, a1im_ref, a2re_ref, a2im_ref),
        out_re_ref, out_im_ref,
    )


def _gridder_separable(params, sobs, w_rank, precisions, interpret):
    stg = stage(params, sobs)
    T, C, N = params.nr_timesteps_subgrid, params.nr_channels, params.subgrid_size
    npack = jnp.tile(stg.n_yx, (1, P_POLS))        # [N, P·N], col p·N+x
    extra_specs = [
        pl.BlockSpec((1, N), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((N, N * P_POLS), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(
        _kernel_separable, T=T, C=C, N=N, w_rank=w_rank, precisions=precisions
    )
    return _grid_call(
        params, stg, kernel, (stg.mrow, npack), extra_specs, interpret
    )


@register(
    "gridder", "pallas_v3",
    "separable phasor: fused W-forming + packed [2N,V]×[V,2·rank·NP] MXU matmul in VMEM",
    family="pallas",
)
def gridder_pallas_v3(params: IDGParams, sobs: SplitObservation,
                      interpret=None, w_rank: int = 2):
    return _gridder_separable(
        params, sobs, w_rank, ("highest",), interpret
    )


@register(
    "gridder", "pallas_v4",
    "v3 + mixed-precision MXU: rank-0 bf16_3x, rank-1 correction single-pass bf16",
    family="pallas",
)
def gridder_pallas_v4(params: IDGParams, sobs: SplitObservation,
                      interpret=None, w_rank: int = 2):
    return _gridder_separable(
        params, sobs, w_rank, ("high", "default"), interpret
    )
