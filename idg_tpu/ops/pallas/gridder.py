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
             ('high'), the rank-1 correction (≤1e-3 of the signal) runs
             single-pass bf16.
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
from .common import jones_gridder, kcmul, stage, use_interpret

P_POLS = 4


def _dot_mixed(lhs, rhs, mode: str):
    """MXU matmul with explicit pass control. Mosaic exposes only DEFAULT
    (1 bf16 pass) and HIGHEST (6 passes) — emulate bf16_3x ("3x", f32-quality
    at half the HIGHEST cost) by hi/lo bf16 mantissa splitting."""
    if mode in ("highest", "default"):
        return jnp.dot(
            lhs, rhs, preferred_element_type=jnp.float32, precision=mode
        )
    assert mode == "3x", mode
    lh = lhs.astype(jnp.bfloat16)
    ll = (lhs - lh.astype(jnp.float32)).astype(jnp.bfloat16)
    rh = rhs.astype(jnp.bfloat16)
    rl = (rhs - rh.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    return d(lh, rh) + (d(lh, rl) + d(ll, rh))


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
    dot = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32, precision="highest"
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
            vr = vre_ref[0, t0:t0 + t_tile, c, :].T          # [P, Tt]
            vi = vim_ref[0, t0:t0 + t_tile, c, :].T
            acc_re = acc_re + dot(vr, pc_re) - dot(vi, pc_im)
            acc_im = acc_im + dot(vr, pc_im) + dot(vi, pc_re)

    sph = sph_ref[...]                    # [1, N²]
    pix = [(acc_re[p:p + 1, :], acc_im[p:p + 1, :]) for p in range(P_POLS)]
    a1 = [(a1re_ref[0, 0, p:p + 1], a1im_ref[0, 0, p:p + 1]) for p in range(P_POLS)]
    a2 = [(a2re_ref[0, 0, p:p + 1], a2im_ref[0, 0, p:p + 1]) for p in range(P_POLS)]
    for p, (r, i) in enumerate(_epilogue(pix, sph, a1, a2)):
        out_re_ref[0, p:p + 1, :] = r
        out_im_ref[0, p:p + 1, :] = i


def _gridder_direct(params, sobs, recurrence, interpret, t_tile):
    stg = stage(params, sobs)
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
    if interpret is None:
        interpret = use_interpret()
    kernel = functools.partial(
        _kernel_direct, T=T, C=C, N=N, t_tile=min(t_tile, T),
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
                      interpret=None, t_tile: int = 16):
    return _gridder_direct(params, sobs, False, interpret, t_tile)


@register(
    "gridder", "pallas_v2",
    "channel-recurrence phasor: 2 sincos per (t,pixel), complex-mul per channel, MXU MAC",
    family="pallas",
)
def gridder_pallas_v2(params: IDGParams, sobs: SplitObservation,
                      interpret=None, t_tile: int = 32):
    return _gridder_direct(params, sobs, True, interpret, t_tile)


# --------------------------------------------------------------------------
# pallas_v3 / v4: separable-phasor MXU kernel
# --------------------------------------------------------------------------

def _kernel_separable(aidx, st1, st2,
                      upc_ref, vpr_ref, muc_ref, vre_ref, vim_ref,
                      pox_ref, poy_ref, mrow_ref, mcol_ref, poyc_ref,
                      npack_ref,
                      sph_ref, a1re_ref, a1im_ref, a2re_ref, a2im_ref,
                      out_re_ref, out_im_ref,
                      *, V, N, w_rank, precisions):
    """Separable MAC (see ops/xla/separable.py for the math):
      LHS  [2N, V]        = [Φyᵀ_re ; Φyᵀ_im]
      RHS  [V, 2·(P·N)]   per rank, W cols p·N+x: Φx[v,x]·ṽ_r[v,p]
      out  rows y, cols p·N+x  → per-pol [N,N] tiles, native subgrid layout.
    `precisions[r]` sets the MXU pass count per rank (v4: ('high','default'))."""
    NP = N * P_POLS
    up = upc_ref[0]                                 # [V, 1]
    vp = vpr_ref[0]                                 # [1, V]
    mu = muc_ref[0]                                 # [V, 1]
    m_row = mrow_ref[...]                           # [1, N]
    m_col = mcol_ref[...]                           # [N, 1]
    poy_col = poyc_ref[0]                           # [N, 1]

    # Φyᵀ [N, V]: po_y[y] − v'_v·m[y]  (LHS rows; lanes = V)
    phase_y = poy_col - m_col * vp                  # [N, V]
    lhs = jnp.concatenate([jnp.cos(phase_y), jnp.sin(phase_y)], axis=0)

    # Φx [V, N]: po_x[x] − u'_v·l[x]
    phase_x = pox_ref[0] - up * m_row               # [V, N] (l ≡ m grid)
    phx_re = jnp.cos(phase_x)
    phx_im = jnp.sin(phase_x)

    vre = vre_ref[0]                                # [V, P]
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
            tr = vre[:, p:p + 1] * cr - vim[:, p:p + 1] * ci   # [V, 1]
            ti = vre[:, p:p + 1] * ci + vim[:, p:p + 1] * cr
            w_re, w_im = kcmul(phx_re, phx_im, tr, ti)         # [V, N]
            parts_re.append(w_re)
            parts_im.append(w_im)
        rhs = jnp.concatenate(parts_re + parts_im, axis=1)     # [V, 2NP]
        prod = _dot_mixed(
            lhs, rhs, precisions[min(r, len(precisions) - 1)]
        )                                                      # [2N, 2NP]
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


def _gridder_separable(params, sobs, w_rank, precisions, interpret):
    stg = stage(params, sobs)
    S = stg.uvw.shape[0]
    T, C, N = params.nr_timesteps_subgrid, params.nr_channels, params.subgrid_size
    V = T * C
    npack = jnp.tile(stg.n_yx, (1, P_POLS))        # [N, P·N], col p·N+x
    m_col = stg.mrow.T                             # [N, 1] (XLA-side transpose)
    poy_col = jnp.swapaxes(stg.po_y, 1, 2)         # [S, N, 1]
    if interpret is None:
        interpret = use_interpret()
    kernel = functools.partial(
        _kernel_separable, V=V, N=N, w_rank=w_rank, precisions=precisions
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, V, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, V), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V, P_POLS), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V, P_POLS), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 1), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
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
        stg.up_col, stg.vp_row, stg.mu_col, stg.vis_re_vp, stg.vis_im_vp,
        stg.po_x, stg.po_y, stg.mrow, m_col, poy_col, npack, stg.sph,
        stg.at_re, stg.at_im, stg.at_re, stg.at_im,
    )


@register(
    "gridder", "pallas_v3",
    "separable phasor: fused W-forming + packed [2N,V]×[V,2NP] MXU matmul in VMEM",
    family="pallas",
)
def gridder_pallas_v3(params: IDGParams, sobs: SplitObservation,
                      interpret=None, w_rank: int = 2):
    return _gridder_separable(params, sobs, w_rank, ("highest",), interpret)


@register(
    "gridder", "pallas_v4",
    "v3 + mixed-precision MXU: rank-0 bf16_3x, rank-1 correction single-pass bf16",
    family="pallas",
)
def gridder_pallas_v4(params: IDGParams, sobs: SplitObservation,
                      interpret=None, w_rank: int = 2):
    return _gridder_separable(params, sobs, w_rank, ("3x", "default"), interpret)
