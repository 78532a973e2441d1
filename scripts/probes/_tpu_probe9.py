#!/usr/bin/env python
"""Round-3 probe 9: bisect WHICH construct in the DMA grid-add kernel
crashes the Mosaic compiler (tpu_compile_helper exit 1). Variants, tiny
shapes, each compiled+run independently:

  A  HBM->SMEM async copy of the slot table, nothing else
  B  dynamic-index HBM->VMEM row DMA (index from scalar-prefetch), no ring
  C  B + 8-deep ring with dynamic buf slot (bufs.at[cur], sems.at[cur])
  D  C + pl.when conditional refill
  E  full static-b kernel, slots via SCALAR PREFETCH (no SMEM DMA)
  F  full static-b kernel as shipped (SMEM DMA)   <- expected to fail
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_idg")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from idg_tpu.config import setup_compilation_cache

setup_compilation_cache()

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, D, CAP, NBUF = 64, 512, 8, 4
NBP = 8  # one octet

rng = np.random.default_rng(0)
rows_h = rng.standard_normal((M, D)).astype(np.float32)
slots_h = rng.integers(0, M + 1, (NBP, CAP)).astype(np.int32)  # M = sentinel
want = np.zeros((NBP, D), np.float32)
for b in range(NBP):
    for j in range(CAP):
        if slots_h[b, j] < M:
            want[b] += rows_h[slots_h[b, j]]
rows_d = jnp.asarray(rows_h)
slots_d = jnp.asarray(slots_h)


def run(name, fn):
    t0 = time.time()
    try:
        out = np.asarray(fn())
        err = float(np.abs(out - want).max()) if out.shape == want.shape else -1.0
        print(f"{name}: OK in {time.time()-t0:.0f}s, err={err:.2e}", flush=True)
    except Exception as exc:
        print(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:200]}",
              flush=True)


# ---------- A: HBM->SMEM DMA only ----------
def kern_a(slots_hbm, o_ref, smem, sem):
    cp = pltpu.make_async_copy(slots_hbm.at[pl.ds(0, 8)], smem, sem)
    cp.start()
    cp.wait()
    o_ref[...] = jnp.zeros((NBP, D), jnp.float32) + smem[0, 0].astype(jnp.float32)


def var_a():
    return pl.pallas_call(
        kern_a,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((NBP, D), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((NBP, D), jnp.float32),
        scratch_shapes=[pltpu.SMEM((8, CAP), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
    )(slots_d)


# ---------- B: dynamic-index row DMA, no ring ----------
def kern_b(slots_sp, rows_hbm, o_ref, acc, buf, sem):
    for b in range(NBP):
        acc[b, :] = jnp.zeros((D,), jnp.float32)

        def body(j, _, _b=b):
            idx = jnp.minimum(slots_sp[_b * CAP + j], M - 1)
            cp = pltpu.make_async_copy(
                rows_hbm.at[pl.ds(idx, 1)], buf, sem)
            cp.start()
            cp.wait()
            w = jnp.where(slots_sp[_b * CAP + j] < M, 1.0, 0.0)
            acc[_b, :] = acc[_b, :] + w * buf[0, :]
            return 0

        lax.fori_loop(0, CAP, body, 0)
    o_ref[...] = acc[...]


def var_b():
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((NBP, D), lambda i, *_: (0, 0)),
        scratch_shapes=[pltpu.VMEM((NBP, D), jnp.float32),
                        pltpu.VMEM((1, D), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        kern_b, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((NBP, D), jnp.float32),
    )(slots_d.reshape(-1), rows_d)


# ---------- C: + ring with dynamic buf slot ----------
def kern_c(slots_sp, rows_hbm, o_ref, acc, bufs, sems):
    for b in range(NBP):
        def dma(slot, j, _b=b):
            idx = jnp.minimum(slots_sp[_b * CAP + j], M - 1)
            return pltpu.make_async_copy(
                rows_hbm.at[pl.ds(idx, 1)], bufs.at[slot], sems.at[slot])

        for j0 in range(min(NBUF, CAP)):
            dma(j0, j0).start()
        acc[b, :] = jnp.zeros((D,), jnp.float32)

        def body(j, _, _b=b, _dma=dma):
            cur = lax.rem(j, NBUF)
            _dma(cur, j).wait()
            w = jnp.where(slots_sp[_b * CAP + j] < M, 1.0, 0.0)
            acc[_b, :] = acc[_b, :] + w * bufs[cur, 0, :]

            @pl.when(j + NBUF < CAP)
            def _next():
                _dma(cur, j + NBUF).start()

            return 0

        lax.fori_loop(0, CAP, body, 0)
    o_ref[...] = acc[...]


def var_c():
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((NBP, D), lambda i, *_: (0, 0)),
        scratch_shapes=[pltpu.VMEM((NBP, D), jnp.float32),
                        pltpu.VMEM((NBUF, 1, D), jnp.float32),
                        pltpu.SemaphoreType.DMA((NBUF,))],
    )
    return pl.pallas_call(
        kern_c, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((NBP, D), jnp.float32),
    )(slots_d.reshape(-1), rows_d)


# ---------- E/F: the shipped kernel, two slot-delivery modes ----------
def var_ef(smem_dma):
    def kern_f(slots_hbm, rows_hbm, o_ref, acc, bufs, smem, slot_sem, sems):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(slots_hbm.at[pl.ds(i * 8, 8)], smem,
                                   slot_sem)
        cp.start()
        cp.wait()
        for b in range(8):
            def dma(slot, j, _b=b):
                idx = jnp.minimum(smem[_b, j], M - 1)
                return pltpu.make_async_copy(
                    rows_hbm.at[pl.ds(idx, 1)], bufs.at[slot], sems.at[slot])

            for j0 in range(min(NBUF, CAP)):
                dma(j0, j0).start()
            acc[b, :] = jnp.zeros((D,), jnp.float32)

            def body(j, _, _b=b, _dma=dma):
                cur = lax.rem(j, NBUF)
                _dma(cur, j).wait()
                w = jnp.where(smem[_b, j] < M, 1.0, 0.0)
                acc[_b, :] = acc[_b, :] + w * bufs[cur, 0, :]

                @pl.when(j + NBUF < CAP)
                def _next():
                    _dma(cur, j + NBUF).start()

                return 0

            lax.fori_loop(0, CAP, body, 0)
        o_ref[...] = acc[...][None]

    def kern_e(slots_sp, rows_hbm, o_ref, acc, bufs, sems):
        i = pl.program_id(0)
        for b in range(8):
            def dma(slot, j, _b=b):
                idx = jnp.minimum(slots_sp[(i * 8 + _b) * CAP + j], M - 1)
                return pltpu.make_async_copy(
                    rows_hbm.at[pl.ds(idx, 1)], bufs.at[slot], sems.at[slot])

            for j0 in range(min(NBUF, CAP)):
                dma(j0, j0).start()
            acc[b, :] = jnp.zeros((D,), jnp.float32)

            def body(j, _, _b=b, _dma=dma):
                cur = lax.rem(j, NBUF)
                _dma(cur, j).wait()
                w = jnp.where(slots_sp[(i * 8 + _b) * CAP + j] < M, 1.0, 0.0)
                acc[_b, :] = acc[_b, :] + w * bufs[cur, 0, :]

                @pl.when(j + NBUF < CAP)
                def _next():
                    _dma(cur, j + NBUF).start()

                return 0

            lax.fori_loop(0, CAP, body, 0)
        o_ref[...] = acc[...][None]

    if smem_dma:
        out = pl.pallas_call(
            kern_f,
            grid=(NBP // 8,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 8, D), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NBP // 8, 8, D), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, D), jnp.float32),
                            pltpu.VMEM((NBUF, 1, D), jnp.float32),
                            pltpu.SMEM((8, CAP), jnp.int32),
                            pltpu.SemaphoreType.DMA(()),
                            pltpu.SemaphoreType.DMA((NBUF,))],
        )(slots_d, rows_d)
    else:
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NBP // 8,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 8, D), lambda i, *_: (i, 0, 0)),
            scratch_shapes=[pltpu.VMEM((8, D), jnp.float32),
                            pltpu.VMEM((NBUF, 1, D), jnp.float32),
                            pltpu.SemaphoreType.DMA((NBUF,))],
        )
        out = pl.pallas_call(
            kern_e, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((NBP // 8, 8, D), jnp.float32),
        )(slots_d.reshape(-1), rows_d)
    return out.reshape(NBP, D)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    run("A smem-dma", var_a)
    run("B row-dma-noring", var_b)
    run("C ring", var_c)
    run("E full-scalarprefetch", lambda: var_ef(False))
    run("F full-smemdma", lambda: var_ef(True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
