#!/usr/bin/env python
"""Round-5: Pallas band-assembly kernel probe for the 16384^2 grid-add.

The merged range kernel outputs block rows [NB, 8, d8] (flat p,i,j);
the band [P, rows*N, G] assembly via XLA reshape/transpose costs THREE
full-band passes (~4.75 ms/component/stripe where one pass ~= 0.6).
This probes a dedicated Mosaic relayout kernel: per band-row step,
read one row of blocks [nbx, 8, d8] and emit the [P, N, G] band slab
via in-register reshape/transpose (lane-split 512->(16,32), the class
of cast recorded as a negative INSIDE the merged kernel - re-tested
standalone here where the operand sits in VMEM with no dot in flight).

Usage (TPU host): PYTHONPATH=/root/.axon_site:/root/repo python
scripts/probes/_tpu_r5_bandasm2.py"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from idg_tpu.utils.timing import time_kernel


def main() -> int:
    g, n, p = 16384, 32, 4
    nbx = g // n              # 512
    rows = 32                 # band rows per stripe (16384-block stripe)
    nb = rows * nbx
    d8 = p * n * n // 8       # 512
    rng = np.random.default_rng(3)
    blocks = jnp.asarray(rng.normal(size=(nb, 8, d8)).astype(np.float32))
    print(f"devices: {jax.devices()}  blocks {blocks.shape} "
          f"-> band [{p}, {rows*n}, {g}]")

    # XLA reference (the shipping assembly expression)
    @jax.jit
    def xla_band(b):
        return (b.reshape(rows, nbx, p, n, n)
                .transpose(2, 0, 3, 1, 4)
                .reshape(p, rows * n, g))

    t = time_kernel(xla_band, blocks, harness=None)
    print(f"A XLA assembly   {t.seconds*1e3:8.3f} ms (±{t.seconds_std*1e3:.3f})")
    ref = np.asarray(xla_band(blocks))

    def kernel(x_ref, o_ref):
        x = x_ref[...]                          # [nbx, 8, d8]
        y = x.reshape(nbx, 8, 16, 32)
        y = jnp.transpose(y, (1, 2, 0, 3))      # [8, 16, nbx, 32]
        o_ref[...] = y.reshape(1, p, n, g)

    fn = pl.pallas_call(
        kernel,
        grid=(rows,),
        in_specs=[pl.BlockSpec((nbx, 8, d8), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, p, n, g), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, p, n, g), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )

    @jax.jit
    def pallas_band(b):
        return jnp.transpose(fn(b), (1, 0, 2, 3)).reshape(p, rows * n, g)

    try:
        got = np.asarray(pallas_band(blocks))
    except Exception as e:
        print(f"B Mosaic assembly FAILED to compile/run: {type(e).__name__}: "
              f"{str(e)[:300]}")
        return 1
    ok = np.array_equal(ref, got)
    print(f"B parity bit-identical: {ok}")
    t = time_kernel(pallas_band, blocks, harness=None)
    print(f"B Mosaic kernel  {t.seconds*1e3:8.3f} ms (±{t.seconds_std*1e3:.3f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
