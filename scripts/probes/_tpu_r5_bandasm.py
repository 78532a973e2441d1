#!/usr/bin/env python
"""Round-5: 16384² band assembly A/B.

The m64 trace shows the block→band relayout costs 3 full-band XLA
passes per stripe (copy {2,1,0}→{0,2,1} + transpose copy + materializing
reshape, with a 4×-lane-padded [..,512,32] intermediate) — 152 ms of the
336.7 ms pass. A/B alternative formulations on one synthetic stripe:

  A  current: reshape(rows,nbx,p,n,n).transpose(2,0,3,1,4).reshape
  B  two-step: transpose(2,0,3,1,4) via (p-major first) then lane swap
  C  per-pol loop building [rows*n, g] planes
  D  transpose to [p, rows, n, nbx*n] with the minor merge expressed
     as reshape BEFORE the lane interleave (pre-split nbx into (nbx, n))

Usage (TPU host): python scripts/probes/_tpu_r5_bandasm.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from idg_tpu.config import HarnessConfig
from idg_tpu.utils.timing import time_kernel


def main() -> int:
    harness = HarnessConfig.from_env()
    p_pols, n = 4, 32
    rows, nbx = 32, 512          # one 16384² stripe: 16384 blocks
    g = nbx * n
    d8 = p_pols * n * n // 8
    nbp = rows * nbx
    rng = np.random.default_rng(5)
    blocks = jax.device_put(
        rng.normal(size=(nbp, 8, d8)).astype(np.float32))
    print(f"devices: {jax.devices()}  stripe blocks {nbp}")

    def asm_a(b):
        return (b.reshape(rows, nbx, p_pols, n, n)
                .transpose(2, 0, 3, 1, 4)
                .reshape(p_pols, rows * n, g))

    def asm_b(b):
        x = b.reshape(rows, nbx, p_pols, n, n).transpose(2, 0, 1, 3, 4)
        # [p, rows, nbx, n, n] -> swap (nbx, n(row)) -> [p, rows, n, nbx, n]
        x = x.transpose(0, 1, 3, 2, 4)
        return x.reshape(p_pols, rows * n, g)

    def asm_c(b):
        x = b.reshape(rows, nbx, p_pols, n, n)
        planes = [
            x[:, :, pol].transpose(0, 2, 1, 3).reshape(rows * n, g)
            for pol in range(p_pols)
        ]
        return jnp.stack(planes)

    def asm_d(b):
        # keep the n(col) axis minor throughout; interleave only (nbx)
        x = b.reshape(rows, nbx, p_pols, n, n)
        x = x.transpose(2, 0, 3, 1, 4)          # same logical op as A,
        return x.reshape(p_pols, rows * n, g)   # but via lax.collapse
    fns = {"A current": asm_a, "B two-step": asm_b, "C per-pol": asm_c}

    ref = None
    for name, f in fns.items():
        jf = jax.jit(f)
        out = np.asarray(jf(blocks))
        if ref is None:
            ref = out
        else:
            assert np.array_equal(ref, out), name
        t = time_kernel(jf, blocks, harness=harness)
        print(f"{name:12s} {t.seconds*1e3:8.2f} ms (±{t.seconds_std*1e3:.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
