"""glibc-compatible pseudo-random generator.

The reference seeds libc with ``srand(0)`` and draws synthetic observations via
``rand()`` (tests/gridder_common.cpp:88; app/common/init.cpp). To make this
framework's synthetic observations *bit-compatible in distribution* with the
reference binaries, we reproduce glibc's default ``rand()`` (the TYPE_3
additive-feedback generator with the documented lags 3/31), rather than using
an arbitrary RNG. The algorithm is public (glibc stdlib/random_r.c semantics).

A native C++ implementation (native/idg_native.cpp) accelerates bulk draws;
this module is the always-available pure-Python fallback and the definition of
record.
"""

from __future__ import annotations

import numpy as np

_MASK32 = 0xFFFFFFFF


class CRand:
    """glibc ``rand()``: TYPE_3 trinomial x^31 + x^3 + 1 additive generator."""

    def __init__(self, seed: int = 0):
        self.srand(seed)

    def srand(self, seed: int) -> None:
        seed = seed & _MASK32
        if seed == 0:
            seed = 1
        if seed >= 0x80000000:
            # glibc stores the unsigned seed into an int32_t state word and
            # the LCG below reads it back SIGNED with C truncating / and %
            # — emulating it with unsigned divmod diverges for every seed
            # with bit 31 set (verified against compiled glibc).
            seed -= 0x100000000
        r = [0] * 34
        r[0] = seed
        # Park-Miller LCG seeding of the state table, computed without
        # overflow exactly as glibc does (hi/lo decomposition of 16807*x mod
        # 2^31-1, mapping non-positive results back into range; C division
        # truncates toward zero, unlike Python's floor divmod).
        for i in range(1, 31):
            word = r[i - 1]
            q = abs(word) // 127773
            hi = q if word >= 0 else -q
            lo = word - hi * 127773
            word = 16807 * lo - 2836 * hi
            if word < 0:
                word += 2147483647
            r[i] = word
        for i in range(31, 34):
            r[i] = r[i - 31]
        self._state = r
        self._idx = 34  # index of the next value to produce
        # Warm-up: discard the first 310 outputs.
        for _ in range(310):
            self._next()

    def _next(self) -> int:
        r = self._state
        val = (r[-31] + r[-3]) & _MASK32
        r.append(val)
        del r[0]
        return val >> 1

    def rand(self) -> int:
        """One draw in [0, 2^31 - 1], identical to glibc ``rand()``."""
        return self._next()

    def uniform(self) -> float:
        """``(double)rand() / RAND_MAX`` as the reference computes it."""
        return self.rand() / 2147483647.0

    def rand_array(self, n: int) -> np.ndarray:
        """n consecutive draws as an int64 array (bulk helper)."""
        out = np.empty(n, dtype=np.int64)
        nxt = self._next
        for i in range(n):
            out[i] = nxt()
        return out

    def uniform_array(self, n: int) -> np.ndarray:
        return self.rand_array(n).astype(np.float64) / 2147483647.0


def make_rng(seed: int = 0):
    """Fastest available glibc-rand stream: native (idg_tpu.native) when the
    shared library is built, else this pure-Python fallback. Both produce
    the identical draw sequence (tests/test_native.py)."""
    try:
        from . import native

        if native.available():
            return native.NativeRand(seed)
    except Exception:
        pass
    return CRand(seed)
