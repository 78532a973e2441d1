"""ctypes bindings for the native host runtime (libidg_native.so).

The reference's host layer is C++ (init.cpp generators, OpenMP golden
kernels, comparator); this package loads the framework's native equivalents
and exposes NumPy-typed wrappers. Everything degrades gracefully: if the
library is absent, callers fall back to the pure-Python/NumPy paths
(crand.py, models/reference.py, utils/compare.py). Build with:

    make -C idg_tpu/native        # or idg_tpu.native.build()
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libidg_native.so")

_lib: Optional[ctypes.CDLL] = None


class _Problem(ctypes.Structure):
    _fields_ = [
        ("grid_size", ctypes.c_int32),
        ("subgrid_size", ctypes.c_int32),
        ("nr_timesteps", ctypes.c_int32),
        ("nr_channels", ctypes.c_int32),
        ("nr_correlations", ctypes.c_int32),
        ("image_size", ctypes.c_float),
        ("w_step", ctypes.c_float),
    ]


def build(quiet: bool = True) -> bool:
    """Compile libidg_native.so in place. Returns True on success."""
    try:
        subprocess.run(
            ["make", "-C", _DIR],
            check=True,
            capture_output=quiet,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    global _lib
    _lib = None  # force reload
    return load() is not None


def load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.idg_rand_new.restype = ctypes.c_void_p
    lib.idg_rand_new.argtypes = [ctypes.c_uint32]
    lib.idg_rand_free.argtypes = [ctypes.c_void_p]
    lib.idg_rand_fill.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
    ]
    lib.idg_rand_uniform_fill.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.idg_gridder_reference.argtypes = [
        ctypes.POINTER(_Problem), ctypes.c_int64,
        f32, f32, f32, f32, f32,
        i32, i32, i32, i32, i32, i32, i32,
        ctypes.c_int32, f32,
    ]
    lib.idg_degridder_reference.argtypes = [
        ctypes.POINTER(_Problem), ctypes.c_int64,
        f32, f32, f32, f32, f32,
        i32, i32, i32, i32, i32, i32, i32,
        ctypes.c_int32, f32,
    ]
    lib.idg_check_error.restype = ctypes.c_double
    lib.idg_check_error.argtypes = [f32, f32, ctypes.c_int64]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


class NativeRand:
    """glibc-rand stream backed by the native library (same draw sequence
    as crand.CRand)."""

    def __init__(self, seed: int = 0):
        lib = load()
        if lib is None:
            raise RuntimeError("libidg_native.so not built")
        self._lib = lib
        self._handle = lib.idg_rand_new(seed)

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.idg_rand_free(self._handle)
            self._handle = None

    def rand_array(self, n: int) -> np.ndarray:
        out = np.empty(n, dtype=np.int64)
        self._lib.idg_rand_fill(self._handle, n, out)
        return out

    def uniform_array(self, n: int) -> np.ndarray:
        out = np.empty(n, dtype=np.float64)
        self._lib.idg_rand_uniform_fill(self._handle, n, out)
        return out

    def rand(self) -> int:
        return int(self.rand_array(1)[0])

    def uniform(self) -> float:
        return float(self.uniform_array(1)[0])


def _problem(params) -> _Problem:
    return _Problem(
        params.grid_size, params.subgrid_size, params.nr_timesteps_subgrid,
        params.nr_channels, params.nr_correlations,
        params.image_size, params.w_step,
    )


def _interleave(c: np.ndarray) -> np.ndarray:
    """complex64 array -> C-contiguous float32 view with trailing (re, im)."""
    c = np.ascontiguousarray(c, dtype=np.complex64)
    return c.view(np.float32).reshape(*c.shape, 2)


def gridder_reference_native(params, obs) -> np.ndarray:
    """OpenMP golden gridder. Same contract as models.reference.gridder_reference."""
    lib = load()
    md = obs.metadata
    S = md.nr_subgrids
    N, P = params.subgrid_size, params.nr_correlations
    out = np.zeros((S, P, N, N, 2), dtype=np.float32)
    lib.idg_gridder_reference(
        ctypes.byref(_problem(params)), S,
        np.ascontiguousarray(np.asarray(obs.uvw, np.float32).reshape(-1, 3)),
        np.ascontiguousarray(np.asarray(obs.wavenumbers, np.float32)),
        np.ascontiguousarray(
            _interleave(obs.visibilities).reshape(-1, params.nr_channels, P, 2)
        ),
        np.ascontiguousarray(np.asarray(obs.spheroidal, np.float32)),
        np.ascontiguousarray(_interleave(obs.aterms)),
        *[
            np.ascontiguousarray(np.asarray(a, np.int32))
            for a in (
                md.time_offset, md.aterm_index, md.station1, md.station2,
                md.coord_x, md.coord_y, md.coord_z,
            )
        ],
        np.asarray(obs.aterms).shape[1],
        out,
    )
    return out[..., 0] + 1j * out[..., 1]


def degridder_reference_native(params, obs, subgrids) -> np.ndarray:
    """OpenMP golden degridder. Same contract as models.reference.degridder_reference."""
    lib = load()
    md = obs.metadata
    S = md.nr_subgrids
    T, C, P = (
        params.nr_timesteps_subgrid, params.nr_channels, params.nr_correlations
    )
    out = np.zeros((S * T, C, P, 2), dtype=np.float32)
    lib.idg_degridder_reference(
        ctypes.byref(_problem(params)), S,
        np.ascontiguousarray(np.asarray(obs.uvw, np.float32).reshape(-1, 3)),
        np.ascontiguousarray(np.asarray(obs.wavenumbers, np.float32)),
        np.ascontiguousarray(_interleave(subgrids)),
        np.ascontiguousarray(np.asarray(obs.spheroidal, np.float32)),
        np.ascontiguousarray(_interleave(obs.aterms)),
        *[
            np.ascontiguousarray(np.asarray(a, np.int32))
            for a in (
                md.time_offset, md.aterm_index, md.station1, md.station2,
                md.coord_x, md.coord_y, md.coord_z,
            )
        ],
        np.asarray(obs.aterms).shape[1],
        out,
    )
    return (out[..., 0] + 1j * out[..., 1]).reshape(S, T, C, P)


def check_error_native(cmp: np.ndarray, ref: np.ndarray) -> float:
    """Normalized-RMS comparator metric (native fast path)."""
    lib = load()
    a = _interleave(np.asarray(cmp).ravel())
    b = _interleave(np.asarray(ref).ravel())
    return float(lib.idg_check_error(a, b, a.shape[0]))


def crand_uniform_array(seed: int, n: int) -> np.ndarray:
    """One-shot bulk uniform draw (data.py fast path)."""
    rng = NativeRand(seed)
    return rng.uniform_array(n)
