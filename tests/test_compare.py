"""Comparator behavior (tests/test_util.hpp:28-105 contract)."""

import numpy as np

from idg_tpu.utils import check_error, compare_subgrids, compare_visibilities


def _data(n=256, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)


def test_identical_passes():
    a = _data()
    res = check_error(a, a.copy(), verbose=False)
    assert res.passed and res.mean_error == 0.0


def test_small_noise_passes():
    a = _data()
    b = a + (1e-7 + 1e-7j)
    assert check_error(b, a, verbose=False).passed


def test_large_error_fails():
    a = _data()
    b = a + 0.01
    res = check_error(b, a, verbose=False)
    assert not res.passed
    assert res.mean_error > 1e-5


def test_zeros_in_reference_ignored():
    """Elements where the golden value is 0 are excluded (nnz counting)."""
    a = _data()
    ref = a.copy()
    ref[::2] = 0
    cmp = a.copy()
    cmp[::2] += 100.0  # wild error only where ref == 0
    res = check_error(cmp, ref, verbose=False)
    assert res.nnz == len(a) // 2
    # errors at ref==0 positions don't count
    assert res.passed


def test_normalization_by_max_magnitude():
    """Error is normalized by the max |component| of the compared array."""
    a = _data() * 1e4
    b = a + 1.0  # absolute error 1, relative ~1e-4
    loose = check_error(b, a, verbose=False)
    tight = check_error(b / 1e4 * 1e-2, (a + 0j) / 1e4 * 1e-2, verbose=False)
    assert loose.mean_error < 1e-2
    assert tight.passed


def test_adapters(small_params):
    s = _data(64).reshape(1, 4, 4, 4)
    assert compare_subgrids(s, s.copy(), verbose=False).passed
    assert compare_visibilities(s, s.copy(), verbose=False).passed


def test_diagnostic_print(capsys):
    a = _data(8)
    b = a.copy()
    b[3] += 1.0
    check_error(b, a, verbose=True)
    out = capsys.readouterr().out
    assert "FAILED" in out or "PASSED" in out
    assert "3: (" in out  # per-element diff line for the offending index
