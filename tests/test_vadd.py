"""vadd bandwidth smoke kernel: XLA and Pallas(interpret) variants agree."""

import numpy as np

from idg_tpu.ops.vadd import make_vadd_inputs, vadd, vadd_gbytes, vadd_pallas


def test_vadd_correct():
    x, y = make_vadd_inputs(1024 * 1024)
    out = np.asarray(vadd(x, y))
    np.testing.assert_allclose(out, np.asarray(x) + np.asarray(y))


def test_vadd_pallas_matches():
    x, y = make_vadd_inputs(1024 * 1024)
    out = np.asarray(vadd_pallas(x, y, interpret=True))
    np.testing.assert_allclose(out, np.asarray(vadd(x, y)))


def test_vadd_gbytes():
    assert vadd_gbytes(256 * 1024 * 1024) == 3 * 4 * 256 * 1024 * 1024 * 1e-9
