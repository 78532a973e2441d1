"""CRand must reproduce glibc rand() exactly (the reference's srand(0) data
seeding, tests/gridder_common.cpp:88)."""

import numpy as np

from idg_tpu.crand import CRand

# First outputs of glibc rand() after srand(1); srand(0) is identical because
# glibc maps seed 0 to 1.
GLIBC_SRAND1 = [
    1804289383, 846930886, 1681692777, 1714636915, 1957747793,
    424238335, 719885386, 1649760492, 596516649, 1189641421,
]


def test_matches_glibc_sequence():
    r = CRand(0)
    assert [r.rand() for _ in range(10)] == GLIBC_SRAND1


def test_seed_zero_equals_seed_one():
    assert CRand(0).rand_array(50).tolist() == CRand(1).rand_array(50).tolist()


def test_other_seed_differs():
    assert CRand(2).rand() != CRand(1).rand()


def test_array_matches_scalar_draws():
    a = CRand(0).rand_array(100)
    r = CRand(0)
    b = np.array([r.rand() for _ in range(100)])
    np.testing.assert_array_equal(a, b)


def test_uniform_range():
    u = CRand(0).uniform_array(1000)
    assert (u >= 0).all() and (u <= 1).all()
    assert 0.3 < u.mean() < 0.7
