"""Roofline helper: peak lookup and bound math."""

from idg_tpu.utils.roofline import device_peaks, roofline_fraction


def test_known_device_kinds():
    assert device_peaks("TPU v5 lite") == (197e12, 819e9)
    assert device_peaks("TPU v5p chip") == (459e12, 2765e9)
    assert device_peaks("H100") is None


def test_fraction_compute_bound():
    # intensity 1000 FLOP/B on v5e -> bound = min(197e12, 819e12) = 197 TF
    frac = roofline_fraction(
        gflops_achieved=19700.0, gflops_total=1000.0, gbytes_total=1.0,
        device_kind="TPU v5 lite",
    )
    assert abs(frac - 0.1) < 1e-9


def test_fraction_bandwidth_bound():
    # intensity 0.1 FLOP/B -> bound = 0.1 * 819e9 = 81.9 GFLOP/s
    frac = roofline_fraction(
        gflops_achieved=8.19, gflops_total=0.1, gbytes_total=1.0,
        device_kind="TPU v5 lite",
    )
    assert abs(frac - 0.1) < 1e-6


def test_unknown_device_returns_none():
    assert roofline_fraction(1.0, 1.0, 1.0, "GeForce") is None
