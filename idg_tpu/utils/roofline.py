"""Roofline context for perf reports (new vs the reference, SURVEY.md §5).

Peak numbers are published per-chip figures (bf16 MXU FLOP/s and HBM
bandwidth); the roofline bound for a kernel with arithmetic intensity I is
min(peak_flops, I · peak_bw). Reports show achieved/bound as a percentage.
Unknown device kinds simply omit the roofline column.
"""

from __future__ import annotations

from typing import Optional, Tuple

# device_kind substring -> (peak bf16 FLOP/s, peak HBM bytes/s)
PEAKS = {
    "v5 lite": (197e12, 819e9),    # TPU v5e
    "v5e": (197e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v4": (275e12, 1228e9),
    "v6": (918e12, 1640e9),        # Trillium
}


def device_peaks(device_kind: str) -> Optional[Tuple[float, float]]:
    kind = device_kind.lower()
    for key, peaks in PEAKS.items():
        if key in kind:
            return peaks
    return None


def roofline_fraction(
    gflops_achieved: float, gflops_total: float, gbytes_total: float,
    device_kind: str,
) -> Optional[float]:
    """Achieved FLOP/s over the roofline bound at this kernel's intensity.

    gflops_achieved: measured GFLOP/s; gflops_total/gbytes_total: the
    analytic cost model for one pass (utils/costs.py).
    """
    peaks = device_peaks(device_kind)
    if peaks is None or gbytes_total <= 0 or gflops_total <= 0:
        return None
    peak_flops, peak_bw = peaks
    intensity = gflops_total / gbytes_total  # FLOP/byte
    bound = min(peak_flops, intensity * peak_bw)
    return gflops_achieved * 1e9 / bound
