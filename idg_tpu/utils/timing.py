"""Device timing harness.

The reference times kernels with cudaEvent-bracketed launch loops: NR_WARM_UP_RUNS
warmups then NR_ITERATIONS timed launches, reporting the mean
(app/CUDA/util.cpp:81-161). The TPU equivalent: compile excluded, warmup
launches, then one timed window containing NR_ITERATIONS back-to-back
launches, closed by a device→host fetch of a single output element.

Why a fetch and not `jax.block_until_ready`: on this machine's tunneled TPU
platform ("axon") block_until_ready can return before remote execution
finishes (measured: block=0.1 ms while the same launch takes 366 ms to
produce its data), which silently breaks naive per-iteration timing. A tiny
transfer from the LAST output forces completion of the whole serialized
device queue; its ~30 ms cost is amortized across the window and subtracted
via a measured sync-overhead estimate.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import numpy as np

from ..config import HarnessConfig


def _force(out) -> None:
    """Force completion: fetch one element of the first DEVICE output leaf
    (tiny D2H transfer; the device queue is serialized, so one fetch
    completes everything enqueued before it). Host leaves (numpy/python
    scalars) are skipped — fetching one of those would be a no-op and the
    window would silently measure only async dispatch."""
    for leaf in jax.tree_util.tree_leaves(out):
        if isinstance(leaf, jax.Array):
            np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))
            return


@dataclasses.dataclass(frozen=True)
class TimingResult:
    seconds: float          # min-window seconds per iteration (robust estimate)
    iterations: int         # iterations per window
    warmup_runs: int
    all_seconds: tuple      # per-window wall times (windows of 1+ iterations)
    sync_overhead: float    # measured per-window sync cost (subtracted)

    @property
    def seconds_mean(self) -> float:
        """Mean per-iteration seconds across windows."""
        w = np.asarray(self.all_seconds)
        return float((w.mean() - self.sync_overhead) / self.iterations)

    @property
    def seconds_std(self) -> float:
        """Per-iteration standard deviation across windows (noise bound; 0
        with a single window)."""
        w = np.asarray(self.all_seconds)
        return float(w.std(ddof=1) / self.iterations) if w.size > 1 else 0.0


def time_kernel(
    fn: Callable,
    *args,
    harness: Optional[HarnessConfig] = None,
    profile_dir: Optional[str] = None,
) -> TimingResult:
    """Warmup + timed launch windows (p_run_kernel semantics,
    app/CUDA/util.cpp:81-128). `fn` must be a jittable callable returning
    device arrays. Returns the MIN over NR_WINDOWS calibrated windows as
    the headline per-launch seconds (robust to tunnel jitter); the window
    mean/σ are available via seconds_mean/seconds_std and land in the CSVs
    as ms_stddev. Methodology note: round-1 CSVs used the single-window
    mean — round-2+ min-of-windows numbers are slightly lower on noisy
    runs by construction."""
    cfg = harness or HarnessConfig.from_env()

    # Compile (and constant transfers) excluded from timing.
    _force(fn(*args))

    for _ in range(cfg.nr_warm_up_runs):
        fn(*args)
    out = fn(*args)
    _force(out)

    # Estimate the fixed sync/fetch overhead on an already-materialized
    # output (queue empty → measures only the D2H round trip). Take the min
    # of several trials: this cost is subtracted from the window, so noise
    # here corrupts short measurements.
    sync_overhead = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _force(out)
        sync_overhead = min(sync_overhead, time.perf_counter() - t0)

    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    def window(iters: int) -> float:
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = fn(*args)
        _force(o)
        return time.perf_counter() - t0

    iters = max(1, cfg.nr_iterations)  # 0 would loop the calibration forever
    total = window(iters)
    # Keep the launch window ≫ the sync cost being subtracted; otherwise
    # sync jitter dominates the estimate (seen at ±2 ms on the tunneled
    # platform). Grow the iteration count until the window is 10× sync.
    while total < 10.0 * sync_overhead and iters < 4096:
        iters = min(4096, max(iters * 4, int(iters * 12.0 * sync_overhead / max(total, 1e-9))))
        total = window(iters)

    # Repeat the calibrated window so the result carries a measured noise
    # bound (min = headline estimate; mean/σ via TimingResult properties).
    windows = [total]
    for _ in range(max(0, cfg.nr_windows - 1)):
        windows.append(window(iters))

    if profile_dir:
        jax.profiler.stop_trace()

    per_iter = max(min(windows) - sync_overhead, 1e-12) / iters
    return TimingResult(
        seconds=per_iter,
        iterations=iters,
        warmup_runs=cfg.nr_warm_up_runs,
        all_seconds=tuple(windows),
        sync_overhead=sync_overhead,
    )
