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
    if profile_dir is None:
        # env hook so any CLI perf run can be traced without plumbing a
        # flag through every driver (used by the MXU-utilization
        # extraction, scripts/xplane_tools.py --mxu)
        import os

        profile_dir = os.environ.get("IDG_PROFILE_DIR") or None

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


@dataclasses.dataclass(frozen=True)
class SustainedResult:
    seconds: float        # sustained per-launch seconds (total / launches)
    launches: int         # launches completed inside the window
    window_seconds: float # actual wall time of the sustained window
    chunk_seconds: tuple  # per-chunk wall times (drift/throttle signal)

    @property
    def drift_pct(self) -> float:
        """Last-chunk vs first-chunk per-launch drift in percent — a
        positive value means launches got SLOWER as the window ran
        (thermal throttle / queue backpressure signature)."""
        c = self.chunk_seconds
        if len(c) < 2 or c[0] <= 0:
            return 0.0
        return float(100.0 * (c[-1] - c[0]) / c[0])


def time_kernel_sustained(
    fn: Callable,
    *args,
    duration_s: float = 10.0,
    harness: Optional[HarnessConfig] = None,
) -> SustainedResult:
    """Sustained launch window: launch `fn` back-to-back for ~`duration_s`
    seconds and report the SUSTAINED per-launch time (total / launches).

    This is the TPU analogue of the reference's energy-measurement loop,
    which keeps the kernel running for ~10 s while sampling power twice
    (app/CUDA/util.cpp:131-155, `update_timing` + p_run loops). TPU power
    is not host-readable (the CSVs carry `W,n/a` provenance), but the
    sustained window itself is still meaningful on its own: it exposes
    thermal/clock and queue-backpressure effects that the min-of-windows
    headline (`time_kernel`) hides by construction. The window is split
    into chunks sized by the calibrated `time_kernel` estimate so the
    per-chunk series doubles as a drift/throttle signal (`drift_pct`).
    """
    cfg = harness or HarnessConfig.from_env()
    _force(fn(*args))                       # compile excluded
    for _ in range(cfg.nr_warm_up_runs):
        fn(*args)
    out = fn(*args)
    _force(out)

    # Size chunks at ~duration/20 using a quick single-launch estimate so
    # each chunk is long enough to amortize the sync fetch (≥10 launches)
    # but short enough to resolve drift across the window.
    t0 = time.perf_counter()
    _force(fn(*args))
    est = max(time.perf_counter() - t0, 1e-6)
    chunk_iters = max(10, int(duration_s / 20.0 / est))

    chunks = []
    launches = 0
    start = time.perf_counter()
    while time.perf_counter() - start < duration_s:
        c0 = time.perf_counter()
        o = None
        for _ in range(chunk_iters):
            o = fn(*args)
        _force(o)
        chunks.append((time.perf_counter() - c0) / chunk_iters)
        launches += chunk_iters
    total = time.perf_counter() - start
    return SustainedResult(
        seconds=total / max(launches, 1),
        launches=launches,
        window_seconds=total,
        chunk_seconds=tuple(chunks),
    )
