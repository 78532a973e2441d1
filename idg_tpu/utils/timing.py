"""Device timing harness.

The reference times kernels with cudaEvent-bracketed launch loops: NR_WARM_UP_RUNS
warmups then NR_ITERATIONS timed launches, reporting the mean
(app/CUDA/util.cpp:81-161). The TPU equivalent: call the jitted function once
to compile (excluded), run warmups, then wall-time iterations bracketed by
``jax.block_until_ready`` so async dispatch doesn't leak into (or out of) the
measured window.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax

from ..config import HarnessConfig


@dataclasses.dataclass(frozen=True)
class TimingResult:
    seconds: float          # mean seconds per iteration
    iterations: int
    warmup_runs: int
    all_seconds: tuple      # per-iteration wall times


def time_kernel(
    fn: Callable,
    *args,
    harness: Optional[HarnessConfig] = None,
    profile_dir: Optional[str] = None,
) -> TimingResult:
    """Warmup + timed loop (p_run_kernel semantics, app/CUDA/util.cpp:81-128).

    `fn` must be a jittable callable returning one or more device arrays.
    Every iteration runs the same launch; the mean wall time is returned.
    """
    cfg = harness or HarnessConfig.from_env()

    # Compile (and any constant transfers) excluded from timing.
    out = fn(*args)
    jax.block_until_ready(out)

    for _ in range(cfg.nr_warm_up_runs):
        jax.block_until_ready(fn(*args))

    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    times = []
    for _ in range(cfg.nr_iterations):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)

    if profile_dir:
        jax.profiler.stop_trace()

    return TimingResult(
        seconds=sum(times) / len(times),
        iterations=cfg.nr_iterations,
        warmup_runs=cfg.nr_warm_up_runs,
        all_seconds=tuple(times),
    )
