"""tpu-idg-bench: TPU-native Image Domain Gridding benchmark framework.

Capability-parity re-design of ska-telescope/ska-sdp-idg-bench (CUDA/HIP GPU
kernel benchmark) for TPU: JAX/XLA + Pallas kernels, golden NumPy oracle,
dual perf/correctness harness, and (beyond the reference) multi-chip sharding
via jax.sharding / shard_map.
"""

from .config import HarnessConfig, IDGParams
from .data import make_observation, make_perf_observation, make_w_observation
from .types import Metadata, Observation

__version__ = "0.2.0"

__all__ = [
    "HarnessConfig",
    "IDGParams",
    "Metadata",
    "Observation",
    "make_observation",
    "make_perf_observation",
    "make_w_observation",
]
