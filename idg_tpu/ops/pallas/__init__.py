"""Hand-written Pallas TPU kernels (the optimization ladder's upper rungs).

Modules register kernels on import; kernels auto-select interpret mode on
non-TPU backends so the whole ladder is testable on CPU.

STAGED maps (workload, version) to a (stage_fn, run_fn) pair for the perf
harness: staging (gathers, layout transposes) runs once outside the timed
window, and only bare kernel launches are timed — the reference's
p_run_kernel semantics (app/CUDA/util.cpp:109-126 times cudaLaunchKernel
loops on pre-staged device buffers the same way).
"""

from . import degridder, gridder  # noqa: F401  (registers kernels)
from .common import stage

STAGED = {
    ("gridder", "pallas_v3"): (stage, gridder.gridder_pallas_v3_staged),
    ("gridder", "pallas_v4"): (stage, gridder.gridder_pallas_v4_staged),
    ("gridder", "pallas_v5"): (stage, gridder.gridder_pallas_v5_staged),
    ("gridder", "pallas_v6"): (stage, gridder.gridder_pallas_v6_staged),
    ("gridder", "pallas_v7"): (stage, gridder.gridder_pallas_v7_staged),
    ("degridder", "pallas_v3"): (stage, degridder.degridder_pallas_v3_staged),
    ("degridder", "pallas_v4"): (stage, degridder.degridder_pallas_v4_staged),
    ("degridder", "pallas_v5"): (stage, degridder.degridder_pallas_v5_staged),
    ("degridder", "pallas_v6"): (stage, degridder.degridder_pallas_v6_staged),
    ("degridder", "pallas_v7"): (stage, degridder.degridder_pallas_v7_staged),
    ("degridder", "pallas_v8"): (stage, degridder.degridder_pallas_v8_staged),
}
