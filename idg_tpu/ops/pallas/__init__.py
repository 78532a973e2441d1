"""Hand-written Pallas TPU kernels (the optimization ladder's upper rungs).

Modules register kernels on import; kernels auto-select interpret mode on
non-TPU backends so the whole ladder is testable on CPU.
"""

from . import degridder, gridder  # noqa: F401  (registers kernels)
