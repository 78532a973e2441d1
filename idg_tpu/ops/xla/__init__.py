from . import degridder, gridder, separable  # noqa: F401  (registers kernels)
