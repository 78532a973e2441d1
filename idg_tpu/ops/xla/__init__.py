from . import degridder, gridder  # noqa: F401  (registers kernels)
