from .reference import degridder_reference, gridder_reference

__all__ = ["gridder_reference", "degridder_reference"]
