from . import relblock, sddmm  # noqa: F401
