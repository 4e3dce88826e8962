from . import decoders, encoders, initializers  # noqa: F401
from .build import RGCNModel, build_model  # noqa: F401
