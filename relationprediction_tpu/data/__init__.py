from . import io, synthetic  # noqa: F401
from .dataset import KGDataset, from_arrays, load  # noqa: F401
