from . import checkpoint, optimizers  # noqa: F401
from .engine import BatchPipeline, FitResult, TrainLoop  # noqa: F401
