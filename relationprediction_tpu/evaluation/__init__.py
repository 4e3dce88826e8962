from . import ranking  # noqa: F401
from .scorer import AccuracySummary, MrrSummary, Scorer  # noqa: F401
