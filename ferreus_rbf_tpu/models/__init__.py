"""User-facing model layer: the RBF interpolator and its transforms."""

from .rbf import Coefficients, RBFInterpolator
from .global_trend import GlobalTrend, GlobalTrendTransform
from .test_functions import RBFTestFunctions

__all__ = [
    "Coefficients",
    "GlobalTrend",
    "GlobalTrendTransform",
    "RBFInterpolator",
    "RBFTestFunctions",
]
