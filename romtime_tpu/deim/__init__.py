"""Empirical interpolation hyper-reduction (API parity with
``romtime.deim``, reference: src/romtime/deim/__init__.py:1-9)."""

from .deim import DiscreteEmpiricalInterpolation
from .mdeim import MatrixDiscreteEmpiricalInterpolation
from .nonlinear import MatrixDiscreteEmpiricalInterpolationNonlinear

__all__ = [
    "DiscreteEmpiricalInterpolation",
    "MatrixDiscreteEmpiricalInterpolation",
    "MatrixDiscreteEmpiricalInterpolationNonlinear",
]
