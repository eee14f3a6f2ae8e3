"""Full-order model solvers (API parity with ``romtime.fom``,
reference: src/romtime/fom/__init__.py:1-11)."""

from .base import BandedOperator, OneDimensionalSolver, move_mesh
from .heat import HeatEquationMovingSolver, HeatEquationSolver
from .nonlinear import OneDimensionalBurgers

__all__ = [
    "BandedOperator",
    "OneDimensionalSolver",
    "move_mesh",
    "HeatEquationSolver",
    "HeatEquationMovingSolver",
    "OneDimensionalBurgers",
]
