"""Model registry: the solver families this framework ships.

The physics implementations live in :mod:`romtime_tpu.fom` (mirroring the
reference's package layout); this module is the flat "model zoo" index.
"""

from ..fom.base import OneDimensionalSolver
from ..fom.heat import HeatEquationMovingSolver, HeatEquationSolver
from ..fom.nonlinear import OneDimensionalBurgers

MODEL_REGISTRY = {
    "heat": HeatEquationSolver,
    "heat-moving": HeatEquationMovingSolver,
    "piston": OneDimensionalBurgers,
    "burgers": OneDimensionalBurgers,
}


def get_model(name):
    """Look up a solver class by registry name."""
    try:
        return MODEL_REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"Unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}"
        ) from None


__all__ = [
    "MODEL_REGISTRY",
    "get_model",
    "OneDimensionalSolver",
    "HeatEquationSolver",
    "HeatEquationMovingSolver",
    "OneDimensionalBurgers",
]
