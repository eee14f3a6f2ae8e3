"""Problem definitions — the user-facing API surface
(reference: src/romtime/problems/)."""

from .mfp1 import define_mfp1_problem
from .piston import define_piston_problem

__all__ = ["define_mfp1_problem", "define_piston_problem", "mfp1_legacy"]
