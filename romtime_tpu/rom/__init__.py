"""Reduced-order-model layer (API parity with ``romtime.rom``,
reference: src/romtime/rom/__init__.py:1-12)."""

from .base import Reductor
from .pod import orth
from .registration import DilationLaw, fit_dilation_law, resample_to_standard

__all__ = [
    "Reductor",
    "orth",
    "DilationLaw",
    "fit_dilation_law",
    "resample_to_standard",
    "RomConstructor",
    "RomConstructorMoving",
    "RomConstructorNonlinear",
    "HyperReducedOrderModelFixed",
    "HyperReducedOrderModelMoving",
    "HyperReducedPiston",
]


def __getattr__(name):
    # Lazy imports: rom/hrom pull in the deim package, which imports
    # rom.base — resolving them lazily keeps the import graph acyclic.
    if name in ("RomConstructor", "RomConstructorMoving", "RomConstructorNonlinear"):
        from . import rom as _rom

        return getattr(_rom, name)
    if name in (
        "HyperReducedOrderModelFixed",
        "HyperReducedOrderModelMoving",
        "HyperReducedPiston",
    ):
        from . import hrom as _hrom

        return getattr(_hrom, name)
    raise AttributeError(f"module 'romtime_tpu.rom' has no attribute {name!r}")
