"""Serving engines of the ROM constructors (VERDICT r4 item 9 split).

Each module is a mixin of method groups extracted verbatim from
rom/rom.py; :class:`romtime_tpu.rom.rom.RomConstructor` composes them,
so the public API is unchanged.
"""

from .autotune import AutotuneMixin
from .mulocal import MuLocalRoutingMixin
from .pallas_global import GlobalPallasMixin
from .policy import SolvePolicyMixin
from .windowed_lanes import WindowedLanesMixin
from .windowed_pallas import WindowedPallasMixin

__all__ = [
    "AutotuneMixin",
    "GlobalPallasMixin",
    "MuLocalRoutingMixin",
    "SolvePolicyMixin",
    "WindowedLanesMixin",
    "WindowedPallasMixin",
]
