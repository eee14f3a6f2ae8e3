"""romtime_tpu — TPU-native reduced-order-model framework for parametrized
FEM problems on moving 1-D domains.

A from-scratch JAX/XLA rebuild with the capabilities of the reference
``romtime`` library (KikeM/romtime): full-order heat/gas-dynamics solvers on
moving domains, POD reduced bases, DEIM/MDEIM/N-MDEIM hyper-reduction, ROM
online solvers, and hyper-reduced pipeline drivers — designed TPU-first:

- banded einsum FEM assembly with ALE pull-back scale factors (no moving
  meshes, no sparse formats) — :mod:`romtime_tpu.ops`
- ``lax.scan`` time loops, direct banded solves — :mod:`romtime_tpu.fom`
- batched/vmapped online μ-sweeps and sharded offline snapshot pipelines —
  :mod:`romtime_tpu.rom`, :mod:`romtime_tpu.parallel`
"""

__version__ = "0.1.0"

from . import conventions, parameters, utils  # noqa: F401
