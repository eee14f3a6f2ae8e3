"""Numeric and IO utilities (TPU-native analog of the reference's
``romtime.utils``, reference: src/romtime/utils.py).

The FEniCS/PETSc bridge functions of the reference (``bilinear_to_csr``,
``function_to_array`` …) have no meaning here: operators are assembled
directly as banded arrays (see :mod:`romtime_tpu.ops`). What remains is the
linear-algebra/certification/IO layer.
"""

from .numeric import (
    compute_rom_difference,
    eliminate_zeros_vector,
    project_dense,
    singular_to_energy,
    singular_to_pod_error,
    time_average,
)
from .io import (
    dump_csv,
    dump_json,
    dump_npz,
    dump_pickle,
    read_json,
    read_npz,
    read_pickle,
)
from .profiling import PhaseTimer, block_and_time, jax_trace
from .progress import progress

__all__ = [
    "compute_rom_difference",
    "eliminate_zeros_vector",
    "project_dense",
    "singular_to_energy",
    "singular_to_pod_error",
    "time_average",
    "dump_csv",
    "dump_json",
    "dump_npz",
    "dump_pickle",
    "read_json",
    "read_npz",
    "read_pickle",
    "PhaseTimer",
    "block_and_time",
    "jax_trace",
]
