"""Multi-chip execution layer.

The reference is single-process/single-thread end-to-end (SURVEY.md §2.2);
this package supplies the parallel structure the algorithms expose:

- **μ-batch data parallelism**: offline FOM sweeps and online ROM sweeps are
  embarrassingly parallel over parameters → ``shard_map`` over a device
  mesh's ``mu`` axis (:mod:`sweep`).
- **snapshot-axis parallelism**: POD of the Nh×(nt·nμ) snapshot matrix via
  TSQR with ICI collectives (:mod:`tsqr`).

All entry points degrade gracefully to a single device.
"""

from .mesh import device_mesh, mu_sharding
from .tsqr import tsqr_svd, orth_distributed
from .sweep import (
    solve_fom_batch,
    solve_fom_sharded,
    solve_online_sharded,
    solve_online_windowed_sharded,
)

__all__ = [
    "device_mesh",
    "mu_sharding",
    "tsqr_svd",
    "orth_distributed",
    "solve_fom_batch",
    "solve_fom_sharded",
    "solve_online_sharded",
    "solve_online_windowed_sharded",
]
