"""Device-mesh helpers."""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


MU_AXIS = "mu"


def device_mesh(n_devices=None, axis=MU_AXIS):
    """1-D device mesh over the μ-batch axis.

    The workload is data-parallel over parameters; a 1-D mesh rides ICI for
    the POD collectives and keeps every matmul local to a chip.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def mu_sharding(mesh, axis=MU_AXIS):
    """Sharding that splits the leading (μ-batch) dimension."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh):
    return NamedSharding(mesh, P())
