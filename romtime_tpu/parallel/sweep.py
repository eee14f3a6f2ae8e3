"""Batched and sharded μ-sweeps.

The offline FOM sweep (reference: rom/rom.py:317-327, serial) and the online
ROM sweep (reference: rom/hrom.py:521-526, serial) become one compiled
program each: ``vmap`` over the μ-batch on a chip, ``shard_map`` over the
mesh's μ axis across chips.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..dtypes import asarray as _asarray
from ..parameters import parameters_to_array
from .mesh import MU_AXIS, device_mesh


def _mu_batch_dict(mus, names=None):
    if isinstance(mus, dict):
        return {k: _asarray(v) for k, v in mus.items()}
    arr, names = parameters_to_array(mus, names)
    return {name: _asarray(arr[:, j]) for j, name in enumerate(names)}


def _pad_batch(batch, multiple):
    """Pad the μ-batch to a device multiple by repeating the last sample."""
    n = next(iter(batch.values())).shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return batch, n
    padded = {
        k: jnp.concatenate([v, jnp.repeat(v[-1:], pad, axis=0)])
        for k, v in batch.items()
    }
    return padded, n


def solve_fom_batch(solver, mus):
    """Vmapped FOM sweep on one device.

    Returns the stacked scan outputs (leading axis = μ):
    ``uh`` (n_mu, nt, nh), ``uc``, ``x``, ``t`` and solver extras.
    """
    batch = _mu_batch_dict(mus)
    fn = jax.jit(jax.vmap(solver._solve_impl))
    return jax.tree_util.tree_map(np.asarray, fn(batch))


def solve_fom_sharded(solver, mus, mesh=None, axis=MU_AXIS):
    """FOM sweep sharded over the device mesh's μ axis.

    Each device runs the scanned time loop for its μ-shard; no collectives
    are required (embarrassingly parallel), so scaling is linear in chips.
    """
    if mesh is None:
        mesh = device_mesh()

    batch = _mu_batch_dict(mus)
    batch, n_true = _pad_batch(batch, mesh.devices.size)

    inner = jax.vmap(solver._solve_impl)
    fn = jax.jit(
        jax.shard_map(
            inner,
            mesh=mesh,
            in_specs=({k: P(axis) for k in batch},),
            out_specs=P(axis),
            check_vma=False,
        )
    )
    outs = fn(batch)
    outs = jax.tree_util.tree_map(lambda a: np.asarray(a)[:n_true], outs)
    return outs


def solve_online_sharded(rom, mus, mesh=None, axis=MU_AXIS, mode="reduced"):
    """Online ROM μ-sweep sharded over the device mesh.

    The TPU-native form of the north-star metric: thousands of reduced BDF
    solves per launch, vmapped within a chip and sharded across chips.
    """
    if mesh is None:
        mesh = device_mesh()

    batch = _mu_batch_dict(mus)
    batch, n_true = _pad_batch(batch, mesh.devices.size)

    inner = jax.vmap(partial(rom._online_scan, mode=mode))
    fn = jax.jit(
        jax.shard_map(
            inner,
            mesh=mesh,
            in_specs=({k: P(axis) for k in batch},),
            out_specs=P(axis),
            check_vma=False,
        )
    )
    outs = fn(batch)
    outs = jax.tree_util.tree_map(lambda a: np.asarray(a)[:n_true], outs)
    return outs
