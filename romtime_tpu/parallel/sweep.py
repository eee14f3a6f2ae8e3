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

    Contractions are pinned to full f32 precision: on TPU the default
    matmul path lowers f32 dots to bf16 passes, which injects ~1e-3
    relative operator noise into the assembled bands — measured to
    degrade a served μ-local fleet from 2.5e-7 to 3.2e-5 center-μ
    rel-L2 (2026-08-18 on-chip incident; docs/tpu_notes.md hazard).
    """
    batch = _mu_batch_dict(mus)
    with jax.default_matmul_precision("highest"):
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

    # Full-precision contractions — same TPU bf16-default hazard as
    # solve_fom_batch (see its docstring).
    with jax.default_matmul_precision("highest"):
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


def solve_online_windowed_sharded(rom, mus, mesh=None, axis=MU_AXIS,
                                  mode="probes"):
    """Windowed local-basis μ-sweep sharded over the device mesh.

    The flagship serving configuration (time-windowed bases,
    rom/windowed.py) scaled across chips: the per-window tables are
    replicated (they are μ-independent, ~MBs) and the μ-batch is split
    over the mesh's ``mu`` axis — embarrassingly parallel, no collectives,
    linear scaling over ICI. Per-chip execution is the same lane-batched
    scan-over-windows engine ``solve_batch(engine="windowed")`` compiles
    on one chip.

    Returns host arrays in ``solve_batch`` layout (batch axis first;
    ``t`` is the shared (nt,) time grid).
    """
    win = rom.windows
    assert win is not None, "call build_windowed_serving first"
    widths = set(np.diff(win.bounds).tolist())
    assert len(widths) == 1, (
        "sharded windowed serving needs equal window widths (the "
        "unequal-width chained fallback traces W scan bodies — a compile "
        f"hazard inside shard_map); got widths {sorted(widths)}"
    )
    if mesh is None:
        mesh = device_mesh()

    batch = _mu_batch_dict(mus)
    batch, n_true = _pad_batch(batch, mesh.devices.size)
    tables = rom._windowed_lanes_tables(mode)

    # Compiled-sweep cache on the ROM: μ-local cell routing swaps table
    # VALUES only (same (W, N) shapes), so one executable serves every
    # cell — without this, each per-cell call would build a fresh closure
    # and recompile.
    key = (axis, mesh, mode, tuple(sorted(batch)),
           str(next(iter(batch.values())).dtype))
    cache = getattr(rom, "_sharded_windowed_fns", None)
    if cache is None:
        cache = rom._sharded_windowed_fns = {}
    fn = cache.get(key)
    if fn is None:

        def inner(mu, tables):
            outs = rom._online_sweep_windowed(mu, tables, mode=mode)
            # Batch-last → batch-first so one prefix spec covers every
            # leaf; the batch-free time grid is rebuilt on the host below.
            outs.pop("t", None)
            return {k: jnp.moveaxis(v, -1, 0) for k, v in outs.items()}

        fn = cache[key] = jax.jit(
            jax.shard_map(
                inner,
                mesh=mesh,
                in_specs=({k: P(axis) for k in batch}, P()),
                out_specs=P(axis),
                check_vma=False,
            )
        )
    outs = fn(batch, tables)
    outs = jax.tree_util.tree_map(lambda a: np.asarray(a)[:n_true], outs)
    fom = rom.fom
    nt = int(fom.domain[fom.NT])
    outs["t"] = (np.arange(nt) + 1) * float(fom.dt)
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
