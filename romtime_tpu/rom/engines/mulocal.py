"""Mu-local (Mach-cell) routed serving over a fleet of windowed
configurations.

Extracted from rom/rom.py (VERDICT r4 item 9: engine split). Mixin
methods of :class:`romtime_tpu.rom.rom.RomConstructorNonlinear` — the
public serving API is unchanged.
"""

import json
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...conventions import BDF, Stage
from ...dtypes import (
    asarray as _asarray,
    compute_dtype,
    compute_dtype_scope,
    scalar as _scalar,
)
from ...ops.compensated import (
    dd_add_small,
    dd_bdf2_predict,
    dd_history_diff,
    dd_matvec,
)
from ...ops.linalg import gauss_solve, gauss_solve_lanes


def _trace_state_clean():
    """True when no JAX trace is active (eager probes are safe)."""
    try:
        return jax.core.trace_state_clean()
    except AttributeError:
        return True


class MuLocalRoutingMixin:
    # ------------------------------------------------------------------
    # μ-local windowed serving (no reference analog — the reference
    # serves one global basis for the whole μ-box, rom/rom.py:430-555)
    # ------------------------------------------------------------------
    def solve_batch_mulocal(self, mus, step=Stage.ONLINE, mode="probes",
                            engine=None, sweep_fn=None):
        """Route each μ to its Mach cell's windowed tables and sweep.

        The piston manifold's Kolmogorov width decays slowly across the
        full Mach range (measured: one box-wide W=30/N=40 basis built
        from 8 trajectories has a ~1.5e-4 projection floor everywhere,
        scripts/multimu_diag.py); Mach-local bases restore the fast local
        decay at UNCHANGED online cost — every cell shares (W, N), so
        every sub-batch runs through the SAME compiled engine with its
        cell's tables passed as runtime arguments.

        Each cell's sub-batch is padded (by cycling its own μ) to the
        full batch length so one compiled shape serves all cells; outputs
        are merged back in input order, batch-first. Costs K× the
        arithmetic of a single sweep at certification batch sizes —
        production serving would batch per cell instead.

        ``sweep_fn(mus) -> outs`` overrides the per-cell sweep (default:
        ``solve_batch`` with the given step/mode/engine) — e.g.
        ``parallel.sweep.solve_online_windowed_sharded`` to run each
        cell's sub-batch sharded over a device mesh.
        """
        def run_cell(_c, sub):
            if sweep_fn is not None:
                return sweep_fn(sub)
            return self.solve_batch(sub, step=step, mode=mode,
                                    engine=engine)

        return self.route_mulocal(mus, run_cell)

    def route_mulocal(self, mus, run_cell):
        """Shared μ-local router: group the μs by Mach cell, run
        ``run_cell(cell_index, sub_mus)`` with that cell's serving tables
        attached (sub-batch padded to the full batch length by cycling its
        own μ, so one compiled shape serves all cells), and merge the
        batch-first output rows back in input order. Restores the
        pre-routing serving windows. Backbone of ``solve_batch_mulocal``
        and ``HyperReducedPiston.estimate_batch_mulocal``."""
        ml = self.mulocal
        if ml is None:
            raise ValueError("no μ-local serving attached — build it with "
                             "HyperReducedPiston.build_mulocal_serving")
        mach = np.array(
            [self.compute_piston_mach_number(mu) for mu in mus]
        )
        cells = np.asarray(ml.cell_of(mach))
        n = len(mus)
        prev = self.windows
        rows = {}      # batch-first keys: per-index rows, merged below
        passthru = {}  # non-batch keys: first cell's value
        try:
            for c in sorted(set(cells.tolist())):
                idx = np.nonzero(cells == c)[0]
                sub = [dict(mus[int(i)]) for i in idx]
                sub = (sub * -(-n // len(sub)))[:n]
                self._set_serving_windows(ml.cells[int(c)])
                outs = run_cell(int(c), sub)
                for k, v in outs.items():
                    if np.ndim(v) >= 1 and len(v) == n:
                        slot = rows.setdefault(k, [None] * n)
                        for j, i in enumerate(idx):
                            slot[int(i)] = np.asarray(v[j])
                    elif k not in passthru:
                        passthru[k] = np.copy(v)
        finally:
            self._set_serving_windows(prev)
        merged = dict(passthru)
        for k, lst in rows.items():
            # Mixed registration fleets: a phase-aligned cell emits
            # per-row "t"/"dil" while unregistered cells emit a shared
            # "t" (passthru) and no "dil" — fill the unregistered rows
            # with the shared grid / the identity dilation.
            if any(r is None for r in lst):
                if k == "dil":
                    fill = np.asarray(1.0)
                elif k == "dil_oor":
                    # Unregistered cells have no law to extrapolate.
                    fill = np.asarray(0.0)
                elif k in passthru:
                    fill = np.asarray(passthru[k])
                else:
                    raise ValueError(
                        f"μ-local merge: output '{k}' missing for some "
                        "cells and no shared fallback value exists"
                    )
                lst = [fill if r is None else r for r in lst]
            # Mixed-(W, N) fleets: per-row shapes can differ across
            # cells (e.g. reduced coordinates at per-cell N) — keep a
            # list of rows then; stack only when shapes agree.
            shapes = {r.shape for r in lst}
            merged[k] = np.stack(lst) if len(shapes) == 1 else lst
        return merged
