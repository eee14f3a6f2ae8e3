"""Measured matrices-vs-thetas autotuning with persisted decisions.

Extracted from rom/rom.py (VERDICT r4 item 9: engine split). Mixin
methods of :class:`romtime_tpu.rom.rom.RomConstructor` — the
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


class AutotuneMixin:
    def _autotune_key(self, engine, mode, B):
        N = (self.windows.N if self.windows is not None
             and engine.startswith("windowed") else self.N)
        fom = self.fom
        nt = int(fom.domain[fom.NT])
        return (f"{jax.default_backend()}|{engine}|{mode}|N{N}|B{B}"
                f"|nt{nt}|{np.dtype(compute_dtype()).name}")

    def autotune_online_precompute(self, mus, mode="probes", engine=None,
                                   n_rep=3, path=None, store=True):
        """Measure the matrices-vs-θ crossover at the CURRENT serving
        configuration and pin the faster variant.

        The static ``ONLINE_PRECOMPUTE_BUDGET`` only approximates the HBM
        crossover between materializing the reduced-operator time tables
        (bandwidth-bound, fastest scan body when it fits) and per-step
        θ-recombination on the MXU (~15× less HBM traffic). This times one
        batched sweep per variant — chained through data dependencies so
        the timing is honest on lazy backends (docs/tpu_notes.md) — sets
        the measured winner as the override consulted by
        ``_precompute_choice``, and persists the measurement keyed by
        (platform, engine, mode, N, B, nt, dtype) so later processes can
        ``load_autotune`` instead of paying the double compile.

        Returns the measurement record. Each variant costs one extra
        compile of the online sweep (seconds on XLA, up to minutes for the
        Mosaic serving kernels) — run once per deployment configuration.
        """
        import time as _time

        names = sorted(mus[0].keys())
        batch = {
            k: _asarray(np.array([float(mu[k]) for mu in mus]))
            for k in names
        }
        B = len(mus)
        if engine is None:
            engine = self._resolve_engine(mode, B)
        if engine == "vmap":
            raise ValueError(
                "autotune applies to the table-driven batched engines "
                "(lanes/pallas/windowed*) — the vmap fallback has no "
                "matrices-vs-θ choice"
            )
        key = self._autotune_key(engine, mode, B)
        self._prime_online_tables()

        @jax.jit
        def _perturb(v, acc, k):
            return v + acc * 1e-30 + k * 1e-9

        name0 = names[0]
        prev_override = getattr(self, "_precompute_override", None)
        walls = {}
        try:
            for variant in ("matrices", "thetas"):
                self._precompute_override = variant
                self._online_fns = {}
                self._windowed_pallas_tbl = None
                sweep = self._get_online_fn(batched=True, mode=mode,
                                            engine=engine)

                def chain(reps):
                    acc = jnp.asarray(0.0, batch[name0].dtype)
                    for k in range(reps):
                        b2 = dict(batch)
                        b2[name0] = _perturb(b2[name0], acc, float(k))
                        o = sweep(b2)
                        # Chain through every μ-dependent output (never
                        # the batch-free time grid) so each sweep must
                        # fully execute before the next dispatches.
                        acc = sum(
                            (jnp.sum(v).astype(acc.dtype)
                             for k, v in o.items() if k != "t"),
                            start=jnp.zeros_like(acc),
                        )
                    return float(np.asarray(acc))

                chain(1)  # compile + execute
                chain(n_rep)  # warm
                t0 = _time.perf_counter()
                chain(1)
                w1 = _time.perf_counter() - t0
                t0 = _time.perf_counter()
                chain(n_rep)
                wk = _time.perf_counter() - t0
                wall = (wk - w1) / max(n_rep - 1, 1)
                if wall < 0.05 * wk / n_rep:  # below clock resolution
                    wall = wk / n_rep
                walls[variant] = wall
        except BaseException:
            # Compiled entries embody the forced variant; with the
            # override restored they would serve the wrong structure.
            self._precompute_override = prev_override
            self._online_fns = {}
            self._windowed_pallas_tbl = None
            raise
        winner = min(walls, key=walls.get)
        self._precompute_override = winner
        if winner != "thetas":
            # The caches hold the last-timed variant ("thetas"); drop
            # them so the next solve recompiles the winner. When the
            # winner IS the last-timed variant, keep its compiled sweep
            # — a Mosaic serving-kernel compile costs minutes.
            self._online_fns = {}
            self._windowed_pallas_tbl = None
        record = {"winner": winner, "wall_s": walls}
        if store:
            path = path or self.AUTOTUNE_PATH
            table = {}
            if os.path.exists(path):
                with open(path) as f:
                    table = json.load(f)
            table[key] = record
            with open(path, "w") as f:
                json.dump(table, f, indent=1, sort_keys=True)
        return dict(record, key=key)

    def load_autotune(self, B, mode="probes", engine=None, path=None):
        """Pin a previously measured matrices-vs-θ winner for the current
        serving configuration (see autotune_online_precompute). Returns
        the record, or None when this configuration was never measured."""
        path = path or self.AUTOTUNE_PATH
        if not os.path.exists(path):
            return None
        if engine is None:
            engine = self._resolve_engine(mode, B)
        with open(path) as f:
            table = json.load(f)
        record = table.get(self._autotune_key(engine, mode, B))
        if record is not None and (getattr(self, "_precompute_override",
                                           None) != record["winner"]):
            self._precompute_override = record["winner"]
            # Already-compiled sweeps have the previous choice baked in.
            self._online_fns = {}
            self._windowed_pallas_tbl = None
        return record


