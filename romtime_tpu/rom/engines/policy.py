"""Serving solve/precompute policy: matrices-vs-thetas byte budget and
the measured per-window Richardson iteration estimate.

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


_UNSET = object()


class SolvePolicyMixin:
    def _precompute_choice(self, mat_bytes):
        """True → materialize the operator time tables. The measured
        autotune override wins when present (still guarded by the
        HBM-fit hard cap); otherwise the static policy (materialize when
        configured AND the tables fit the byte budget)."""
        override = getattr(self, "_precompute_override", None)
        if override is not None:
            return (override == "matrices"
                    and mat_bytes <= self.ONLINE_PRECOMPUTE_HARD_CAP)
        return (self.ONLINE_PRECOMPUTE == "matrices"
                and mat_bytes <= self.ONLINE_PRECOMPUTE_BUDGET)

    # Residual-form compensated stepping (ops/compensated.py): solve for
    # the step increment δ against a double-f32 carried state, which keeps
    # the f32 recursion within ~1e-8 of the f64 trajectory. "auto" enables
    # it exactly when serving in float32; f64 offline runs stay on the
    # plain path (bit-compatible with the goldens).
    COMPENSATED = "auto"

    # Richardson iterations for the fused windowed kernel's per-step
    # solve (ops/pallas_online._richardson_solve): one per-window
    # inversion of the mean step matrix + this many refinements per step
    # replace the per-step blocked LU. "auto" measures the within-window
    # contraction factor ρ = ‖I − K̄_w⁻¹K(t)‖ at the μ-box corners once
    # per serving configuration and picks the iteration count that
    # reaches the f32 band — or falls back to the LU when Richardson
    # would need too many iterations to win (ρ too large: short-horizon
    # configs where dt·S varies strongly within a window). None = LU.
    # Override with ROMTIME_SOLVE_ITERS (0 → LU).
    WINDOWED_SOLVE_ITERS = "auto"
    WINDOWED_SOLVE_ITERS_CAP = 12
    # Measured on-chip crossover (v5e, W=30/N=40/B=2048 headline point,
    # TPU campaign 2026-08-18): Richardson at 8 iterations spends
    # 70.5 µs/step in the solve vs the blocked LU's 61.7 µs — the
    # per-iteration matvec pair costs ~7-9 µs, so Richardson only wins
    # when the contraction reaches the f32 band in ≤5 iterations. Above
    # this the auto-selector prefers the LU even though Richardson would
    # still be ACCURATE (the 12-iter cap above is the accuracy bound).
    WINDOWED_SOLVE_ITERS_PERF_CAP = 5

    # Paired-step LU panel reuse for the fused windowed kernel: factorize
    # once per group of this many steps (panel-saving blocked LU,
    # ops/pallas_online._lanes_solve_panels) and solve the followers by
    # substitution + one refinement against their true per-step KN. The
    # per-step θ drift is ~0.1% at serving dt (within-window variation
    # ≤4%, ROADMAP round-3 probe), so one refinement lands below the f32
    # solve roundoff — unlike the window-mean Richardson preconditioner,
    # the staleness here is ≤G−1 steps, not half a window. None/0 = off
    # (per-step LU). Override with ROMTIME_PAIRED_LU (group size ≥ 2).
    # Default G=5/sub1: certified on the v5e chip 2026-08-21 at probe
    # fidelity IDENTICAL to the per-step LU (served_engine_probe_err
    # 5.128e-6, 15-μ max 9.70e-7, f32 drift 8.88e-7 — all unchanged)
    # for +10.8% headline throughput (27,155 vs 24,517 solves/s).
    # G=7+/warm1 and G=5/warmx measured FASTER (29-30k) but fail probe
    # certification (1.3e-4 — single-refinement start error × staleness
    # at real wave dynamics); see ROADMAP round-5 session-2 ledger.
    WINDOWED_PAIRED_LU = 5
    # Follower solve flavor: "sub1" (substitute the fresh rhs + one
    # refinement — 2 substitutions + 1 matvec), "warm1" (warm start from
    # the previous step's delta + one refinement — 1 substitution +
    # 1 matvec, but the ~1%/step delta drift times the panel staleness
    # leaves ~5e-4 probe error at G≥7: measured NOT serving-grade),
    # "warm2" (warm start + two refinements), "warmx" (linear
    # EXTRAPOLATION 2·δ_{n-1} − δ_{n-2} as the start — curvature-sized
    # ~1e-4 start error — + one refinement; warm1's cost at sub1-class
    # accuracy). Override with ROMTIME_PAIRED_MODE.
    WINDOWED_PAIRED_MODE = "sub1"

    def _windowed_paired_lu(self):
        env = os.environ.get("ROMTIME_PAIRED_LU")
        if env is not None and env != "":
            n = int(env)
            return n if n >= 2 else None
        return self.WINDOWED_PAIRED_LU

    def _windowed_paired_mode(self):
        return os.environ.get("ROMTIME_PAIRED_MODE",
                              self.WINDOWED_PAIRED_MODE)

    def _windowed_solve_iters(self):
        env = os.environ.get("ROMTIME_SOLVE_ITERS")
        if env is not None and env != "":
            n = int(env)
            return n if n > 0 else None
        setting = self.WINDOWED_SOLVE_ITERS
        if setting == "auto":
            return self._auto_solve_iters()
        return setting

    def _auto_solve_iters(self):
        """Measured Richardson viability for the serving windows:
        estimate ρ = ‖I − K̄_w⁻¹K(μ,t)‖₂ over the window ends and the
        μ-box corners (the strongest within-window θ variation), then
        size the iteration count to reach the f32 serving band with a
        ×1.3+0.02 margin for the state-dependent trilinear term the
        linear probe omits. Returns None (→ blocked LU) when the count
        exceeds the accuracy cap (12) or the measured perf crossover
        (WINDOWED_SOLVE_ITERS_PERF_CAP = 5: on the chip, 8 Richardson
        iterations measured SLOWER than the blocked LU — 70.5 vs
        61.7 µs/step solve at the headline W=30/N=40 point). Measured ρ:
        ≈ 0.01-0.04 at the headline point (→ 8 iterations → LU via the
        perf cap), ≈ 0.5+ at short-horizon toy configs (W=4/nt=96),
        which fall back via the accuracy cap. Cached per serving
        configuration.

        With a μ-local fleet attached whose cells include the active
        windows, the WORST CASE across the active cell's (W, N) GROUP
        decides (LU if any cell in the group needs it): cells sharing a
        shape share ONE compiled kernel — the iteration count is baked
        in at trace time and `_set_serving_windows` deliberately keeps
        the compiled engines across same-shape cell swaps — so the
        baked count must be valid for every cell that kernel will
        serve. Cells at a DIFFERENT (W, N) (mixed fleets, cell_wn)
        retrace their own engine and decide independently — a uniform
        fleet degenerates to the whole-fleet worst case."""
        win = self.windows
        if win is None:
            return None
        ml = getattr(self, "mulocal", None)
        if ml is not None and any(win is c for c in ml.cells):
            shape = (win.n_windows, win.N)
            cache = getattr(self, "_auto_iters_cache_ml", None)
            if (isinstance(cache, dict) and cache.get("ml") is ml
                    and shape in cache):
                return cache[shape]
            if not _trace_state_clean():
                # Probes need eager execution: fall back to the LU for
                # THIS consult only — never cache the trace-time
                # fallback as the fleet's permanent decision.
                return None
            group = [c for c in ml.cells
                     if (c.n_windows, c.N) == shape]
            per_cell = [self._auto_iters_for(c) for c in group]
            result = (None if any(r is None for r in per_cell)
                      else max(per_cell))
            if not isinstance(cache, dict) or cache.get("ml") is not ml:
                cache = {"ml": ml}
                self._auto_iters_cache_ml = cache
            cache[shape] = result
            return result
        return self._auto_iters_for(win)

    def _auto_iters_for(self, win):
        """Per-windows-configuration iteration estimate (see
        _auto_solve_iters). Memoized on the WindowedServing object
        itself (its lifetime IS the cache lifetime — no retained refs
        to dead configurations)."""
        memo = getattr(win, "_auto_iters_memo", _UNSET)
        if memo is not _UNSET:
            return memo
        # The θ-entry probes below must run eagerly; under an active
        # trace (not primed by _windowed_pallas_tables — e.g. a direct
        # jit of the sweep) fall back to the LU for this consult only.
        if not _trace_state_clean():
            return None

        import itertools

        fom = self.fom
        nt = int(fom.domain[fom.NT])
        W = win.n_windows
        N = win.N
        dt = float(fom.dt)
        sources = self._theta_sources()
        stiff = [n for n in sources if n not in ("mass", "rhs_vec")]

        corners = []
        for vals in itertools.product(*[
            (float(min(d.support())), float(max(d.support())))
            for d in self.grid.values()
        ]):
            mu = dict(zip(self.grid.keys(), vals))
            if mu not in corners:
                corners.append(mu)

        bounds = np.asarray(win.bounds)
        # Pin the tiny eager θ-entry probes to the CPU backend: on the
        # axon TPU each np.asarray is a lazy-runtime fetch over the
        # tunnel (~100 ms), and this probe runs a few hundred of them.
        try:
            _cpu = jax.devices("cpu")[0]
        except RuntimeError:
            _cpu = None
        import contextlib

        ctx = (jax.default_device(_cpu) if _cpu is not None
               else contextlib.nullcontext())
        rho = 0.0
        with ctx:
            rho = self._auto_iters_rho(corners[:8], bounds, sources,
                                       stiff, dt, W, N, win)
        rho_eff = min(rho * 1.3 + 0.02, 0.999)
        iters = int(np.ceil(np.log(3e-8) / np.log(rho_eff)))
        cap = min(self.WINDOWED_SOLVE_ITERS_CAP,
                  self.WINDOWED_SOLVE_ITERS_PERF_CAP)
        result = iters if iters <= cap else None
        win._auto_iters_memo = result
        return result

    def _auto_iters_rho(self, corners, bounds, sources, stiff, dt, W, N,
                        win):
        rho = 0.0
        for mu_c in corners:
            mu_b = {k: jnp.asarray(np.array([v]), jnp.float64)
                    for k, v in mu_c.items()}

            def K_at(w, step):
                t = jnp.asarray((step + 1) * dt, jnp.float64)
                K = 1.5 * np.asarray(
                    sources["mass"][0]._entries_traced(mu_b, t)
                )[:, 0] @ np.asarray(win.combines["mass"][w]).T
                for nm in stiff:
                    K = K + dt * (
                        np.asarray(
                            sources[nm][0]._entries_traced(mu_b, t)
                        )[:, 0]
                        @ np.asarray(win.combines[nm][w]).T
                    )
                return K.reshape(N, N)

            for w in range(0, W, max(1, W // 4)):
                a, b = int(bounds[w]), int(bounds[w + 1]) - 1
                Kbar = 0.5 * (K_at(w, a) + K_at(w, b))
                Kinv = np.linalg.inv(Kbar)
                for s in (a, b):
                    M = np.eye(N) - Kinv @ K_at(w, s)
                    rho = max(rho, float(
                        np.linalg.norm(M, 2)
                    ))
        return rho

