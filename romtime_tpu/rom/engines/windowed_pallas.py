"""Time-windowed fused pallas serving: stacked per-window tables, the
jitted theta prep stage, per-lane dilation (registration) plumbing and
the two-stage kernel sweep.

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


class WindowedPallasMixin:
    def _windowed_pallas_tables(self):
        """Stacked per-window constant tensors for the fused serving path,
        built host-side ONCE as eager device arrays and passed to the
        jitted sweep as ARGUMENTS. Creating them at trace time embeds
        multi-MB literals in the HLO (T0 alone is W·NP²·NP f32 ≈ 11 MB at
        W=25/NP=48), which the remote-compile tunnel and XLA choke on —
        the observed 40-minute serving-sweep compiles."""
        if getattr(self, "_windowed_pallas_tbl", None) is not None:
            return self._windowed_pallas_tbl
        from ...ops.pallas_online import PROBE_P, pad_dim

        win = self.windows
        fom = self.fom
        N = win.N
        NP = pad_dim(N)
        W = win.n_windows
        sources = self._theta_sources()
        stiff_names = [n for n in sources if n not in ("mass", "rhs_vec")]

        def pad8(k):
            return -(-k // 8) * 8

        km = win.combines["mass"].shape[2]
        km8 = pad8(km)
        kk = sum(win.combines[n].shape[2] for n in stiff_names) + 1
        kk8 = pad8(kk)
        kf = win.combines["rhs_vec"].shape[2]
        kf8 = pad8(kf)

        Bm_np = np.zeros((W, NP * NP, km8), np.float32)
        Bk_np = np.zeros((W, NP * NP, kk8), np.float32)
        Bf_np = np.zeros((W, NP, kf8), np.float32)
        VE_np = np.zeros((W, PROBE_P, NP), np.float32)
        T0_np = np.zeros((W, NP * NP, NP), np.float32)
        for w in range(W):
            bm = np.zeros((NP, NP, km8), np.float32)
            bm[:N, :N, :km] = win.combines["mass"][w].reshape(N, N, km)
            Bm_np[w] = bm.reshape(NP * NP, km8)
            bk = np.zeros((NP, NP, kk8), np.float32)
            col = 0
            for n in stiff_names:
                Cw = win.combines[n][w]
                k = Cw.shape[1]
                bk[:N, :N, col:col + k] = (
                    Cw.reshape(N, N, k) * float(fom.dt)
                )
                col += k
            bk[np.arange(N, NP), np.arange(N, NP), col] = 1.0
            Bk_np[w] = bk.reshape(NP * NP, kk8)
            Bf_np[w, :N, :kf] = win.combines["rhs_vec"][w] * float(fom.dt)
            VE_np[w, :2, :N] = win.Vs[w][[0, -1], :]
            if win.trilinear is not None:
                t0 = np.zeros((NP, NP, NP), np.float32)
                t0[:N, :N, :N] = win.trilinear[w].reshape(N, N, N)
                T0_np[w] = t0.reshape(NP * NP, NP)
        T_np = np.concatenate(
            [np.eye(N, dtype=np.float32)[None],
             np.asarray(win.transfers, np.float32)], axis=0
        )
        # Zero-padded transfers for the fused in-kernel boundary transfer
        # (padded state entries are exactly 0, so zero columns/rows are
        # numerically inert).
        Tp_np = np.zeros((W, NP, NP), np.float32)
        Tp_np[:, :N, :N] = T_np
        # Fused v3 kernel layouts (all transposed: big axis minor, so the
        # VMEM-resident tensors waste no 128-lane tile padding):
        #   Bmk  — FOLDED [Bm | Bk | T0] along k (ONE output-stream-bound
        #   solve-matrix dot/step materializes bdf·MN + dt·S + dt·b0·N(u*)
        #   — the runtime rhs rows for the T0 block are dt·b0·u*),
        #   BmF/BkF — k-stacked factored tensors for the θ-factored r0
        #   matvecs (row (k, n) = Bm3[n, :, k]),
        #   TQ — the [i, (j,k)]-permuted trilinear for the quadratic-form
        #   residual term (an NP-row dot against vec(u*⊗u*) instead of an
        #   NP²-row NN materialization).
        with_tri = win.trilinear is not None
        Bmk_np = np.concatenate(
            [Bm_np, Bk_np] + ([T0_np] if with_tri else []), axis=2
        )
        # The factored r0 tensors carry only the REAL k rows (km mass
        # combines; kk stiffness-side combines incl. the padded-diagonal
        # identity row): their dot cost is output-stream-bound in k·NP
        # rows, so the 8-padding that the θ-table sublane layout wants
        # would stream 8/km× wasted rows (mass k=1 → 8).
        BmF_np = (Bm_np[:, :, :km].reshape(W, NP, NP, km)
                  .transpose(0, 3, 1, 2).reshape(W, km * NP, NP))
        BkF_np = (Bk_np[:, :, :kk].reshape(W, NP, NP, kk)
                  .transpose(0, 3, 1, 2).reshape(W, kk * NP, NP))
        tbl = {
            "Bm": jnp.asarray(Bm_np), "Bk": jnp.asarray(Bk_np),
            "Bf": jnp.asarray(Bf_np), "VE": jnp.asarray(VE_np),
            "T0": jnp.asarray(T0_np), "T": jnp.asarray(T_np),
            "Tp": jnp.asarray(Tp_np),
            "Bmk": jnp.asarray(Bmk_np.transpose(0, 2, 1)),
            "BmF": jnp.asarray(BmF_np.transpose(0, 2, 1)),
            "BkF": jnp.asarray(BkF_np.transpose(0, 2, 1)),
            "BfT": jnp.asarray(Bf_np.transpose(0, 2, 1)),
            # T0_np is [(i,j), k]; a plain reshape of its leading axis
            # gives the [i, (j,k)] quadratic-form layout.
            "TQ": jnp.asarray(T0_np.reshape(W, NP, NP * NP)),
        }
        if win.dilation is not None:
            # Phase-aligned serving: the law's COEFFICIENTS are runtime
            # table values (cell swaps reuse the compiled sweep — a
            # trace-time read would bake the first cell's law), while
            # its feature names are part of the compile key.
            tbl["dil_coef"] = jnp.asarray(win.dilation.coef, jnp.float32)
            if win.dilation.has_guard:
                # Serve-time extrapolation guard (rom/registration.py):
                # normalized training feature cloud + flag threshold,
                # runtime values for the same cell-swap reason.
                from ..registration import GUARD_FACTOR

                tbl["dil_guard_feats"] = jnp.asarray(
                    win.dilation.guard_feats, jnp.float32)
                tbl["dil_guard_inv_span"] = jnp.asarray(
                    win.dilation.guard_inv_span, jnp.float32)
                tbl["dil_guard_thresh"] = jnp.asarray(
                    GUARD_FACTOR * win.dilation.guard_dref, jnp.float32)
        self._windowed_pallas_tbl = tbl
        # Prime the Richardson auto-iteration estimate HERE (host-side,
        # eager): _windowed_solve_iters is consulted inside the traced
        # sweep, where the θ-entry probes would leak tracers.
        self._windowed_solve_iters()
        return tbl

    def _windowed_pallas_prep(self, mu, tables):
        """Stage 1 of the fused windowed serving: θ entry tables (gathered
        local assembly over the full time grid), the padded lifting-probe
        table and the trilinear coefficient — compiled SEPARATELY from the
        kernel scan (stage 2). One fused program takes XLA's optimizer
        >17 min at the headline shapes; the two stages compile in ~2.5 min
        and ~6 min and chain through HBM-resident tables."""
        from ...ops.pallas_online import PROBE_P

        win = self.windows
        fom = self.fom
        nt = int(fom.domain[fom.NT])
        dtype = jnp.float32
        dt = _scalar(fom.dt)
        B = int(next(iter(mu.values())).shape[0])

        sources = self._theta_sources()
        ts_grid = (jnp.arange(nt) + 1).astype(dtype) * dt
        dil = self._windowed_dilation(mu, tables.get("dil_coef"))
        if dil is not None:
            # Phase-aligned serving: each lane integrates on its own
            # dilated grid t_k = (k+1)·d_b·dt (rom/registration.py) —
            # θ entries evaluate at per-lane times; the dt-scaled θ
            # streams and the trilinear coefficient pick up the d_b
            # factor below. Window schedules stay batch-uniform.
            ts_grid = ts_grid[:, None] * dil[None, :].astype(dtype)
        ent = {
            name: jax.vmap(
                lambda t, red=red: red._entries_traced(mu, t)
            )(ts_grid).astype(dtype)
            for name, (red, _fb) in sources.items()
        }  # (nt, k, B)
        if dil is not None:
            dil_f = dil.astype(dtype)
            for name in ent:
                if name != "mass":
                    # dt-side terms: dt_b = d_b·dt, with dt folded into
                    # the combine tensors — the θ stream carries d_b.
                    ent[name] = ent[name] * dil_f[None, None, :]
        stiff_names = [n for n in sources if n not in ("mass", "rhs_vec")]

        km8 = tables["Bm"].shape[2]
        kk8 = tables["Bk"].shape[2]
        kf8 = tables["Bf"].shape[2]

        def ent_pad(th, k8):
            k = th.shape[1]
            if k == k8:
                return th
            return jnp.concatenate(
                [th, jnp.zeros((th.shape[0], k8 - k, B), dtype)], axis=1
            )

        THm_full = ent_pad(ent["mass"], km8)
        THk_full = ent_pad(
            jnp.concatenate(
                [ent[n] for n in stiff_names]
                + [jnp.ones((nt, 1, B), dtype)], axis=1,
            ),
            kk8,
        )
        THf_full = ent_pad(ent["rhs_vec"], kf8)

        if win.trilinear is not None:
            b0 = jnp.asarray(
                self.fom.nonlinear_coefficient(mu), dtype
            ) * jnp.ones((B,), dtype)
            if dil is not None:
                # The kernels apply the trilinear as NN·(dt·b0) — the
                # per-lane d_b folds into b0, so dt stays a static
                # scalar and the kernels are untouched.
                b0 = b0 * dil_f
            b0 = b0[None, :]
        else:
            b0 = jnp.ones((1, B), dtype)

        def g_at(t):
            scale = fom.scale_factor(mu, t) if fom.Lt else _scalar(1.0)
            L = fom.domain[fom.L0] * scale * jnp.ones((B,), dtype=dtype)
            g = fom.create_lifting_operator(mu=mu, t=t, L=L, only_g=True)
            return g(jnp.stack([jnp.zeros_like(L), L]))

        g_tab = jax.vmap(g_at)(ts_grid)
        g_full = jnp.zeros((nt, PROBE_P, B), dtype).at[:, :2, :].set(
            g_tab.astype(dtype)
        )
        out = {"THm": THm_full, "THk": THk_full, "THf": THf_full,
               "g": g_full, "b0": b0}
        if dil is not None:
            out["dil"] = dil.astype(dtype)
            oor = self._windowed_dilation_oor(mu, tables)
            if oor is not None:
                out["dil_oor"] = oor
        return out

    def _windowed_dilation(self, mu, coef):
        """Per-lane time dilation d(μ_b) for phase-aligned serving —
        ``None`` when the active windowed configuration carries no
        registration law. ``coef`` comes from the runtime table pytree
        (cell swaps reuse compiled sweeps); the law's feature NAMES are
        static per compiled fn (part of the `_get_online_fn` key)."""
        win = self.windows
        law = getattr(win, "dilation", None) if win is not None else None
        if law is None or coef is None:
            return None
        from ..registration import _feature_value

        d = coef[0]
        for i, n in enumerate(law.names):
            d = d + coef[i + 1] * _feature_value(mu, n)
        # Constant laws (no features) still serve per-lane: broadcast to
        # the batch shape.
        d = d * jnp.ones_like(next(iter(mu.values())))
        return jnp.maximum(d, law.floor)

    def _windowed_dilation_oor(self, mu, tables):
        """Per-lane dilation-law extrapolation flag (1.0 = the lane's μ
        sits in a training hole where the affine law is unvalidated —
        the measured failure mode is a 0.03 dilation misprediction
        serving at 1.5e-4 vs 2e-7 in-hull). Nearest-training-μ distance
        in range-normalized feature space vs the training fill distance
        (rom/registration.py DilationLaw guard); ``None`` when the
        active configuration has no registration guard. Traceable —
        guard tables are runtime values so cell swaps reuse compiled
        sweeps."""
        win = self.windows
        law = getattr(win, "dilation", None) if win is not None else None
        G = tables.get("dil_guard_feats") if tables is not None else None
        if law is None or G is None:
            return None
        from ..registration import _feature_value

        inv_span = tables["dil_guard_inv_span"]
        thresh = tables["dil_guard_thresh"]
        ones_b = jnp.ones_like(next(iter(mu.values())))
        x = jnp.stack(
            [_feature_value(mu, n) * inv_span[i] * ones_b
             for i, n in enumerate(law.names)], axis=-1,
        )  # (B, p)
        d2 = ((x[:, None, :] - G[None, :, :]) ** 2).sum(-1).min(axis=1)
        return (d2 > thresh * thresh).astype(jnp.float32)

    def _online_sweep_windowed_pallas(self, prepped, tables,
                                      interpret=False):
        """Stage 2 of the fused windowed serving: residual-form v2
        kernels chained through the double-f32 carry with pure-f32 dd
        transfers at the boundaries. θ-streaming tables (stage-1 entries
        × per-window folded combine tensors, lax.scan over windows — ONE
        pallas_call); falls back to materialized per-window operator
        tables when they fit the precompute budget. ``tables`` is the
        `_windowed_pallas_tables` pytree, passed as a jit argument."""
        import os

        from ...ops.pallas_online import (
            PROBE_P,
            online_sweep_pallas_v2,
            online_sweep_theta_pallas_v2,
            online_sweep_windowed_fused,
            pad_dim,
        )

        win = self.windows
        assert win is not None, "call build_windowed_serving first"
        fom = self.fom
        nt = int(fom.domain[fom.NT])
        bdf2 = fom.BDF_SCHEME == BDF.TWO
        N = win.N
        NP = pad_dim(N)
        dtype = jnp.float32
        dt = _scalar(fom.dt)
        W = win.n_windows
        widths = np.diff(win.bounds)
        assert len(set(widths.tolist())) == 1, (
            "windowed pallas serving needs equal window widths "
            "(one Mosaic compilation shared by all launches)"
        )

        THm_full = prepped["THm"]
        THk_full = prepped["THk"]
        THf_full = prepped["THf"]
        g_full = prepped["g"]
        b0 = prepped["b0"]
        dil = prepped.get("dil")
        dil_extra = {k: prepped[k] for k in ("dil", "dil_oor")
                     if k in prepped}
        B = THm_full.shape[2]
        ts_grid = (jnp.arange(nt) + 1).astype(dtype) * dt
        if dil is not None:
            # Phase-aligned lanes live on their own dilated grids.
            ts_grid = ts_grid[:, None] * dil[None, :]
        with_trilinear = win.trilinear is not None

        # Materialized tables only when every window's fit the budget.
        mat_bytes = 2 * nt * NP * NP * B * 4
        use_matrices = self._precompute_choice(mat_bytes)

        def transfer_state(state, T_np):
            """Window-boundary dd carry transfer in pure f32
            (ops/compensated.py dd_matvec — no emulated f64 on TPU)."""
            hi = state[0, :N]
            lo = state[1, :N]
            hi1 = state[2, :N]
            lo1 = state[3, :N]
            T = jnp.asarray(T_np, dtype)
            a = dd_matvec(T, hi, lo)
            c = dd_matvec(T, hi1, lo1)
            out = jnp.zeros((4, NP, B), dtype)
            out = out.at[0, :N].set(a[0]).at[1, :N].set(a[1])
            out = out.at[2, :N].set(c[0]).at[3, :N].set(c[1])
            return out

        state = jnp.zeros((4, NP, B), dtype)

        if use_matrices:
            # Small-batch path: per-window materialized-table launches
            # (the tables for all W windows would not fit HBM at serving
            # batch sizes; compile cost is fine at the sizes that do fit).
            probes_parts = []
            for w in range(W):
                a_step, b_step = int(win.bounds[w]), int(win.bounds[w + 1])
                Bm, Bk, Bf = tables["Bm"][w], tables["Bk"][w], tables["Bf"][w]
                VE_p, T0_p = tables["VE"][w], tables["T0"][w]
                if w > 0:
                    state = transfer_state(state, tables["T"][w])
                g_w = g_full[a_step:b_step]
                MN_p = jnp.einsum(
                    "nk,tkB->tnB", Bm, THm_full[a_step:b_step]
                ).reshape(b_step - a_step, NP, NP, B)
                KL_p = jnp.einsum(
                    "nk,tkB->tnB", Bk, THk_full[a_step:b_step]
                ).reshape(b_step - a_step, NP, NP, B)
                fN_p = jnp.einsum(
                    "nk,tkB->tnB", Bf, THf_full[a_step:b_step]
                )
                probes_w, state = online_sweep_pallas_v2(
                    MN_p, KL_p, fN_p, g_w, T0_p, VE_p, b0, state,
                    dt=float(fom.dt), step0=a_step, bdf2=bdf2,
                    with_trilinear=with_trilinear, n_real=N,
                    interpret=interpret,
                )
                probes_parts.append(probes_w)
            probes = jnp.concatenate(probes_parts, axis=0)
            return dict(
                {"t": ts_grid, "probes": probes[:, :2, :],
                 "uN_final": state[0, :N, :]},
                **dil_extra,
            )

        # θ-streaming serving path. ROMTIME_WINDOWED_KERNEL selects the
        # kernel generation:
        #   "fused" (default) — v3: the window loop runs INSIDE one pallas
        #       launch (VMEM-resident per-window constants, ONE merged θ
        #       DMA per chunk instead of four, in-kernel VPU dd transfers,
        #       probes DMA'd out per chunk) with the merged-dot step (one
        #       solve-matrix dot + θ-factored r0 matvecs,
        #       _bdf_step_merged). Measured 151 ms/sweep at the headline
        #       W=30/N=40/B=2048 point — ~13.6k solves/s, 8% ahead of v2
        #       (scripts/kernel_ledger.py for the per-component ablation).
        #   "v2" — lax.scan over per-window θ-streaming launches with
        #       out-of-kernel dd boundary transfers (164 ms/sweep at the
        #       same point).
        if os.environ.get("ROMTIME_WINDOWED_KERNEL", "fused") == "fused":
            km8 = tables["Bm"].shape[2]
            kk8 = tables["Bk"].shape[2]
            kf8 = tables["Bf"].shape[2]
            TH = jnp.concatenate(
                [THm_full, THk_full, THf_full, g_full], axis=1
            )
            probes, state = online_sweep_windowed_fused(
                TH, tables["Bmk"], tables["BmF"], tables["BkF"],
                tables["BfT"], tables["TQ"], tables["VE"], tables["Tp"],
                b0, state,
                widths=tuple(int(x) for x in widths), dt=float(fom.dt),
                bdf2=bdf2, with_trilinear=with_trilinear, n_real=N,
                km8=km8, kk8=kk8, kf8=kf8, interpret=interpret,
                solve_iters=self._windowed_solve_iters(),
                paired_lu=self._windowed_paired_lu(),
                paired_mode=self._windowed_paired_mode(),
            )
            return dict(
                {"t": ts_grid, "probes": probes[:, :2, :],
                 "uN_final": state[0, :N, :]},
                **dil_extra,
            )

        # v2: lax.scan over the stacked per-window
        # tables — exactly ONE pallas_call site (one Mosaic compile)
        # regardless of W. A python launch loop instead traces W custom
        # calls and the (remote) TPU pipeline compiles each one (~3.4 min
        # per kernel at NP=48 — 25 windows never finished).
        width = nt // W
        THm_w = THm_full.reshape(W, width, -1, B)
        THk_w = THk_full.reshape(W, width, -1, B)
        THf_w = THf_full.reshape(W, width, -1, B)
        g_w = g_full.reshape(W, width, PROBE_P, B)
        k0s = jnp.arange(W, dtype=jnp.int32) * jnp.int32(width)

        def window_body(state, wd):
            state = transfer_state(state, wd["T"])
            probes_w, state = online_sweep_theta_pallas_v2(
                wd["THm"], wd["THk"], wd["THf"], wd["g"], wd["Bm"],
                wd["Bk"], wd["Bf"], wd["T0"], wd["VE"], b0, state,
                dt=float(fom.dt), step0=wd["k0"], bdf2=bdf2,
                with_trilinear=with_trilinear, n_real=N,
                interpret=interpret,
            )
            return state, probes_w

        wdatas = {
            "T": tables["T"], "k0": k0s, "THm": THm_w, "THk": THk_w,
            "THf": THf_w, "g": g_w, "Bm": tables["Bm"],
            "Bk": tables["Bk"], "Bf": tables["Bf"], "VE": tables["VE"],
            "T0": tables["T0"],
        }
        state, probes_sw = jax.lax.scan(window_body, state, wdatas)
        probes = probes_sw.reshape((nt,) + probes_sw.shape[2:])
        return dict(
            {"t": ts_grid, "probes": probes[:, :2, :],
             "uN_final": state[0, :N, :]},
            **dil_extra,
        )

