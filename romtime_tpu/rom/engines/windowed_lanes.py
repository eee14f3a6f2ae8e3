"""Time-windowed lane-batched (XLA scan) serving engine + the unequal-
width chained fallback.

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


class WindowedLanesMixin:
    @staticmethod
    def _transfer_carry(carry, T_np, dtype):
        """Re-express the BDF carry in the next window's basis. For f32
        serving the matvec runs as a pure-f32 dd matvec
        (ops/compensated.py) — a plain f32 transfer would inject eps·‖u‖
        once per boundary, re-creating the drift the residual-form
        stepping removed, and emulated f64 on TPU is slow to compile and
        run."""
        T = jnp.asarray(T_np, dtype)

        if dtype == jnp.float32:

            def tx(h, l):
                return dd_matvec(T, h, l)
        else:

            def tx(h, l):
                return T @ h + T @ l, jnp.zeros_like(h)

        hi, lo, hi1, lo1 = carry
        a = tx(hi, lo)
        b = tx(hi1, lo1)
        return (a[0], a[1], b[0], b[1])

    def _windowed_lanes_tables(self, mode):
        """Stacked per-window tensors for the lanes windowed engine —
        eager device arrays passed to the jitted sweep as ARGUMENTS (see
        _windowed_pallas_tables for why trace-time constants are a
        compile hazard). Keyed by (mode, compute dtype)."""
        win = self.windows
        dtype = np.dtype(compute_dtype()).name
        cache = getattr(self, "_windowed_lanes_tbl", None)
        if cache is None:
            cache = self._windowed_lanes_tbl = {}
        key = (mode, dtype)
        if key in cache:
            return cache[key]
        sources = self._theta_sources()
        tbl = {f"C_{name}": _asarray(win.combines[name])
               for name in sources}
        if win.trilinear is not None:
            tbl["T0"] = _asarray(win.trilinear)
        tbl["V_ends"] = _asarray(win.Vs[:, [0, -1], :])
        if win.dilation is not None:
            # Registration law coefficients as runtime values (see
            # _windowed_pallas_tables).
            tbl["dil_coef"] = _asarray(win.dilation.coef)
            if win.dilation.has_guard:
                from ..registration import GUARD_FACTOR

                tbl["dil_guard_feats"] = _asarray(win.dilation.guard_feats)
                tbl["dil_guard_inv_span"] = _asarray(
                    win.dilation.guard_inv_span)
                tbl["dil_guard_thresh"] = _asarray(
                    GUARD_FACTOR * win.dilation.guard_dref)
        if mode == "full":
            tbl["V_full"] = _asarray(win.Vs)
        T_np = np.concatenate(
            [np.eye(win.N)[None], np.asarray(win.transfers)], axis=0
        )
        tbl["T"] = _asarray(T_np)
        cache[key] = tbl
        return tbl

    def _online_sweep_windowed(self, mu, tables, mode="probes"):
        """Lane-batched windowed μ-sweep: ONE compiled window body scanned
        over the stacked per-window tables (equal window widths), with
        pure-f32 dd carry transfer at the boundaries. Residual-form
        compensated stepping throughout (exact in f64, drift-free in f32).

        Compile cost is a single window regardless of W — the chained
        per-window trace (W copies of the scan body, ~9 min XLA compile at
        W=15/N=48 on CPU) remains as `_online_sweep_windowed_chained` for
        unequal widths. ``tables`` is the `_windowed_lanes_tables` pytree,
        passed as a jit argument."""
        win = self.windows
        assert win is not None, "call build_windowed_serving first"
        widths = np.diff(win.bounds)
        if len(set(widths.tolist())) != 1:
            return self._online_sweep_windowed_chained(mu, mode=mode)

        fom = self.fom
        nt = int(fom.domain[fom.NT])
        bdf2 = fom.BDF_SCHEME == BDF.TWO
        N = win.N
        W = win.n_windows
        width = nt // W
        dtype = compute_dtype()
        dt = _scalar(fom.dt)
        one = _scalar(1.0)
        one_five = _scalar(1.5)
        B = int(next(iter(mu.values())).shape[0])

        sources = self._theta_sources()
        ts_grid = (jnp.arange(nt) + 1).astype(dtype) * dt
        dil = self._windowed_dilation(mu, tables.get("dil_coef"))
        if dil is not None:
            # Phase-aligned serving (rom/registration.py): per-lane
            # dilated time grids; the dt-side θ streams and the
            # trilinear coefficient pick up the d_b factor below.
            dil = dil.astype(dtype)
            ts_grid = ts_grid[:, None] * dil[None, :]
        ent = {
            name: jax.vmap(lambda t, red=red: red._entries_traced(mu, t))(
                ts_grid
            )
            for name, (red, _fb) in sources.items()
        }  # each (nt, k, B)
        if dil is not None:
            for name in ent:
                if name != "mass":
                    ent[name] = ent[name] * dil[None, None, :]
        stiff_names = [n for n in sources if n not in ("mass", "rhs_vec")]

        b0 = None
        if win.trilinear is not None:
            b0 = self.fom.nonlinear_coefficient(mu)  # (B,) or scalar
            if dil is not None:
                b0 = b0 * dil  # dt_b·N(u) = (d_b·b0)·dt·N₁(u)

        matvec = partial(jnp.einsum, "ijB,jB->iB")

        # Stacked per-window time tables (total size = the chained path's).
        def wslice(name):
            e = ent[name]
            return e.reshape((W, width) + e.shape[1:])

        MN_tab = jnp.einsum(
            "Wnk,WtkB->WtnB", tables["C_mass"], wslice("mass")
        )
        dtS_tab = dt * sum(
            jnp.einsum("Wnk,WtkB->WtnB", tables[f"C_{n}"], wslice(n))
            for n in stiff_names
        )
        fN_tab = dt * jnp.einsum(
            "Wnk,WtkB->WtnB", tables["C_rhs_vec"], wslice("rhs_vec")
        )
        T0_all = tables.get("T0")  # (W, N², N) or None
        V_ends_all = tables["V_ends"]  # (W, 2, N)
        V_full_all = tables.get("V_full")

        # Boundary transfers with an identity slot for w=0 (the dd
        # renormalization it performs is a no-op on a normalized carry).
        # f32 serving transfers through the pure-f32 dd matvec
        # (ops/compensated.py) — a plain f32 matvec would inject
        # eps·‖u‖ per boundary, and emulated f64 on TPU is both slow and
        # a compile hazard.
        T_all = tables["T"]

        if dtype == jnp.float32:

            def tx(T, h, l):
                return dd_matvec(T, h, l)
        else:

            def tx(T, h, l):
                return T @ h + T @ l, jnp.zeros_like(h)

        i32 = jnp.int32
        k0s = jnp.arange(W, dtype=i32) * i32(width)

        def window_body(carry, wdata):
            T_w = wdata["T"]
            k0 = wdata["k0"]
            T0w = wdata.get("T0")
            V_ends = wdata["V_ends"]
            V_w = wdata.get("V_full")

            hi, lo, hi1, lo1 = carry
            a = tx(T_w, hi, lo)
            c = tx(T_w, hi1, lo1)
            carry = (a[0], a[1], c[0], c[1])

            def step(carry, inputs):
                uN_n, lo_n, uN_n1, lo_n1 = carry
                i, (MN_flat, dtS_flat, fN_dt) = inputs
                k = k0 + i
                t = (k + 1).astype(dtype) * dt
                if dil is not None:
                    t = t * dil  # (B,) — per-lane dilated clock
                MN = MN_flat.reshape((N, N, -1))
                dtS = dtS_flat.reshape((N, N, -1))

                if bdf2:
                    ph, plo = dd_bdf2_predict(uN_n, lo_n, uN_n1, lo_n1)
                    dh = dd_history_diff(uN_n, lo_n, uN_n1, lo_n1)
                    first = k == 0
                    pred_hi = jnp.where(first, uN_n, ph)
                    pred_lo = jnp.where(first, lo_n, plo)
                    d = jnp.where(first, jnp.zeros_like(dh), dh)
                    bdf = jnp.where(k > 0, one_five, one)
                else:
                    pred_hi, pred_lo = uN_n, lo_n
                    d = jnp.zeros_like(uN_n)
                    bdf = one

                if T0w is not None:
                    NN = (T0w @ pred_hi).reshape((N, N, -1)) * b0
                    dtS = dtS + dt * NN

                KN = bdf * MN + dtS
                r0 = matvec(MN, d) + fN_dt - matvec(dtS, pred_hi)
                delta = gauss_solve_lanes(KN, r0)
                uN, lo = dd_add_small(pred_hi, pred_lo, delta)

                scale = fom.scale_factor(mu, t) if fom.Lt else one
                L = fom.domain[fom.L0] * scale
                L = L * jnp.ones((B,), dtype=dtype)
                g = fom.create_lifting_operator(mu=mu, t=t, L=L,
                                                only_g=True)

                outputs = (dict(t=t) if mode == "probes"
                           else dict(uN=uN, t=t))
                if mode == "full":
                    x_phys = _asarray(fom.mesh.x_dofs)[:, None] * (
                        scale * jnp.ones((B,), dtype=dtype)
                    )
                    outputs["uc"] = V_w @ uN + g(x_phys)
                    outputs["x"] = x_phys
                else:
                    x_ends = jnp.stack([jnp.zeros_like(L), L])
                    outputs["probes"] = V_ends @ uN + g(x_ends)

                return (uN, lo, uN_n, lo_n), outputs

            carry, outs_w = jax.lax.scan(
                step, carry,
                (jnp.arange(width, dtype=i32),
                 (wdata["MN"], wdata["dtS"], wdata["fN"])),
                unroll=self.ONLINE_UNROLL,
            )
            return carry, outs_w

        wdatas = {
            "T": T_all,
            "k0": k0s,
            "V_ends": V_ends_all,
            "MN": MN_tab,
            "dtS": dtS_tab,
            "fN": fN_tab,
        }
        if T0_all is not None:
            wdatas["T0"] = T0_all
        if V_full_all is not None:
            wdatas["V_full"] = V_full_all

        zeros = jnp.zeros((N, B), dtype=dtype)
        carry, outs_sw = jax.lax.scan(
            window_body, (zeros, zeros, zeros, zeros), wdatas
        )
        outs = {
            key: v.reshape((nt,) + v.shape[2:])
            for key, v in outs_sw.items()
        }
        if mode == "probes":
            outs["uN_final"] = carry[0]
        if dil is not None:
            outs["dil"] = dil
            oor = self._windowed_dilation_oor(mu, tables)
            if oor is not None:
                outs["dil_oor"] = oor
        return outs

    def _online_sweep_windowed_chained(self, mu, mode="probes"):
        """Per-window chained trace (unequal window widths fallback)."""
        win = self.windows
        assert win is not None, "call build_windowed_serving first"
        if getattr(win, "dilation", None) is not None:
            raise NotImplementedError(
                "phase-aligned (registered) serving requires equal "
                "window widths — the unequal-width chained fallback "
                "does not carry per-lane dilated clocks"
            )
        fom = self.fom
        nt = int(fom.domain[fom.NT])
        bdf2 = fom.BDF_SCHEME == BDF.TWO
        N = win.N
        dtype = compute_dtype()
        dt = _scalar(fom.dt)
        one = _scalar(1.0)
        one_five = _scalar(1.5)
        B = int(next(iter(mu.values())).shape[0])

        sources = self._theta_sources()
        ts_grid = (jnp.arange(nt) + 1).astype(dtype) * dt
        ent = {
            name: jax.vmap(lambda t, red=red: red._entries_traced(mu, t))(
                ts_grid
            )
            for name, (red, _fb) in sources.items()
        }  # each (nt, k, B)
        stiff_names = [n for n in sources if n not in ("mass", "rhs_vec")]

        b0 = None
        if win.trilinear is not None:
            b0 = self.fom.nonlinear_coefficient(mu)  # (B,) or scalar

        matvec = partial(jnp.einsum, "ijB,jB->iB")

        zeros = jnp.zeros((N, B), dtype=dtype)
        carry = (zeros, zeros, zeros, zeros)
        outs_all = []

        for w in range(win.n_windows):
            a_step, b_step = int(win.bounds[w]), int(win.bounds[w + 1])
            C = {name: _asarray(win.combines[name][w]) for name in sources}
            MN_tab = jnp.einsum(
                "nk,tkB->tnB", C["mass"], ent["mass"][a_step:b_step]
            )
            dtS_tab = dt * sum(
                jnp.einsum("nk,tkB->tnB", C[n], ent[n][a_step:b_step])
                for n in stiff_names
            )
            fN_tab = dt * jnp.einsum(
                "nk,tkB->tnB", C["rhs_vec"], ent["rhs_vec"][a_step:b_step]
            )
            T0w = (
                _asarray(win.trilinear[w])
                if win.trilinear is not None
                else None
            )
            V_ends = _asarray(win.Vs[w][[0, -1], :])
            V_w = _asarray(win.Vs[w]) if mode == "full" else None

            if w > 0:
                carry = self._transfer_carry(carry, win.transfers[w - 1],
                                             dtype)

            def step(carry, inputs, T0w=T0w, V_ends=V_ends, V_w=V_w):
                uN_n, lo_n, uN_n1, lo_n1 = carry
                k, (MN_flat, dtS_flat, fN_dt) = inputs
                t = (k + 1).astype(dtype) * dt
                MN = MN_flat.reshape((N, N, -1))
                dtS = dtS_flat.reshape((N, N, -1))

                if bdf2:
                    ph, plo = dd_bdf2_predict(uN_n, lo_n, uN_n1, lo_n1)
                    dh = dd_history_diff(uN_n, lo_n, uN_n1, lo_n1)
                    first = k == 0
                    pred_hi = jnp.where(first, uN_n, ph)
                    pred_lo = jnp.where(first, lo_n, plo)
                    d = jnp.where(first, jnp.zeros_like(dh), dh)
                    bdf = jnp.where(k > 0, one_five, one)
                else:
                    pred_hi, pred_lo = uN_n, lo_n
                    d = jnp.zeros_like(uN_n)
                    bdf = one

                if T0w is not None:
                    NN = (T0w @ pred_hi).reshape((N, N, -1)) * b0
                    dtS = dtS + dt * NN

                KN = bdf * MN + dtS
                r0 = matvec(MN, d) + fN_dt - matvec(dtS, pred_hi)
                delta = gauss_solve_lanes(KN, r0)
                uN, lo = dd_add_small(pred_hi, pred_lo, delta)

                scale = fom.scale_factor(mu, t) if fom.Lt else one
                L = fom.domain[fom.L0] * scale
                L = L * jnp.ones((B,), dtype=dtype)
                g = fom.create_lifting_operator(mu=mu, t=t, L=L, only_g=True)

                outputs = dict(t=t) if mode == "probes" else dict(uN=uN, t=t)
                if mode == "full":
                    x_phys = _asarray(fom.mesh.x_dofs)[:, None] * (
                        scale * jnp.ones((B,), dtype=dtype)
                    )
                    outputs["uc"] = V_w @ uN + g(x_phys)
                    outputs["x"] = x_phys
                else:
                    x_ends = jnp.stack([jnp.zeros_like(L), L])
                    outputs["probes"] = V_ends @ uN + g(x_ends)

                return (uN, lo, uN_n, lo_n), outputs

            carry, outs_w = jax.lax.scan(
                step, carry,
                (jnp.arange(a_step, b_step), (MN_tab, dtS_tab, fN_tab)),
                unroll=self.ONLINE_UNROLL,
            )
            outs_all.append(outs_w)

        outs = {
            key: jnp.concatenate([o[key] for o in outs_all], axis=0)
            for key in outs_all[0]
        }
        if mode == "probes":
            outs["uN_final"] = carry[0]
        return outs

