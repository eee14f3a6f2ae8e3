"""Native (C++) fast path for the certification-grade f64 piston sweep.

The offline stage is dominated by serial f64 FOM solves (reference analog:
src/romtime/rom/rom.py:317-327 — serial FEniCS solves). On a single-core
host the XLA-CPU ``lax.scan`` loop costs ~4 s per trajectory at
nx=1000/nt=1500 while the dedicated banded C++ kernel
(csrc/fom_piston.cpp) runs the identical algebra in ~40 ms — measured
100×; batching via ``vmap`` on the same host is SLOWER than serial
(7.5 s/μ vs 4.0 s/μ — XLA-CPU is already SIMD-bound per trajectory), so
native is the only offline-wall lever without more hosts/chips.

The kernel consumes per-step SCALAR arrays (ALE scale, L̇/L, Dirichlet
value and rate) evaluated here from the problem's callables, so any
piston-family problem definition (rest/sudden/custom Lt) rides it; the
spatial algebra (banded P1 assembly, one-sided lifting, BDF-2, trilinear
snapshot capture) is replicated exactly — equivalence against the jax
``_solve_impl`` is pinned by tests/test_native_fom.py.
"""

import os

import numpy as np

from .. import native
from ..conventions import BDF


def _eligible(fom):
    """Only the exact shipped piston physics may take the native path —
    a subclass overriding any operator must fall back to the traced jax
    loop rather than silently inherit the closed-form kernel."""
    from .nonlinear import OneDimensionalBurgers

    return (
        type(fom) is OneDimensionalBurgers
        and os.environ.get("ROMTIME_NATIVE_FOM", "1") != "0"
        and fom.is_setup
        and int(fom.degrees) == 1
        and fom.BDF_SCHEME == BDF.TWO
        and fom.forcing_term is None
        and fom.exact_solution is None
        and not fom.project_u0
        and fom.Lt is not None
        and fom.dLt_dt is not None
        and fom.dirichlet is not None
        and fom.B0 not in fom.dirichlet          # right-only Dirichlet
        and fom.BL in fom.dirichlet
        and getattr(fom, "_nonlinear_topology", None) is not None
    )


def outputs_native(fom, mu):
    """Run the native piston loop; return the ``_solve_impl`` output dict
    (numpy, float64) or None when ineligible/unavailable."""
    if not _eligible(fom):
        return None

    mesh = fom.mesh
    nt = int(fom.domain[fom.NT])
    nx = int(fom.domain[fom.NX])
    L0 = float(fom.domain[fom.L0])
    dt = float(fom.dt)
    nh = mesh.nh

    ts = (np.arange(1, nt + 1, dtype=np.float64)) * dt
    mu_f = {k: float(v) for k, v in mu.items()}
    s_arr = np.asarray(fom.Lt(t=ts, **mu_f), np.float64)
    r_arr = np.asarray(fom.dLt_dt(t=ts, **mu_f), np.float64) / s_arr
    L_arr = L0 * s_arr
    # Piston one-sided lifting: bL(t, L) and its rate (the piston
    # create_lifting_operator passes dLt_dt=0.0 — fom/nonlinear.py:144).
    bL_arr = np.asarray(
        fom._dirichlet_value(fom.BL, mu_f, ts, L_arr), np.float64
    )
    dbL_arr = np.asarray(
        fom._dirichlet_value(fom.DBL_DT, mu_f, ts, L_arr), np.float64
    )

    from .nonlinear import OneDimensionalBurgersConventions as C

    u0 = np.asarray(fom._initial_condition(mu_f), np.float64)
    a0 = float(mu_f[C.A0])
    alpha = float(fom.create_diffusion_coefficient(mu_f))
    b0 = float(fom.nonlinear_coefficient(mu_f))
    rows, cols = fom._nonlinear_topology

    out = native.piston_fom_solve(
        L0, nx, nt, dt, a0, alpha, b0,
        s_arr, r_arr, bL_arr, dbL_arr, u0, rows, cols,
    )
    if out is None:
        return None
    uh, nl = out

    x_dofs = np.asarray(mesh.x_dofs, np.float64)
    # g(x_phys) = bL·x_phys/L = bL·x_ref/L0 — the ALE scale cancels.
    uc = uh + bL_arr[:, None] * (x_dofs / L0)[None, :]
    x_phys = s_arr[:, None] * x_dofs[None, :]

    # Probes at material coordinates (scale=1 — fom/nonlinear.py
    # _step_outputs) + the piston dof.
    h0 = mesh.h0
    vals = []
    for loc in fom.probe_location:
        e = int(np.clip(np.floor(loc / h0), 0, mesh.ne - 1))
        xi = loc / h0 - e
        vals.append((1.0 - xi) * uc[:, e] + xi * uc[:, e + 1])
    vals.append(uc[:, -1])
    probes = np.stack(vals, axis=1)

    return {
        "uh": uh,
        "uc": uc,
        "x": x_phys,
        "t": ts,
        "nonlinear_data": nl,
        "probes": probes,
    }
