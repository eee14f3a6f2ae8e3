"""One-dimensional isentropic gas dynamics (moving-piston Burgers model).

TPU-native rebuild of the reference's nonlinear path (reference:
src/romtime/fom/nonlinear.py:24-722):

    u_t + (a0 + w)·u′ + b0·u·u′ + lifting couplings − α·u″ = 0

on a cylinder closed by an oscillating piston: right-boundary-only Dirichlet
data, one-sided lifting, BDF-2 with u* = 2uₙ − uₙ₋₁ extrapolation of the
trilinear term, per-step capture of the nonlinear-operator snapshots (the
training data for N-MDEIM), physical probes, and mass conservation.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from scipy.signal import find_peaks

from ..conventions import BDF, MassConservation, PistonParameters, ProblemType
from ..dtypes import asarray as _asarray
from ..ops.assembly import band_gather_nnz, eval_function_at
from ..utils import dump_csv
from .base import BandedOperator, OneDimensionalSolver, move_mesh
from .utils import compute_time_between_peaks, find_first_positive_peak


class OneDimensionalBurgersConventions:

    A0 = "a0"
    DELTA = "delta"
    GAMMA = "gamma"
    ALPHA = "alpha"


class OneDimensionalBurgers(OneDimensionalSolver):
    """Moving-piston gas dynamics solver (reference: nonlinear.py:24-722)."""

    # Artificial viscosity (reference: nonlinear.py:27)
    ALPHA = 1e-10

    # Heat capacity ratio gamma = cp/cv (reference: nonlinear.py:31)
    GAMMA = 1.4

    RUNTIME_PROCESS = True
    MOVING_ASSEMBLY = True
    BDF_SCHEME = BDF.TWO

    def __init__(
        self,
        domain: dict,
        dirichlet: dict,
        parameters: dict = None,
        forcing_term=None,
        u0=None,
        filename=None,
        degrees=1,
        project_u0=False,
        exact_solution=None,
        Lt=None,
        dLt_dt=None,
        probe_locations=(0.0, 0.5),
    ) -> None:
        super().__init__(
            domain=domain,
            dirichlet=dirichlet,
            parameters=parameters,
            forcing_term=forcing_term,
            u0=u0,
            filename=filename,
            degrees=degrees,
            project_u0=project_u0,
            exact_solution=exact_solution,
            Lt=Lt,
            dLt_dt=dLt_dt,
        )
        self.alpha = None
        self.probe_location = list(probe_locations)
        self.probes = None
        self.nonlinear_snapshots = None
        self.mc = None
        self.outflow = None

    # ------------------------------------------------------------------
    # Physical scalings
    # ------------------------------------------------------------------
    @property
    def scale_solutions(self):
        return self.mu[OneDimensionalBurgersConventions.A0]

    @property
    def system_forcing(self):
        """Piston Mach number δω/a0 (reference: nonlinear.py:78-92)."""
        mu = self.mu
        delta = mu[PistonParameters.DELTA]
        omega = mu[PistonParameters.OMEGA]
        a0 = mu[PistonParameters.A0]
        return delta * omega / a0

    @property
    def nonlinearity(self):
        """(u_p, eta): forcing magnitude and linearity measure from probe
        peak timing (reference: nonlinear.py:94-129)."""
        probes = self.probes
        probe_L = np.array(probes[0])
        probe_piston = np.array(probes[2])

        peaks_L = find_peaks(np.abs(probe_L))[0]
        peaks_piston = find_peaks(np.abs(probe_piston))[0]

        indices_L = find_first_positive_peak(probe_L, peaks_L)
        indices_piston = find_first_positive_peak(probe_piston, peaks_piston)

        ts = self.timesteps
        T0 = compute_time_between_peaks(ts, indices_piston)
        T = compute_time_between_peaks(ts, indices_L)

        eta = T / T0
        u_p = self.system_forcing
        return u_p, eta

    def nonlinear_coefficient(self, mu):
        """b0 = (γ+1)/2 · a0 (reference: nonlinear.py:165-172)."""
        a0 = mu[OneDimensionalBurgersConventions.A0]
        return (self.GAMMA + 1.0) / 2.0 * a0

    def create_diffusion_coefficient(self, mu=None):
        """Artificial viscosity α (reference: nonlinear.py:264-275)."""
        return self.ALPHA

    def compute_mesh_velocity(self, mu, t):
        """w(x) = x·L̇t/Lt (reference: nonlinear.py:277-300)."""
        dLt_dt = self.dLt_dt(t=t, **mu)
        Lt = self.Lt(t=t, **mu)
        return lambda x: x * dLt_dt / Lt

    # ------------------------------------------------------------------
    # Boundary handling: right-only Dirichlet, one-sided lifting.
    # dirichlet_dofs needs no override: the BC dict defines only bL, so
    # the base derivation yields (nh-1,) (reference: nonlinear.py:241-262).
    # ------------------------------------------------------------------
    def create_lifting_operator(self, mu, t, L, only_g=False):
        """One-sided lifting g = bL·x/L (reference: nonlinear.py:205-239)."""
        bL = self._dirichlet_value(self.BL, mu, t, L)

        def g(x):
            return bL * (x / L)

        if only_g:
            return g

        dbL = self._dirichlet_value(self.DBL_DT, mu, t, L)

        def dg_dt(x):
            return dbL * (x / L)

        grad_g = bL / L
        return g, dg_dt, grad_g

    # ------------------------------------------------------------------
    # Setup: probes + nonlinear-snapshot topology
    # ------------------------------------------------------------------
    def setup(self):
        super().setup()
        self.nonlinear_snapshots = list()
        self.probe_location = [0.0, 0.5]
        num_probes = len(self.probe_location) + 1
        self.probes = {idx: list() for idx in range(num_probes)}

        # Fixed topology for the per-step trilinear snapshot capture: probe
        # with a non-constant state u = x so every structural entry is live
        # (reference analog: deim/nonlinear.py:133-157). The sparsity
        # pattern is scale-independent, so probe with mesh motion bypassed —
        # the placeholder μ need not satisfy Lt's signature.
        mu_probe = {OneDimensionalBurgersConventions.A0: 1.0}
        x_state = np.asarray(self.mesh.x_dofs)
        Lt_saved, dLt_saved = self.Lt, self.dLt_dt
        self.Lt = self.dLt_dt = None
        try:
            Nh_op = self.assemble_trilinear(mu=mu_probe, t=0.0, u_n=x_state)
        finally:
            self.Lt, self.dLt_dt = Lt_saved, dLt_saved
        rows, cols, _ = Nh_op.nonzero_entries(tolerance=1e-15)
        self._nonlinear_topology = (rows, cols)

    # ------------------------------------------------------------------
    # Unified BDF system
    # ------------------------------------------------------------------
    def assemble_system(self, mu, t, bdf=1.0, u_n=None, u_n1=None):
        """K = bdf·M + dt·(A + B + N(u*) + N̂) with u* = 2uₙ − uₙ₋₁
        (reference: nonlinear.py:322-351)."""
        Mh = self.assemble_mass(mu=mu, t=t)
        Ah = self.assemble_stiffness(mu=mu, t=t)
        Chat = self.assemble_nonlinear_lifting(mu=mu, t=t)
        Bh = self.assemble_convection(mu=mu, t=t)

        if u_n1 is None:
            u_star = u_n
        else:
            u_star = 2.0 * u_n - u_n1

        Nh = self.assemble_trilinear(mu=mu, t=t, u_n=u_star)

        dt = self.dt
        Kh_band = bdf * Mh.band + dt * (Ah.band + Bh.band + Nh.band + Chat.band)

        # Eager (non-traced) calls also record the nonlinear snapshot, like
        # the reference does inside assemble_system (nonlinear.py:345-349);
        # traced calls capture via _step_extras instead.
        if self.nonlinear_snapshots is not None and not isinstance(
            Kh_band, jax.core.Tracer
        ):
            rows, cols = self._nonlinear_topology
            self.nonlinear_snapshots.append(
                np.asarray(band_gather_nnz(Nh.band, rows, cols, self.mesh.degree))
            )

        return Mh, BandedOperator(Kh_band, self.mesh)

    def assemble_system_rhs(self, mu, t, Mh_mat, u_n, u_n1=None):
        """b = M·(2uₙ − ½uₙ₋₁) + dt·f_g (reference: nonlinear.py:353-370)."""
        fgh = self.assemble_lifting(mu=mu, t=t)
        if u_n1 is None:
            bdf_term = Mh_mat.dot(u_n)
        else:
            bdf_term = Mh_mat.dot(2.0 * u_n - 0.5 * u_n1)
        return bdf_term + self.dt * jnp.asarray(fgh)

    # ------------------------------------------------------------------
    # LHS operators
    # ------------------------------------------------------------------
    @move_mesh
    def assemble_stiffness(self, mu, t, entries=None):
        """α ∇u·∇v — artificial viscosity (reference: nonlinear.py:378-396)."""
        alpha = self.create_diffusion_coefficient(mu)
        coeff = lambda x: alpha * jnp.ones_like(x)
        return self._assemble_matrix([(1, 1, coeff)], mu, t, entries)

    @move_mesh
    def assemble_convection(self, mu, t, entries=None):
        """−(a0 + w)·u′·v (reference: nonlinear.py:467-494)."""
        a0 = mu[OneDimensionalBurgersConventions.A0]
        w = self.compute_mesh_velocity(mu=mu, t=t)
        coeff = lambda x: -(a0 + w(x))
        return self._assemble_matrix([(1, 0, coeff)], mu, t, entries)

    def _state_at_quadrature(self, u_n):
        """FE-state values at quadrature points; returns c(x, elements).

        ``u_n`` is either a dof vector (nh,) or a *factorized* state
        ``(V, coeff)`` with u = V·coeff. The factorized form keeps the
        hyper-reduced online path Nh-free: only the V rows of the DEIM-
        needed elements are gathered (static), so the per-step cost is
        O(n_entries·N) instead of O(Nh·N).
        """
        from ..ops.assembly import _gather_cell_dofs

        p = self.mesh.degree
        B0 = _asarray(self.mesh.tables.B0)
        idx_full = p * np.arange(self.mesh.ne)[:, None] + np.arange(p + 1)[None, :]

        if isinstance(u_n, tuple):
            V, coeff = u_n
            V = np.asarray(V)

            def at(x, elements=None):
                # Host-side static gather of the needed basis rows; the
                # traced work is two tiny einsums (no device gathers).
                # ``coeff`` is (N,) or lane-batched (N, B).
                idx = idx_full if elements is None else idx_full[elements]
                V_loc = _asarray(V[idx])  # (e, p+1, N)
                u_loc = jnp.tensordot(V_loc, coeff, axes=([2], [0]))
                if u_loc.ndim == 3:
                    return jnp.einsum("eiB,qi->eqB", u_loc, B0)
                return jnp.einsum("ei,qi->eq", u_loc, B0)

            return at

        u_n = jnp.asarray(u_n)
        u_eq_full = jnp.einsum("ei,qi->eq", _gather_cell_dofs(u_n, self.mesh), B0)

        def at(x, elements=None):
            if elements is None:
                return u_eq_full
            # Static element subset of a traced array: keep it a (folded)
            # constant-index take only on the eager/offline paths.
            return u_eq_full[elements]

        return at

    @move_mesh
    def assemble_trilinear(self, mu, t, entries=None, u_n=None):
        """b0·uₙ·u′·v (reference: nonlinear.py:398-418)."""
        b0 = self.nonlinear_coefficient(mu)
        u_at = self._state_at_quadrature(u_n)
        coeff = lambda x, elements: b0 * u_at(x, elements)
        return self._assemble_matrix([(1, 0, coeff)], mu, t, entries)

    @move_mesh
    def assemble_nonlinear(self, mu, t, entries=None, u_n=None):
        """b0·uₙ·cos(x+1)·u′·v — N-MDEIM experiment variant
        (reference: nonlinear.py:420-442)."""
        b0 = self.nonlinear_coefficient(mu)
        u_at = self._state_at_quadrature(u_n)
        coeff = lambda x, elements: b0 * u_at(x, elements) * jnp.cos(x + 1.0)
        return self._assemble_matrix([(1, 0, coeff)], mu, t, entries)

    @move_mesh
    def assemble_nonlinear_lifting(self, mu, t, entries=None):
        """b0·(g·u′ + g′·u)·v (reference: nonlinear.py:444-465)."""
        scale = self._assembly_scale(mu, t)
        L = self.domain[self.L0] * scale
        g, _, grad_g = self.create_lifting_operator(mu=mu, t=t, L=L)
        b0 = self.nonlinear_coefficient(mu)
        terms = [
            (1, 0, lambda x: b0 * g(x)),
            (0, 0, lambda x: b0 * grad_g * jnp.ones_like(x)),
        ]
        return self._assemble_matrix(terms, mu, t, entries)

    # ------------------------------------------------------------------
    # RHS operators
    # ------------------------------------------------------------------
    @move_mesh
    def assemble_forcing(self, mu, t, entries=None):
        """f·v (reference: nonlinear.py:496-524). Unused for the piston."""
        coeff = lambda x: self._eval_field(self.forcing_term, x, mu, t)
        return self._assemble_vector([(0, coeff)], mu, t, entries)

    @move_mesh
    def assemble_lifting(self, mu, t, entries=None):
        """Four-term lifting vector (reference: nonlinear.py:526-581):
        −(ġ + b0·g·g′)·v + (a0+w)·g′·v − α·g′·v′."""
        scale = self._assembly_scale(mu, t)
        L = self.domain[self.L0] * scale
        g, dg_dt, grad_g = self.create_lifting_operator(mu=mu, t=t, L=L)
        b0 = self.nonlinear_coefficient(mu)
        a0 = mu[OneDimensionalBurgersConventions.A0]
        w = self.compute_mesh_velocity(mu=mu, t=t)
        alpha = self.create_diffusion_coefficient(mu)

        terms = [
            (0, lambda x: -(dg_dt(x) + b0 * g(x) * grad_g) + (a0 + w(x)) * grad_g),
            (1, lambda x: -alpha * grad_g * jnp.ones_like(x)),
        ]
        return self._assemble_vector(terms, mu, t, entries)

    def assemble_rhs(self, mu, t, entries=None):
        """RHS = lifting only (no forcing for the piston;
        reference: nonlinear.py:583-599)."""
        return self.assemble_lifting(mu=mu, t=t, entries=entries)

    # ------------------------------------------------------------------
    # Native f64 fast path (csrc/fom_piston.cpp via fom/native_sweep.py)
    # ------------------------------------------------------------------
    def _solve_native(self, mu):
        from .native_sweep import outputs_native

        return outputs_native(self, mu)

    # ------------------------------------------------------------------
    # Scan hooks: nonlinear snapshots + probes
    # ------------------------------------------------------------------
    def _step_extras(self, mu, t, u_n, u_n1):
        u_star = u_n if u_n1 is None else 2.0 * u_n - u_n1
        Nh = self.assemble_trilinear(mu=mu, t=t, u_n=u_star)
        rows, cols = self._nonlinear_topology
        data = band_gather_nnz(Nh.band, rows, cols, self.mesh.degree)
        return {"nonlinear_data": data}

    def _step_outputs(self, mu, t, uh, uc, scale):
        # The reference probes with the mesh at its reference position
        # (fom/base.py:786-792 moves back before runtime_process), i.e. at
        # material coordinates — scale=1.
        locs = _asarray(self.probe_location)
        vals = eval_function_at(uc, locs, self.mesh, scale=1.0)
        piston = uc[-1]
        return {"probes": jnp.concatenate([vals, piston[None]])}

    def _collect_runtime_outputs(self, outs):
        if "nonlinear_data" in outs:
            self.nonlinear_snapshots = [row for row in outs["nonlinear_data"]]
        if "probes" in outs:
            probes = outs["probes"]  # (nt, n_probes)
            self.probes = {i: list(probes[:, i]) for i in range(probes.shape[1])}

    # ------------------------------------------------------------------
    # Isentropic relations / mass conservation
    # ------------------------------------------------------------------
    @staticmethod
    def compute_rho(u, gamma):
        """ρ = (1 − (γ−1)/2·u)^(2/(γ−1)) (reference: nonlinear.py:601-612)."""
        A = (gamma - 1.0) / 2.0
        exp = 2.0 / (gamma - 1.0)
        return (1.0 - A * u) ** exp

    @staticmethod
    def compute_p(u, gamma):
        """p = (1 − (γ−1)/2·u)^(2γ/(γ−1)) (reference: nonlinear.py:614-625)."""
        A = (gamma - 1.0) / 2.0
        exp = 2.0 * (gamma / (gamma - 1.0))
        return (1.0 - A * u) ** exp

    def compute_mass_conservation(self, mu, ts, solutions, which):
        """∫ρ dx, its time derivative and piston outflow
        (reference: nonlinear.py:627-683)."""
        from ..ops.assembly import _function_at_quad  # FE-exact quadrature

        gamma = self.GAMMA
        wq = jnp.asarray(self.mesh.tables.quad_weights)

        mass = []
        outflow = []
        for t, u in zip(ts, np.asarray(solutions)):
            u = jnp.asarray(u)
            scale = self.scale_factor(mu, t)
            h = self.mesh.h0 * scale
            u_eq = _function_at_quad(u, self.mesh)
            rho_eq = self.compute_rho(u_eq, gamma)
            mass.append(float(h * jnp.sum(wq[None, :] * rho_eq)))

            u0 = float(eval_function_at(u, jnp.array([0.0]), self.mesh, scale=scale)[0])
            rho0 = self.compute_rho(u0, gamma=gamma)
            outflow.append(rho0 * u0)

        mass = np.array(mass)
        outflow = np.array(outflow)

        dt = self.dt
        mass_change = np.gradient(mass, dt, edge_order=2)

        a0 = mu[OneDimensionalBurgersConventions.A0]
        outflow = outflow * a0

        return {
            MassConservation.WHICH: which,
            MassConservation.TIMESTEPS: ts,
            MassConservation.MASS: mass,
            MassConservation.MASS_CHANGE: mass_change,
            MassConservation.OUTFLOW: outflow,
        }

    # ------------------------------------------------------------------
    # Reports
    # ------------------------------------------------------------------
    def save_probes(self, name=None):
        """Probe time series in physical units (reference:
        nonlinear.py:685-706)."""
        ts = self.timesteps
        locations = list(self.probe_location) + ["L"]

        df = pd.DataFrame({i: np.asarray(v) for i, v in self.probes.items()},
                          index=ts)
        df.index.name = MassConservation.TIMESTEPS
        df = df.mul(self.scale_solutions)
        df = df.rename(columns=dict(enumerate(locations)))
        if name is not None:
            df.to_csv(name)
        return df

    def save_mass_conservation(self, name):
        """Mass-conservation CSV for the FOM run (reference:
        nonlinear.py:708-721)."""
        output = self.compute_mass_conservation(
            mu=self.mu,
            ts=self.timesteps,
            solutions=self.solutions.fom.T,
            which=ProblemType.FOM,
        )
        dump_csv(name, obj=output)
        return output
