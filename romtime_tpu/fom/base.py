"""Abstract 1-D full-order solver (TPU-native).

Mirrors the reference's ``OneDimensionalSolver`` (reference:
src/romtime/fom/base.py:46-915) with the *unified* time-stepping contract
``assemble_system(mu, t, bdf, u_n, u_n1)`` / ``assemble_system_rhs(mu, t,
Mh, u_n, u_n1)`` (fixing the signature drift documented in SURVEY.md §0).

Design differences from the reference, all TPU-first:

- No mesh object ever moves. The ALE map ``mesh.scale(Lt)`` (reference:
  fom/base.py:222-255) becomes a scalar pull-back factor applied to
  quadrature coordinates and Jacobians at assembly time.
- Operators are banded arrays assembled by einsum kernels
  (:mod:`romtime_tpu.ops.assembly`), not FEniCS matrices.
- The time loop (reference: fom/base.py:693-831) is a single ``lax.scan``
  compiled once per problem shape; the per-step linear solve is a Thomas
  sweep instead of PETSc GMRES+ILU.
- Expression strings JIT-compiled by FFC become plain Python/JAX callables:
  boundary data ``f(t, L=..., dLt_dt=..., **mu)``; space-time fields
  ``f(x, t=..., **mu)``.
"""

from abc import ABC, abstractmethod
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..base import SolutionsStorage
from ..conventions import BDF, BoundaryConditions, Domain
from ..dtypes import asarray as _asarray, compute_dtype, scalar as _scalar
from ..ops import Mesh1D
from ..ops.assembly import (
    apply_dirichlet_band,
    apply_dirichlet_vector,
    apply_entry_dirichlet,
    assemble_bilinear_band,
    assemble_bilinear_entries,
    assemble_linear_entries,
    assemble_linear_vector,
    band_gather_nnz,
    band_matvec,
    band_nonzero_entries,
    band_to_dense,
    eval_function_at,
    norm_L2,
    norm_H1,
)
from ..ops.linalg import solve_banded


def move_mesh(assemble):
    """API-parity decorator (reference: fom/base.py:17-43).

    The TPU rebuild never moves data; assembly methods already consume the
    pull-back scale. This decorator only marks the method as moving-mesh for
    introspection and passes through.
    """
    assemble.__moving__ = True
    return assemble


class BandedOperator:
    """Assembled operator in banded storage with a scipy-CSR-like face.

    ``.data`` plays the role of ``csr.data`` on the stored-nonzero pattern
    (reference: utils.py:76-93,116-149); ``todense``/``dot`` support the
    test/projection layer.
    """

    def __init__(self, band, mesh):
        self.band = band
        self.mesh = mesh

    @property
    def p(self):
        return self.mesh.degree

    @property
    def shape(self):
        return (self.mesh.nh, self.mesh.nh)

    def todense(self):
        return np.asarray(band_to_dense(self.band, self.p))

    def array(self):
        return self.todense()

    def dot(self, v):
        return band_matvec(self.band, v, self.p)

    def __mul__(self, v):
        # Mirrors dolfin's ``Mh_mat * u.vector()`` matvec syntax.
        return self.dot(v)

    def nonzero_entries(self, tolerance=None):
        return band_nonzero_entries(self.band, self.mesh, tolerance=tolerance)

    @property
    def data(self):
        rows, cols, values = self.nonzero_entries()
        return values

    def gather(self, rows, cols):
        return band_gather_nnz(self.band, rows, cols, self.p)

    def __add__(self, other):
        band = other.band if isinstance(other, BandedOperator) else other
        return BandedOperator(self.band + band, self.mesh)

    def __rmul__(self, scalar):
        return BandedOperator(scalar * self.band, self.mesh)


class OneDimensionalSolver(ABC):
    """Abstract FEM solver for 1-D parametrized problems on (possibly)
    moving domains."""

    RUNTIME_PROCESS = False

    DIRICHLET_ENTRY = 1.0
    DIRICHLET_VALUE = 0.0

    NX = Domain.NX
    NT = Domain.NT
    L0 = Domain.L0
    T = Domain.T

    B0 = BoundaryConditions.B0
    BL = BoundaryConditions.BL
    DB0_DT = BoundaryConditions.DB0_DT
    DBL_DT = BoundaryConditions.DBL_DT

    BDF_SCHEME = BDF.TWO

    # Whether operators integrate over the ALE-scaled domain.
    MOVING_ASSEMBLY = False

    def __init__(
        self,
        domain=None,
        dirichlet=None,
        parameters=None,
        forcing_term=None,
        u0=None,
        Lt=None,
        dLt_dt=None,
        filename=None,
        poly_type="P",
        degrees=1,
        project_u0=False,
        exact_solution=None,
    ) -> None:

        self.filename = filename
        self.domain = dict(domain) if domain else None
        self.dirichlet = dict(dirichlet) if dirichlet else None
        self.mu = dict(parameters) if parameters else None
        self.forcing_term = forcing_term
        self.u0 = u0
        self.Lt = Lt
        self.dLt_dt = dLt_dt
        self.poly_type = poly_type
        self.degrees = degrees
        self.project_u0 = project_u0
        self.exact_solution = exact_solution
        self.exact = None
        self.errors = None

        self._scale = 1.0  # mesh-motion shim state (API parity)

        self.mesh = None
        self.entries_dirichlet = None
        self.dofs_dirichlet = None

        self.solutions = None
        self.is_setup = False

        self._entry_map_cache = {}
        self._solve_jit = None

    # ------------------------------------------------------------------
    # Geometry
    # ------------------------------------------------------------------
    @property
    def x(self):
        """Dof coordinates at the current (possibly moved) mesh position
        (reference: fom/base.py:145-153)."""
        return np.asarray(self.mesh.x_dofs) * self._scale

    @property
    def L(self):
        """Current domain length (reference: fom/base.py:155-163)."""
        return float(self.domain[self.L0]) * self._scale

    @property
    def scale_solutions(self):
        return 1.0

    @property
    def dt(self):
        return self.domain[self.T] / self.domain[self.NT]

    @property
    def timesteps(self):
        return self.solutions.ts

    def scale_factor(self, mu, t):
        """ALE pull-back factor Lt(μ, t) (reference: mesh.scale at
        fom/base.py:239-255). 1.0 for fixed domains."""
        if self.Lt is None:
            return 1.0
        return self.Lt(t=t, **mu)

    def move_mesh(self, mu=None, t=None, back=False):
        """API-parity shim: set/reset the scale that ``x``/``L`` report."""
        if back:
            self._scale = 1.0
        else:
            self._scale = self.scale_factor(mu, t)

    def _move_mesh(self, scale=None, back=False):
        if back:
            self._scale = 1.0
        else:
            self._scale = scale

    # ------------------------------------------------------------------
    # Setup
    # ------------------------------------------------------------------
    def setup(self):
        """Create the static FEM structures (reference: fom/base.py:260-295)."""
        self.mesh = Mesh1D(
            L0=float(self.domain[self.L0]),
            nx=int(self.domain[self.NX]),
            degree=int(self.degrees),
        )
        self.find_dirichlet_entries()
        self._entry_map_cache = {}
        self._solve_jit = {}
        self.is_setup = True

    @property
    def dirichlet_dofs(self):
        """Dofs pinned by the Dirichlet convention — derived from which
        boundary values the problem actually defines (left ``b0``, right
        ``bL``) instead of hardcoding both endpoints, so a one-sided
        layout (the piston's right-only Dirichlet, a left-only heat
        problem) flows from the BC dict with no subclass override.
        ``dirichlet=None`` keeps the reference's homogeneous both-ends
        default (reference: fom/base.py:858-876)."""
        if self.dirichlet is None:
            return (0, self.mesh.nh - 1)
        dofs = []
        if self.B0 in self.dirichlet:
            dofs.append(0)
        if self.BL in self.dirichlet:
            dofs.append(self.mesh.nh - 1)
        return tuple(dofs)

    def find_dirichlet_entries(self):
        """Detect Dirichlet entries from assembled operator topology for
        the (M)DEIM local-assembly short-circuit (reference:
        fom/base.py:320-348): assemble the μ-independent probe
        (M + A_topo)/2 — unit mass plus the fixed −u′·v + u′·v′
        stiffness-topology form — through the banded assembly with the
        BC convention applied, and record every structural entry equal
        to ``DIRICHLET_ENTRY``. Detection (not declaration) is what the
        DEIM masking consumes, so an assembly override that pins
        different rows is picked up instead of silently inheriting the
        endpoint convention."""
        mesh = self.mesh
        ones = jnp.ones_like(_asarray(mesh.xq_ref))
        M = assemble_bilinear_band(mesh, ones, 0, 0, mesh.h0)
        A = (assemble_bilinear_band(mesh, ones, 1, 1, mesh.h0)
             - assemble_bilinear_band(mesh, ones, 1, 0, mesh.h0))
        K = apply_dirichlet_band(
            (M + A) / 2.0, self.dirichlet_dofs, mesh.degree,
            self.DIRICHLET_ENTRY,
        )
        rows, cols, values = band_nonzero_entries(K, mesh)
        mask = np.isclose(values, self.DIRICHLET_ENTRY)
        self.dofs_dirichlet = [(int(r),) for r in rows[mask]]
        self.entries_dirichlet = list(
            zip(rows[mask].tolist(), cols[mask].tolist())
        )

    def update_parametrization(self, new):
        self.mu = dict(new)

    # ------------------------------------------------------------------
    # Generic assembly drivers
    # ------------------------------------------------------------------
    def _assembly_scale(self, mu, t):
        scale = self.scale_factor(mu, t) if self.MOVING_ASSEMBLY else 1.0
        # Lane-batched μ (leaves shaped (B,)): quadrature coordinates must
        # carry the trailing batch axis even on fixed domains, so coefficient
        # closures broadcast against (B,) parameters (docs/tpu_notes.md).
        bshape = self._mu_batch_shape(mu)
        if bshape and jnp.ndim(scale) == 0:
            scale = scale * jnp.ones(bshape, dtype=compute_dtype())
        return scale

    @staticmethod
    def _mu_batch_shape(mu):
        """() for scalar μ, (B,) when μ leaves are lane-batched arrays."""
        if not mu:
            return ()
        for v in mu.values():
            if jnp.ndim(v) >= 1:
                return jnp.shape(v)
        return ()

    def _entry_map(self, entries):
        key = tuple(tuple(int(v) for v in e) for e in entries)
        cached = self._entry_map_cache.get(key)
        if cached is None:
            cached = self.mesh.build_entry_map(key, dirichlet_dofs=self.dirichlet_dofs)
            self._entry_map_cache[key] = cached
        return cached

    def _xq(self, scale, elements=None):
        # Index host-side: the element subset is static, so no gather ever
        # reaches the compiled program (TPU gathers in scan bodies are
        # compile-time poison; see ops.assembly._gather_terms).
        xq = self.mesh.xq_ref
        if elements is not None:
            xq = xq[elements]
        xq = _asarray(xq)
        # Batched (lane-last) scale: broadcast over a trailing μ axis.
        if jnp.ndim(scale) >= 1:
            return xq[..., None] * scale
        return xq * scale

    @staticmethod
    def _call_coeff(c, xq, elements):
        """Coefficient callables take (x_phys[, elements]) — ``elements``
        lets state-dependent coefficients (trilinear u_n·u′·v) gather their
        FE-function values on the reduced element set."""
        nargs = getattr(c, "__code__", None)
        if nargs is not None and nargs.co_argcount >= 2:
            return c(xq, elements)
        return c(xq)

    def _assemble_matrix(self, terms, mu, t, entries=None, raw_band=False):
        """Assemble a sum of bilinear terms.

        terms: list of (a, b, coeff) with coeff(x_phys[, elements]) -> array
        shaped like x_phys; coefficients close over (mu, t).
        """
        scale = self._assembly_scale(mu, t)
        h = self.mesh.h0 * scale
        if entries:
            emap = self._entry_map(entries)
            xq = self._xq(scale, emap.elements)
            values = sum(
                assemble_bilinear_entries(
                    self.mesh, emap, self._call_coeff(c, xq, emap.elements),
                    a, b, h, apply_dirichlet=False
                )
                for (a, b, c) in terms
            )
            return apply_entry_dirichlet(values, emap)
        xq = self._xq(scale)
        band = sum(
            assemble_bilinear_band(self.mesh, self._call_coeff(c, xq, None), a, b, h)
            for (a, b, c) in terms
        )
        band = apply_dirichlet_band(
            band, self.dirichlet_dofs, self.mesh.degree, self.DIRICHLET_ENTRY
        )
        if raw_band:
            return band
        return BandedOperator(band, self.mesh)

    def _assemble_vector(self, terms, mu, t, entries=None):
        """Assemble a sum of linear terms: (b, coeff)."""
        scale = self._assembly_scale(mu, t)
        h = self.mesh.h0 * scale
        if entries:
            emap = self._entry_map(entries)
            xq = self._xq(scale, emap.elements)
            values = sum(
                assemble_linear_entries(
                    self.mesh, emap, self._call_coeff(c, xq, emap.elements),
                    b, h, apply_dirichlet=False
                )
                for (b, c) in terms
            )
            return apply_entry_dirichlet(values, emap)
        xq = self._xq(scale)
        vec = sum(
            assemble_linear_vector(self.mesh, self._call_coeff(c, xq, None), b, h)
            for (b, c) in terms
        )
        return apply_dirichlet_vector(vec, self.dirichlet_dofs, self.DIRICHLET_VALUE)

    # ------------------------------------------------------------------
    # Operators (subclasses override/extend)
    # ------------------------------------------------------------------
    def assemble_mass(self, mu, t, entries=None):
        """Mass operator u·v (reference: fom/base.py:651-665)."""
        one = lambda x: jnp.ones_like(x)
        return self._assemble_matrix([(0, 0, one)], mu, t, entries)

    @abstractmethod
    def assemble_stiffness(self, mu=None, t=None, entries=None):
        ...

    def assemble_convection(self, mu=None, t=None, entries=None):
        pass

    @abstractmethod
    def assemble_forcing(self, mu, t, entries=None):
        ...

    @abstractmethod
    def assemble_lifting(self, mu, t, entries=None):
        ...

    @abstractmethod
    def assemble_system(self, mu, t, bdf=1.0, u_n=None, u_n1=None):
        """Return (Mh, Kh) for the BDF step (unified contract)."""
        ...

    @abstractmethod
    def assemble_system_rhs(self, mu, t, Mh_mat, u_n, u_n1=None):
        ...

    # ------------------------------------------------------------------
    # Lifting
    # ------------------------------------------------------------------
    def _dirichlet_value(self, key, mu, t, L, dLt_dt=0.0):
        fn = self.dirichlet[key]
        if callable(fn):
            return fn(t=t, L=L, dLt_dt=dLt_dt, **mu)
        return fn

    def create_lifting_operator(self, mu, t, L, only_g=False):
        """Lifting g, dg/dt, ∇g as callables of physical x
        (reference: fom/base.py:377-498).

        The moving-boundary correction of dg/dt (reference:
        fom/base.py:407-421) is included when ``dLt_dt`` is defined.
        """
        b0 = self._dirichlet_value(self.B0, mu, t, L)
        bL = self._dirichlet_value(self.BL, mu, t, L)

        def g(x):
            return bL * (x / L) + b0 * (L - x) / L

        if only_g:
            return g

        if self.dLt_dt:
            L0 = self.domain[self.L0]
            dLt_dt_val = self.dLt_dt(t=t, **mu) * L0
            db0 = self._dirichlet_value(self.DB0_DT, mu, t, L, dLt_dt=dLt_dt_val)
            dbL = self._dirichlet_value(self.DBL_DT, mu, t, L, dLt_dt=dLt_dt_val)

            def dg_dt(x):
                linear = dbL * (x / L) + db0 * (L - x) / L
                moving = (b0 - bL) * (x / L) * (dLt_dt_val / L)
                return linear + moving

        else:
            db0 = self._dirichlet_value(self.DB0_DT, mu, t, L, dLt_dt=0.0)
            dbL = self._dirichlet_value(self.DBL_DT, mu, t, L, dLt_dt=0.0)

            def dg_dt(x):
                return dbL * (x / L) + db0 * (L - x) / L

        grad_g = (bL - b0) / L

        return g, dg_dt, grad_g

    # ------------------------------------------------------------------
    # Interpolation / evaluation
    # ------------------------------------------------------------------
    def interpolate_func(self, g, V=None, mu=None, t=None):
        """Interpolate a callable onto the dof grid; moving solvers evaluate
        at the scaled coordinates (reference: fom/base.py:841-856 and the
        moving overrides heat.py:222-240)."""
        scale = self.scale_factor(mu, t) if self.MOVING_ASSEMBLY else 1.0
        x = _asarray(self.mesh.x_dofs) * scale
        return self._eval_field(g, x, mu, t)

    def _eval_field(self, fn, x, mu, t):
        if callable(fn):
            return fn(x, t=t, **(mu or {}))
        return jnp.full_like(x, float(fn))

    def _project_field(self, fn, mu, scale):
        """L2 projection of a callable onto the FE space."""
        h = self.mesh.h0 * scale
        coeff = lambda x: self._eval_field(fn, x, mu, 0.0)
        rhs = assemble_linear_vector(
            self.mesh, coeff(self._xq(scale)), 0, h
        )
        ones = jnp.ones_like(_asarray(self.mesh.xq_ref))
        M = assemble_bilinear_band(self.mesh, ones, 0, 0, h)
        return solve_banded(M, rhs, self.mesh.degree)

    def runtime_process(self, u):
        pass

    # ------------------------------------------------------------------
    # Time integration (lax.scan)
    # ------------------------------------------------------------------
    def _initial_condition(self, mu):
        scale0 = self.scale_factor(mu, 0.0) if self.MOVING_ASSEMBLY else 1.0
        x0 = _asarray(self.mesh.x_dofs) * scale0
        u_init = self._eval_field(self.u0, x0, mu, 0.0)
        if self.project_u0:
            # L2 projection instead of interpolation (reference:
            # fom/base.py:710-713): solve M c = ∫ u0 v. For smooth data the
            # two coincide at the interpolation points up to quadrature.
            u_init = self._project_field(self.u0, mu, scale0)
        g0 = self.create_lifting_operator(mu=mu, t=0.0, L=self.domain[self.L0] * scale0,
                                          only_g=True)
        return u_init - g0(x0)

    def _mu_array(self, mu):
        names = sorted(mu.keys())
        return {k: _scalar(mu[k]) for k in names}

    def _step_outputs(self, mu, t, uh, uc, scale):
        """Per-step auxiliary outputs collected by the scan (probes etc.)."""
        return {}

    def _step_extras(self, mu, t, u_n, u_n1):
        """Pre-solve per-step outputs (e.g. nonlinear operator snapshots)."""
        return {}

    def _solve_impl(self, mu):
        """Full time loop as one scan; returns stacked solution arrays.

        With ``self.dd_sweep`` set, runs the compensated residual-form
        loop instead (``_solve_impl_dd``) — same output contract plus
        ``uh_lo``."""
        if getattr(self, "dd_sweep", False):
            return self._solve_impl_dd(mu)
        nt = int(self.domain[self.NT])
        nh = self.mesh.nh
        bdf2 = self.BDF_SCHEME == BDF.TWO

        # Keep every traced scalar in the active compute dtype — an int32
        # step counter times a Python float silently promotes to f64 under
        # x64, which on TPU means emulated double precision everywhere.
        dtype = compute_dtype()
        dt = _scalar(self.dt)
        one_five = _scalar(1.5)
        one = _scalar(1.0)

        u0 = self._initial_condition(mu)

        def step(carry, k):
            u_n, u_n1 = carry
            t = (k + 1).astype(dtype) * dt
            bdf = jnp.where(k > 0, one_five, one) if bdf2 else one

            # Under BDF-2 the history u_n1 starts as a zero vector, matching
            # the reference's zero Function (fom/base.py:717-720).
            Mh, Kh = self.assemble_system(mu, t, bdf, u_n, u_n1 if bdf2 else None)
            bh = self.assemble_system_rhs(mu, t, Mh, u_n, u_n1 if bdf2 else None)
            extras = self._step_extras(mu, t, u_n, u_n1 if bdf2 else None)

            Kh_band = Kh.band if isinstance(Kh, BandedOperator) else Kh
            uh = solve_banded(Kh_band, bh, self.mesh.degree)

            scale = self.scale_factor(mu, t) if self.Lt else 1.0
            L = self.domain[self.L0] * scale
            x_phys = _asarray(self.mesh.x_dofs) * scale
            g = self.create_lifting_operator(mu=mu, t=t, L=L, only_g=True)
            gh = g(x_phys)
            uc = uh + gh

            outputs = dict(uh=uh, uc=uc, x=x_phys, t=t)
            outputs.update(extras)
            outputs.update(self._step_outputs(mu, t, uh, uc, scale))

            if self.exact_solution is not None:
                ue_h = self._eval_field(self.exact_solution, x_phys, mu, t)
                outputs["exact"] = ue_h
                outputs["error"] = norm_L2(uc - ue_h, self.mesh)

            return (uh, u_n), outputs

        carry0 = (u0, jnp.zeros_like(u0))
        _, outs = jax.lax.scan(step, carry0, jnp.arange(nt))
        return outs

    def _solve_impl_dd(self, mu):
        """Residual-form double-f32 time loop (compensated sweep).

        Same step algebra as ``_solve_impl`` — K·u = M·(2uₙ−½uₙ₋₁)+dt·f_g
        with K = bdf·M + dt·A — restructured so f32 rounding enters only
        relative to the per-step increment (ops/compensated.py):

            u_pred = 2uₙ − uₙ₋₁              (dd extrapolation)
            r0     = M·(uₙ₋₁−uₙ) + dt·f_g − dt·A·u_pred
            K·δ    = r0,   u = u_pred ⊕ δ    (dd accumulation)

        where dt·A·u_pred is formed as K·u_pred − bdf·M·u_pred (no
        separate-operator API needed; the subtraction is benign — K is
        dt·A-dominated at FEM scalings) including the low-word
        correction dt·A·u_pred_lo. The state is carried as an
        unevaluated double-f32 sum.

        Measured caveat (ROADMAP.md round-3 findings): because the FOM
        step is stiffness-dominated, f32 recursion drift never
        accumulates in the plain loop either — same-μ drift vs f64
        (~1e-5, piston headline scale) is the response to the f32
        *representation* of μ/t/coefficients, unchanged by this
        restructuring. The dd loop is kept for M-dominated regimes
        (small dt·A/M) and as the exact-algebra reference for the
        online residual-form engines; it costs no accuracy or speed.
        TPU-offline analog of the reference's serial f64 PETSc loop
        (reference: fom/base.py:693-831).

        Extra output ``uh_lo``: low words; ``uh + uh_lo`` recombined in
        f64 on the host recovers the dd trajectory in full.
        """
        from ..ops.compensated import (
            dd_add_small,
            dd_bdf2_predict,
            dd_history_diff,
        )

        nt = int(self.domain[self.NT])
        bdf2 = self.BDF_SCHEME == BDF.TWO
        dtype = compute_dtype()
        dt = _scalar(self.dt)
        one_five = _scalar(1.5)
        one = _scalar(1.0)
        p = self.mesh.degree

        u0 = self._initial_condition(mu)
        zeros = jnp.zeros_like(u0)

        def step(carry, k):
            u_h, u_l, u1_h, u1_l = carry
            t = (k + 1).astype(dtype) * dt
            bdf = jnp.where(k > 0, one_five, one) if bdf2 else one

            if bdf2:
                up_h, up_l = dd_bdf2_predict(u_h, u_l, u1_h, u1_l)
            else:
                up_h, up_l = u_h, u_l

            # u*(trilinear) must equal u_pred: passing (u_pred, u_pred)
            # makes 2uₙ−uₙ₋₁ collapse to u_pred inside assemble_system.
            Mh, Kh = self.assemble_system(
                mu, t, bdf, up_h, up_h if bdf2 else None
            )
            extras = self._step_extras(mu, t, u_h, u1_h if bdf2 else None)
            Mb = Mh.band if isinstance(Mh, BandedOperator) else Mh
            Kb = Kh.band if isinstance(Kh, BandedOperator) else Kh

            # dt·f_g exactly: the M-history terms drop with zeroed states.
            f_vec = self.assemble_system_rhs(
                mu, t, Mh, zeros, zeros if bdf2 else None
            )

            # M·(uₙ₋₁ − uₙ): exactly zero under BDF-1 (u_pred = uₙ) and at
            # the BDF-2 startup step (bdf=1, zero history ⇒ u_pred = 2uₙ,
            # M-coefficient 2 − ½·0 − 1·2 = 0).
            if bdf2:
                d = dd_history_diff(u_h, u_l, u1_h, u1_l)
                r_M = jnp.where(k > 0, one, _scalar(0.0)) * band_matvec(
                    Mb, d, p
                )
            else:
                r_M = jnp.zeros_like(u_h)

            # dt·A·u_pred (hi + lo words) = K·up − bdf·M·up.
            Ku = band_matvec(Kb, up_h, p) + band_matvec(Kb, up_l, p)
            Mu = band_matvec(Mb, up_h, p) + band_matvec(Mb, up_l, p)
            r0 = r_M + f_vec - (Ku - bdf * Mu)

            delta = solve_banded(Kb, r0, p)
            nh_h, nh_l = dd_add_small(up_h, up_l, delta)

            scale = self.scale_factor(mu, t) if self.Lt else 1.0
            L = self.domain[self.L0] * scale
            x_phys = _asarray(self.mesh.x_dofs) * scale
            g = self.create_lifting_operator(mu=mu, t=t, L=L, only_g=True)
            gh = g(x_phys)
            uc = nh_h + gh

            outputs = dict(uh=nh_h, uh_lo=nh_l, uc=uc, x=x_phys, t=t)
            outputs.update(extras)
            outputs.update(self._step_outputs(mu, t, nh_h, uc, scale))

            if self.exact_solution is not None:
                ue_h = self._eval_field(self.exact_solution, x_phys, mu, t)
                outputs["exact"] = ue_h
                outputs["error"] = norm_L2(uc - ue_h, self.mesh)

            return (nh_h, nh_l, u_h, u_l), outputs

        carry0 = (u0, zeros, zeros, zeros)
        _, outs = jax.lax.scan(step, carry0, jnp.arange(nt))
        return outs

    def solve(self):
        """Integrate the problem in time (reference: fom/base.py:693-831).

        Certification-grade f64 runs of the shipped piston physics take
        the native C++ loop (fom/native_sweep.py — identical algebra,
        ~100× the XLA-CPU scan on a single-core host); everything else
        (f32 device sweeps, dd sweeps, subclassed physics) keeps the
        traced jax path."""
        mu = self.mu

        outs = None
        if (np.dtype(compute_dtype()) == np.dtype(np.float64)
                and not getattr(self, "dd_sweep", False)):
            outs = self._solve_native(mu)
        if outs is None:
            mu_jnp = self._mu_array(mu)
            key = (compute_dtype(), bool(getattr(self, "dd_sweep", False)))
            if not isinstance(self._solve_jit, dict):
                self._solve_jit = {}
            if key not in self._solve_jit:
                self._solve_jit[key] = jax.jit(self._solve_impl)
            outs = self._solve_jit[key](mu_jnp)
            outs = jax.tree_util.tree_map(np.asarray, outs)

        ts = outs["t"]
        snapshots = outs["uh"].T  # (nh, nt)
        fom = outs["uc"].T
        if "uh_lo" in outs:
            # dd sweep: recombine hi + low words in f64 on the host — the
            # sub-f32 correction is the point of the compensated path
            # (same contract as the batched device sweeps,
            # rom/rom.py build_reduced_basis device path).
            lo = outs["uh_lo"].T.astype(np.float64)
            snapshots = snapshots.astype(np.float64) + lo
            fom = fom.astype(np.float64) + lo
        domain_x = outs["x"].T

        self.solutions = SolutionsStorage(
            ts=ts,
            mu=mu,
            domain=domain_x,
            fom=fom,
            snapshots=snapshots,
        )
        self.domain_x = domain_x

        if self.exact_solution is not None:
            self._exact = outs["exact"].T
            self.errors = dict(zip(ts, outs["error"]))
            self.exact = {t: outs["exact"][i] for i, t in enumerate(ts)}

        self._collect_runtime_outputs(outs)
        return self.solutions

    def _solve_native(self, mu):
        """Native fast-path hook: return the ``_solve_impl`` output dict
        (numpy) or None to use the traced jax loop. Base solvers have no
        native kernel."""
        return None

    def _collect_runtime_outputs(self, outs):
        """Hook for subclasses to harvest scan outputs (probes, nonlinear
        snapshots)."""
        pass

    def dump_solutions(self, name):
        self.solutions.to_pickle(name)

    # ------------------------------------------------------------------
    # Dof/cell maps and solver factory (API parity)
    # ------------------------------------------------------------------
    def build_cell_to_dofs(self):
        """Cell → dof map (reference: fom/base.py:188-203). The structured
        mesh makes it closed-form; exposed for parity/inspection."""
        self.cell_to_dofs = {
            e: self.mesh.cell_dofs(e) for e in range(self.mesh.ne)
        }
        return self.cell_to_dofs

    def build_dofs_to_cells(self):
        """Dof → cells map, "fundamental for the DEIM implementation"
        (reference: fom/base.py:205-220)."""
        self.dof_to_cells = {
            d: self.mesh.dof_cells(d) for d in range(self.mesh.nh)
        }
        return self.dof_to_cells

    def find_cells_to_cover(self, entry):
        """Cells carrying the basis functions of an entry
        (reference: fom/base.py:601-624)."""
        cells = set()
        for dof in entry:
            cells.update(self.mesh.dof_cells(int(dof)))
        return cells

    def create_algebraic_solver(self):
        """Linear-solver factory (reference: fom/base.py:360-375 creates
        GMRES+ILU at 1e-10 tolerances). The banded systems here are solved
        directly — exact, which is strictly tighter than the reference's
        iterative tolerance."""
        p = self.mesh.degree

        def solver(band, rhs):
            return solve_banded(band, rhs, p)

        return solver

    def assemble_local(self, form_terms, entries, mu=None, t=None,
                       is_vector=False):
        """Per-entry assembly API (reference: fom/base.py:523-599). The
        framework's solvers use the higher-level ``assemble_*(entries=...)``
        methods; this thin wrapper keeps the reference entry point."""
        if is_vector:
            return self._assemble_vector(form_terms, mu, t, entries=entries)
        return self._assemble_matrix(form_terms, mu, t, entries=entries)

    # ------------------------------------------------------------------
    # Errors
    # ------------------------------------------------------------------
    def _compute_error(self, u, ue, norm_type="L2"):
        """Error norms matching ``fenics.errornorm`` with degree_rise=0
        (reference: fom/base.py:878-915)."""
        e = jnp.asarray(u) - jnp.asarray(ue)
        if norm_type == "max":
            return float(jnp.max(jnp.abs(e)))
        if norm_type == "L2":
            return float(norm_L2(e, self.mesh))
        if norm_type == "H1":
            return float(norm_H1(e, self.mesh))
        raise ValueError(f"Unknown norm type {norm_type}.")

    # ------------------------------------------------------------------
    # Point evaluation (probes)
    # ------------------------------------------------------------------
    def evaluate_at(self, u, x_points, scale=1.0):
        return eval_function_at(jnp.asarray(u), jnp.asarray(x_points), self.mesh,
                                scale=scale)

    @staticmethod
    def dict_to_array(my_dict):
        return np.array([np.asarray(v) for v in my_dict.values()]).T

    # ------------------------------------------------------------------
    # Plotting (reference: fom/base.py:917-1012)
    # ------------------------------------------------------------------
    def plot_solution(self, pics=6, save=None):
        from ..utils.plotting import plot_solution

        plot_solution(self.solutions, pics=pics, save=save,
                      scale=self.scale_solutions)

    def plot_errors(self, save=None, log=False, new=True, label=None):
        from ..utils.plotting import plot_errors

        plot_errors(self.timesteps, list(self.errors.values()),
                    save=save, log=log, new=new, label=label)

    def plot_snapshots(self, pics=6, save=None):
        from ..utils.plotting import plot_solution

        class _SnapshotView:
            domain = self.solutions.domain
            fom = self.solutions.snapshots

        plot_solution(_SnapshotView, pics=pics, save=save, title="Snapshots")
