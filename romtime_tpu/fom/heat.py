"""Heat equation solvers on fixed and moving 1-D domains.

TPU-native rebuild of the reference's heat path (reference:
src/romtime/fom/heat.py:7-303) with the unified BDF contract
``assemble_system(mu, t, bdf, u_n, u_n1)`` — the reference's heat solvers
were left on the pre-BDF-2 3-argument signature (SURVEY.md §0).

Physics: u_t − α u_xx = f with Dirichlet data handled by a linear lifting g;
the moving variant adds the ALE mesh-velocity convection −w u′ v and
integrates every form on the scaled domain.
"""

import jax.numpy as jnp

from ..conventions import BDF
from .base import OneDimensionalSolver, move_mesh


class HeatEquationSolver(OneDimensionalSolver):
    """Implicit heat solver on the fixed domain (reference: heat.py:7-188).

    BDF-1 (implicit Euler) by default — the scheme behind the reference's
    golden error anchors (tests/test_mpf1.py:361-371); BDF-2 supported
    through the unified contract.
    """

    BDF_SCHEME = BDF.ONE
    MOVING_ASSEMBLY = False

    def __init__(
        self,
        domain: dict,
        dirichlet: dict,
        parameters: dict = None,
        forcing_term=None,
        u0=None,
        filename=None,
        poly_type="P",
        degrees=1,
        project_u0=False,
        exact_solution=None,
        Lt=None,
        dLt_dt=None,
    ) -> None:
        super().__init__(
            domain=domain,
            dirichlet=dirichlet,
            parameters=parameters,
            forcing_term=forcing_term,
            u0=u0,
            filename=filename,
            poly_type=poly_type,
            degrees=degrees,
            project_u0=project_u0,
            exact_solution=exact_solution,
            Lt=Lt,
            dLt_dt=dLt_dt,
        )
        self.alpha = None

    # ------------------------------------------------------------------
    # Coefficients
    # ------------------------------------------------------------------
    def create_diffusion_coefficient(self, mu=None):
        """Constant diffusion α = α₀ (reference: heat.py:42-55)."""
        return mu["alpha_0"]

    # ------------------------------------------------------------------
    # Unified BDF system
    # ------------------------------------------------------------------
    def assemble_system(self, mu, t, bdf=1.0, u_n=None, u_n1=None):
        Mh = self.assemble_mass(mu=mu, t=t)
        Ah = self.assemble_stiffness(mu=mu, t=t)
        dt = self.dt
        Kh_band = bdf * Mh.band + dt * Ah.band
        return Mh, type(Mh)(Kh_band, self.mesh)

    def assemble_system_rhs(self, mu, t, Mh_mat, u_n, u_n1=None):
        fh = self.assemble_rhs(mu=mu, t=t)
        if u_n1 is None:
            bdf_term = Mh_mat.dot(u_n)
        else:
            bdf_term = Mh_mat.dot(2.0 * u_n - 0.5 * u_n1)
        return bdf_term + self.dt * jnp.asarray(fh)

    # ------------------------------------------------------------------
    # Operators
    # ------------------------------------------------------------------
    def assemble_stiffness(self, mu, t, entries=None):
        """α ∇u·∇v (reference: heat.py:80-97)."""
        alpha = self.create_diffusion_coefficient(mu)
        coeff = lambda x: alpha * jnp.ones_like(x)
        return self._assemble_matrix([(1, 1, coeff)], mu, t, entries)

    def assemble_forcing(self, mu, t, entries=None):
        """f(x, t, μ)·v (reference: heat.py:99-129)."""
        coeff = lambda x: self._eval_field(self.forcing_term, x, mu, t)
        return self._assemble_vector([(0, coeff)], mu, t, entries)

    def assemble_lifting(self, mu, t, entries=None):
        """−(ġ v + α ∇g·∇v) (reference: heat.py:131-169)."""
        scale = self._assembly_scale(mu, t)
        L = self.domain[self.L0] * scale
        _, dg_dt, grad_g = self.create_lifting_operator(mu=mu, t=t, L=L)
        alpha = self.create_diffusion_coefficient(mu)
        terms = [
            (0, lambda x: -dg_dt(x)),
            (1, lambda x: -alpha * grad_g * jnp.ones_like(x)),
        ]
        return self._assemble_vector(terms, mu, t, entries)

    def assemble_rhs(self, mu, t, entries=None):
        """Forcing + lifting (reference: heat.py:171-188)."""
        fh = self.assemble_forcing(mu=mu, t=t, entries=entries)
        fgh = self.assemble_lifting(mu=mu, t=t, entries=entries)
        return fh + fgh


class HeatEquationMovingSolver(HeatEquationSolver):
    """ALE heat solver on the uniformly scaled domain
    (reference: heat.py:191-303).

    Every form integrates over the scaled mesh (the reference wraps each
    assembly in ``@move_mesh``); here MOVING_ASSEMBLY routes the pull-back
    scale into the generic drivers, so the decorators are parity markers.
    """

    MOVING_ASSEMBLY = True

    def compute_mesh_velocity(self, mu, t):
        """w(x) = x·L̇t/Lt on the scaled domain (reference: heat.py:242-249)."""
        dLt_dt = self.dLt_dt(t=t, **mu)
        Lt = self.Lt(t=t, **mu)
        return lambda x: x * dLt_dt / Lt

    def assemble_system(self, mu, t, bdf=1.0, u_n=None, u_n1=None):
        Mh = self.assemble_mass(mu=mu, t=t)
        Ah = self.assemble_stiffness(mu=mu, t=t)
        Ch = self.assemble_convection(mu=mu, t=t)
        dt = self.dt
        Kh_band = bdf * Mh.band + dt * (Ch.band + Ah.band)
        return Mh, type(Mh)(Kh_band, self.mesh)

    @move_mesh
    def assemble_convection(self, mu, t, entries=None):
        """−w u′ v (reference: heat.py:267-285)."""
        w = self.compute_mesh_velocity(mu=mu, t=t)
        coeff = lambda x: -w(x)
        return self._assemble_matrix([(1, 0, coeff)], mu, t, entries)
