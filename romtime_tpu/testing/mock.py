"""Minimal concrete FOMs for the (M)DEIM test layer
(reference: src/romtime/testing/mock.py:6-145).

MockSolver exposes stiffness/mass/convection/forcing assembly against the
real kernel backend without a full physics time loop; the moving variant
integrates its stiffness on the scaled domain.
"""

import jax.numpy as jnp

from ..fom.base import OneDimensionalSolver, move_mesh


class MockSolver(OneDimensionalSolver):
    def __init__(
        self,
        domain,
        dirichlet,
        forcing_term=None,
        Lt=None,
        degrees=1,
    ) -> None:
        super().__init__(
            domain=domain,
            dirichlet=dirichlet,
            poly_type="P",
            degrees=degrees,
            forcing_term=forcing_term,
            Lt=Lt,
        )

    def assemble_system(self, mu, t, bdf=1.0, u_n=None, u_n1=None):
        pass

    def assemble_system_rhs(self, mu, t, Mh_mat, u_n, u_n1=None):
        pass

    def create_diffusion_coefficient(self, mu, t):
        """Time-dependent diffusion α₀(1 + t²) (reference: mock.py:30-49)."""
        return mu["alpha_0"] * (1.0 + t * t)

    def assemble_stiffness(self, mu, t, entries=None):
        alpha = self.create_diffusion_coefficient(mu=mu, t=t)
        coeff = lambda x: alpha * jnp.ones_like(x)
        return self._assemble_matrix([(1, 1, coeff)], mu, t, entries)

    def assemble_convection(self, mu, t, entries=None):
        """-u'·v (reference: mock.py:70-85)."""
        coeff = lambda x: -jnp.ones_like(x)
        return self._assemble_matrix([(1, 0, coeff)], mu, t, entries)

    def assemble_forcing(self, mu, t, entries=None):
        coeff = lambda x: self._eval_field(self.forcing_term, x, mu, t)
        return self._assemble_vector([(0, coeff)], mu, t, entries)

    def assemble_lifting(self, mu, t, entries=None):
        pass


class MockSolverMoving(MockSolver):
    """Moving variant: stiffness on the scaled domain
    (reference: mock.py:121-145)."""

    MOVING_ASSEMBLY = True

    @move_mesh
    def assemble_stiffness(self, mu, t, entries=None):
        return super().assemble_stiffness(mu, t, entries=entries)
