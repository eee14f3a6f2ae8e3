"""Oscillating-piston problem definition
(reference: src/romtime/problems/piston.py:6-62).

Two start regimes: "rest" (smooth start) and "sudden". The piston Dirichlet
velocity lives at the right boundary; the left boundary (outflow) is free.
"""

import jax.numpy as jnp

from ..fom import OneDimensionalBurgers


def define_piston_problem(L=None, nx=None, tf=None, nt=None, which="rest"):
    """Build the piston problem definition.

    Returns (domain, boundary_conditions, forcing_term, u0, Lt, dLt_dt).
    """

    domain = {
        OneDimensionalBurgers.L0: L,
        OneDimensionalBurgers.T: tf,
        OneDimensionalBurgers.NX: nx,
        OneDimensionalBurgers.NT: nt,
    }

    # -------------------------------------------------------------------
    # Boundary conditions (strings at reference piston.py:17-27)
    if which == "sudden":

        def bL(t, L=None, dLt_dt=0.0, delta=None, omega=None, a0=None, **mu):
            return -delta * (omega / a0) * jnp.cos(omega * t)

        def dbL_dt(t, L=None, dLt_dt=0.0, delta=None, omega=None, a0=None, **mu):
            return delta * omega * (omega / a0) * jnp.sin(omega * t)

    elif which == "rest":

        def bL(t, L=None, dLt_dt=0.0, delta=None, omega=None, a0=None, **mu):
            return -delta * (omega / a0) * jnp.sin(omega * t)

        def dbL_dt(t, L=None, dLt_dt=0.0, delta=None, omega=None, a0=None, **mu):
            return -delta * omega * (omega / a0) * jnp.cos(omega * t)

    else:
        raise NotImplementedError("Which case do you want to solve?")

    boundary_conditions = {"bL": bL, "dbL_dt": dbL_dt}

    # -------------------------------------------------------------------
    # No forcing term; homogeneous start
    forcing_term = None

    def u0(x, t=0.0, **mu):
        return jnp.zeros_like(x)

    # -------------------------------------------------------------------
    # Moving boundary functions (reference piston.py:39-53)
    def Lt_sudden(omega, delta, t, **kwargs):
        return 1.0 - delta * jnp.sin(omega * t)

    def Lt_rest(omega, delta, t, **kwargs):
        return 1.0 - delta * (1.0 - jnp.cos(omega * t))

    def dLt_dt_sudden(omega, delta, t, **kwargs):
        return -omega * delta * jnp.cos(omega * t)

    def dLt_dt_rest(omega, delta, t, **kwargs):
        return -omega * delta * jnp.sin(omega * t)

    if which == "sudden":
        Lt, dLt_dt = Lt_sudden, dLt_dt_sudden
    else:
        Lt, dLt_dt = Lt_rest, dLt_dt_rest

    return domain, boundary_conditions, forcing_term, u0, Lt, dLt_dt
