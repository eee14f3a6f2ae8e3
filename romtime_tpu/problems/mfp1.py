"""MFP1 — manufactured heat problem on fixed/moving domains
(reference: src/romtime/problems/mfp1.py:18-77).

Exact solution u_e = (1 − e^{−βt})(1 + δ²x²); Dirichlet data and forcing
follow. The reference encodes these as C++ expression strings JIT-compiled
by FFC; here they are plain JAX-traceable callables.
"""

import jax.numpy as jnp
import numpy as np

from ..fom import HeatEquationSolver


def define_mfp1_problem(L=None, nx=None, tf=None, nt=None):
    """Build the MFP1 problem definition.

    Returns (domain, boundary_conditions, forcing_term, u0, ue, Lt, dLt_dt).
    """

    domain = {
        HeatEquationSolver.L0: L,
        HeatEquationSolver.T: tf,
        HeatEquationSolver.NX: nx,
        HeatEquationSolver.NT: nt,
    }

    # Boundary conditions (strings at reference mfp1.py:28-36)
    def b0(t, L=None, dLt_dt=0.0, beta=None, **mu):
        return 1.0 - jnp.exp(-beta * t)

    def bL(t, L=None, dLt_dt=0.0, beta=None, delta=None, **mu):
        return (1.0 - jnp.exp(-beta * t)) * (1.0 + delta * delta * L * L)

    def db0_dt(t, L=None, dLt_dt=0.0, beta=None, **mu):
        return beta * jnp.exp(-beta * t)

    def dbL_dt(t, L=None, dLt_dt=0.0, beta=None, delta=None, **mu):
        decay = jnp.exp(-beta * t)
        linear = beta * decay * (1.0 + delta * delta * L * L)
        moving = 2.0 * (1.0 - decay) * (delta * delta) * L * dLt_dt
        return linear + moving

    boundary_conditions = {"b0": b0, "bL": bL, "db0_dt": db0_dt, "dbL_dt": dbL_dt}

    # Forcing term (string at reference mfp1.py:39)
    def forcing_term(x, t, beta=None, delta=None, alpha_0=None, **mu):
        decay = jnp.exp(-beta * t)
        return beta * decay * (1.0 + delta * delta * x * x) - (
            2.0 * delta * delta * alpha_0 * (1.0 - decay)
        )

    # Initial condition
    def u0(x, t=0.0, **mu):
        return jnp.zeros_like(x)

    # Exact solution (string at reference mfp1.py:45)
    def ue(x, t, beta=None, delta=None, **mu):
        return (1.0 - jnp.exp(-beta * t)) * (1.0 + delta * delta * x * x)

    def Lt(omega, t, **kwargs):
        """Mesh scaling (reference: mfp1.py:47-60)."""
        return 1.0 - jnp.sin(omega * t)

    def dLt_dt(omega, t, **kwargs):
        """Mesh scaling time derivative (reference: mfp1.py:62-75)."""
        return -omega * jnp.cos(omega * t)

    return domain, boundary_conditions, forcing_term, u0, ue, Lt, dLt_dt


def __getattr__(name):
    # The reference keeps an older generation of the HROM drivers in this
    # module (reference: problems/mfp1.py:80-556, a duplicate of
    # rom/hrom.py). The rebuild implements that legacy surface as thin
    # subclasses of the unified drivers (mfp1_legacy.py: explicit-mu_space
    # online evaluation + the spectrum/energy/error plots); the old import
    # path resolves to them.
    if name in ("HyperReducedOrderModelFixed", "HyperReducedOrderModelMoving"):
        from . import mfp1_legacy

        return getattr(mfp1_legacy, name)
    raise AttributeError(
        f"module 'romtime_tpu.problems.mfp1' has no attribute {name!r}"
    )
