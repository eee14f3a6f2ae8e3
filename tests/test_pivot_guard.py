"""Unpivoted-solve certification guard (VERDICT r3 weak-4).

The online engines eliminate without pivoting; ``certify_pivot_free``
sweeps cond₂(K_N) over the μ-box corners and refuses the pivot-free path
above ``PIVOT_FREE_COND_BOUND``. The adversarial case shows why: an
ill-conditioned family breaks unpivoted elimination where the pivoted
one still solves.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from romtime_tpu.ops.linalg import gauss_solve


def test_unpivoted_elimination_fails_on_adversarial_matrix():
    """Tiny leading pivots blow up unpivoted elimination — the failure
    mode the certification exists to catch."""
    N = 12
    rng = np.random.default_rng(0)
    A = rng.normal(size=(N, N))
    A[0, 0] = 1e-14  # near-zero leading pivot, matrix still well-posed
    x_true = rng.normal(size=N)
    b = A @ x_true

    x_piv = np.asarray(gauss_solve(jnp.asarray(A), jnp.asarray(b),
                                   pivot=True))
    assert_allclose(x_piv, x_true, rtol=1e-8)

    x_nopiv = np.asarray(gauss_solve(jnp.asarray(A), jnp.asarray(b),
                                     pivot=False))
    err_nopiv = np.linalg.norm(x_nopiv - x_true) / np.linalg.norm(x_true)
    assert err_nopiv > 1e-6  # unpivoted growth destroys the solve


class _IllConditionedRom:
    """Minimal stand-in exposing the pieces certify_pivot_free touches."""

    PIVOT_FREE_COND_BOUND = 1e4

    def __init__(self, cond):
        from romtime_tpu.parameters import get_uniform_dist
        from romtime_tpu.rom.rom import RomConstructor

        self._ctor = RomConstructor
        self.grid = {"alpha": get_uniform_dist(min=0.1, max=1.0)}
        N = 8
        self.N = N
        self.basis = np.eye(N)
        d = np.logspace(0, np.log10(cond), N)
        self._K = np.diag(d / d[0])

        class _Dom(dict):
            pass

        class _Fom:
            dt = 0.01
            domain = {"nt": 10}
            NT = "nt"

        self.fom = _Fom()

    def certify(self, **kw):
        return self._ctor.certify_pivot_free(self, **kw)

    def _theta_sources(self):
        K = self._K

        def fb(mu, t):
            return jnp.asarray(K)

        return {"mass": (None, fb), "stiffness": (None, fb)}

    def _system_parts(self, get, mu, t, uh, uh_n1):
        MN = get("mass")
        return MN, self.fom.dt * get("stiffness")

    def _state_representation(self, V, uN):
        return None


def test_certify_refuses_ill_conditioned_family():
    rom = _IllConditionedRom(cond=1e8)
    with pytest.raises(ValueError, match="pivot-free online solve refused"):
        rom.certify()


def test_certify_passes_benign_family():
    rom = _IllConditionedRom(cond=10.0)
    cond = rom.certify()
    assert 1.0 <= cond < 20.0


def test_flagship_family_certifies(tmp_path, monkeypatch):
    """The real piston reduced family sits orders inside the bound —
    the guard costs nothing at the headline configuration."""
    monkeypatch.chdir(tmp_path)
    from romtime_tpu.conventions import PistonParameters
    from romtime_tpu.parameters import get_uniform_dist
    from romtime_tpu.problems import define_piston_problem
    from romtime_tpu.fom.nonlinear import OneDimensionalBurgers
    from romtime_tpu.rom.rom import RomConstructorNonlinear

    nx, nt = 100, 50
    domain, bcs, forcing, u0, Lt, dLt_dt = define_piston_problem(
        L=1.0, nx=nx, tf=1.0, nt=nt
    )
    grid = {
        PistonParameters.A0: get_uniform_dist(min=8.0, max=10.0),
        PistonParameters.OMEGA: get_uniform_dist(min=15.0, max=20.0),
        PistonParameters.DELTA: get_uniform_dist(min=0.1, max=0.15),
        PistonParameters.ALPHA: get_uniform_dist(min=1e-6, max=1e-6),
        PistonParameters.GAMMA: get_uniform_dist(min=1.4, max=1.4),
    }
    fom = OneDimensionalBurgers(
        domain=domain, dirichlet=bcs, forcing_term=forcing, u0=u0,
        Lt=Lt, dLt_dt=dLt_dt,
    )
    fom.setup()
    rom = RomConstructorNonlinear(fom=fom, grid=grid)
    rom.setup(rnd=np.random.RandomState(0))

    space = rom.build_sampling_space(num=2, rnd=np.random.RandomState(0))
    rom.build_reduced_basis(num_snapshots=2, num_basis=10)

    cond = rom.certify_pivot_free()
    assert cond < rom.PIVOT_FREE_COND_BOUND / 1.3
    assert rom._pivot_cert == cond
