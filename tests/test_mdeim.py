"""MDEIM (matrix) tests — interpolation exactness at reference tolerances
(reference: tests/test_mdeim.py:152-228) and the ALE regression layer
(reference: tests/test_ale.py:128-306)."""

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from romtime_tpu.conventions import OperatorType, RomParameters, Stage
from romtime_tpu.deim import MatrixDiscreteEmpiricalInterpolation
from romtime_tpu.fom import HeatEquationMovingSolver
from romtime_tpu.parameters import ParameterSampler, get_uniform_dist
from romtime_tpu.problems import define_mfp1_problem
from romtime_tpu.rom.base import Reductor
from romtime_tpu.testing import MockSolver

OPERATORS = [OperatorType.STIFFNESS, OperatorType.MASS, OperatorType.CONVECTION]

DIFFUSION = "diffusion"
CONVECTION = "convection"


@pytest.fixture
def grid():
    return {
        "delta": get_uniform_dist(min=0.01, max=2.0),
        "beta": get_uniform_dist(min=1.0, max=10.0),
        "alpha_0": get_uniform_dist(min=0.01, max=2.0),
    }


@pytest.fixture
def solver():
    domain = {"L0": 1.0, "nx": 100, "T": 5.0, "nt": 100}
    solver = MockSolver(domain=domain, dirichlet=None, forcing_term=None)
    solver.setup()
    return solver


def _assemble_for(solver, operator):
    return {
        OperatorType.STIFFNESS: solver.assemble_stiffness,
        OperatorType.MASS: solver.assemble_mass,
        OperatorType.CONVECTION: solver.assemble_convection,
    }[operator]


@pytest.mark.parametrize("operator", OPERATORS)
def test_mdeim_tree_walk(solver, grid, operator):
    assemble_fom = _assemble_for(solver, operator)

    ts = np.linspace(0, 5.0, 20)
    tree_walk = {"ts": ts, "num_snapshots": 50}

    mdeim = MatrixDiscreteEmpiricalInterpolation(
        name=operator, assemble=assemble_fom,
        tree_walk_params=tree_walk, grid=grid,
    )

    rnd = np.random.RandomState(0)
    mdeim.setup(rnd=rnd)
    mdeim.run()

    # Train parameter
    mu = mdeim.mu_space[Stage.OFFLINE][0]
    expected = np.asarray(assemble_fom(mu=mu, t=1.0).gather(mdeim.rows, mdeim.cols))
    approximation = np.asarray(
        mdeim.interpolate(mu=mu, t=1.0).gather(mdeim.rows, mdeim.cols)
    )
    assert_allclose(expected, approximation)

    # Unseen parameter
    rng = np.random.RandomState(19219)
    test_mu = list(ParameterSampler(grid, n_iter=50, random_state=rng))[0]
    expected = np.asarray(
        assemble_fom(mu=test_mu, t=1.0).gather(mdeim.rows, mdeim.cols)
    )
    approximation = np.asarray(
        mdeim.interpolate(mu=test_mu, t=1.0).gather(mdeim.rows, mdeim.cols)
    )
    assert_allclose(expected, approximation)

    mdeim.evaluate(num=20, ts=ts)
    errors = np.concatenate(
        [np.atleast_1d(v) for v in mdeim.errors_rom.values() if np.size(v)]
    )
    assert errors.mean() < 1e-12


@pytest.mark.parametrize("operator", OPERATORS)
def test_interpolation_dense_matrix(solver, grid, operator):
    """Dense FOM interpolation equals the assembled operator
    (reference: tests/test_mdeim.py:98-149)."""
    assemble_fom = _assemble_for(solver, operator)

    ts = np.linspace(0, 5.0, 20)
    mdeim = MatrixDiscreteEmpiricalInterpolation(
        name=operator, assemble=assemble_fom,
        tree_walk_params={"ts": ts, "num_snapshots": 50}, grid=grid,
    )
    mdeim.setup(rnd=np.random.RandomState(0))
    mdeim.run()

    mu = list(ParameterSampler(grid, 50, np.random.RandomState(0)))[0]
    expected = assemble_fom(mu=mu, t=0.5).todense()
    interpolated = mdeim.interpolate(mu=mu, t=0.5, which=OperatorType.FOM).todense()
    assert_allclose(expected, interpolated, atol=1e-12)


def test_mdeim_rom_projection(solver, grid):
    """ROM-space interpolation equals VᵀA(μ,t)V."""
    assemble_fom = solver.assemble_mass
    ts = np.linspace(0, 5.0, 10)
    mdeim = MatrixDiscreteEmpiricalInterpolation(
        name="Mass", assemble=assemble_fom,
        tree_walk_params={"ts": ts, "num_snapshots": 10}, grid=grid,
    )
    mdeim.setup(rnd=np.random.RandomState(0))
    mdeim.run()

    rng = np.random.default_rng(1)
    V = np.linalg.qr(rng.normal(size=(solver.mesh.nh, 6)))[0]
    mdeim.project_basis(V)

    mu = mdeim.mu_space[Stage.OFFLINE][0]
    AN = mdeim.interpolate(mu=mu, t=2.0, which=mdeim.ROM)
    Ah = assemble_fom(mu=mu, t=2.0).todense()
    # MDEIM training zeroes the Dirichlet identity diagonals (they carry no
    # μ-dependence; reference: deim/deim.py:387-389), so the projected
    # operator matches Vᵀ(A − D)V with D the Dirichlet-diagonal part.
    D = np.zeros_like(Ah)
    for d in solver.dirichlet_dofs:
        D[d, d] = Ah[d, d]
    assert_allclose(AN, V.T @ (Ah - D) @ V, atol=1e-13)


# ---------------------------------------------------------------------------
# ALE regression layer (reference: tests/test_ale.py)
# ---------------------------------------------------------------------------
class MockSolverALE(HeatEquationMovingSolver):
    """Isolates single ALE stiffness terms via a ``which`` switch
    (reference: tests/test_ale.py:18-124)."""

    def __init__(self, *args, which=None, **kwargs):
        self.WHICH = which
        super().__init__(*args, **kwargs)

    def assemble_stiffness(self, mu, t, entries=None):
        w = self.compute_mesh_velocity(mu=mu, t=t)
        alpha = self.create_diffusion_coefficient(mu)

        if self.WHICH == DIFFUSION:
            terms = [(1, 1, lambda x: alpha * jnp.ones_like(x))]
        elif self.WHICH == CONVECTION:
            terms = [(1, 0, lambda x: -w(x))]
        else:
            terms = [
                (1, 0, lambda x: -w(x)),
                (1, 1, lambda x: alpha * jnp.ones_like(x)),
            ]
        return self._assemble_matrix(terms, mu, t, entries)


@pytest.mark.parametrize("which", [CONVECTION, DIFFUSION])
def test_mdeim_ale_stiffness(which):
    """MDEIM online errors on single-term ALE operators stay at the
    reference magnitudes: ~1e-18 (convection), ~1e-11 (diffusion)
    (reference: tests/test_ale.py:199-304)."""
    domain = dict(L0=2.0, nx=500, nt=250, T=10.0)

    n_min, n_max = 0.5, 0.8
    tf = domain["T"]
    omegas = [(1.0 / tf) * np.arcsin(1.0 - n) for n in (n_min, n_max)]

    grid = {
        "delta": get_uniform_dist(min=0.01, max=5.0),
        "beta": get_uniform_dist(min=0.05, max=0.1),
        "alpha_0": get_uniform_dist(min=0.01, max=2.0),
        "omega": get_uniform_dist(min=min(omegas), max=max(omegas)),
    }

    _, bcs, forcing_term, u0, ue, Lt, dLt_dt = define_mfp1_problem()

    fom = MockSolverALE(
        domain=domain,
        dirichlet=bcs,
        parameters=None,
        forcing_term=forcing_term,
        u0=u0,
        Lt=Lt,
        dLt_dt=dLt_dt,
        which=which,
    )
    fom.setup()

    nt = domain["nt"]
    ts = np.linspace(tf / nt, tf, nt)

    mdeim_params = {
        RomParameters.TS: ts,
        RomParameters.NUM_SNAPSHOTS: None,
        RomParameters.NUM_MU: 2,
        RomParameters.NUM_TIME: 2,
    }

    mdeim = MatrixDiscreteEmpiricalInterpolation(
        assemble=fom.assemble_stiffness,
        name="Stiffness (ALE)",
        grid=grid,
        tree_walk_params=mdeim_params,
    )

    reductor = Reductor(grid=grid)
    rnd = np.random.RandomState(0)
    mu_space = list(reductor.build_sampling_space(num=10, rnd=rnd))

    mdeim.setup(rnd=rnd)
    mdeim.run(mu_space=mu_space)
    mdeim.evaluate(ts, mu_space=mu_space)
    mdeim.create_errors_summary()

    result = mdeim.summary_errors
    assert result.shape == (10, 4)

    # Reference-strength magnitudes (tests/test_ale.py:199-304 pins mean
    # ≈ 2.9–6.8e-18 convection, 0.67–2.7e-11 diffusion; measured here:
    # 2.3–5.0e-18 and 4.8e-13–1.8e-11).
    threshold = 1e-17 if which == CONVECTION else 3e-11
    assert (result["mean"] < threshold).all(), result["mean"].max()
    assert (result["max"] < 10 * threshold).all(), result["max"].max()
