"""N-MDEIM tests: state-dependent trilinear operator interpolation
(reference: src/romtime/deim/nonlinear.py, exercised in the reference only
through the piston pipeline)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from romtime_tpu.conventions import PistonParameters, RomParameters, Stage
from romtime_tpu.deim.nonlinear import MatrixDiscreteEmpiricalInterpolationNonlinear
from romtime_tpu.fom import OneDimensionalBurgers
from romtime_tpu.parameters import get_uniform_dist
from romtime_tpu.problems import define_piston_problem


@pytest.fixture
def grid():
    return {
        PistonParameters.A0: get_uniform_dist(min=8.0, max=10.0),
        PistonParameters.OMEGA: get_uniform_dist(min=15.0, max=20.0),
        PistonParameters.DELTA: get_uniform_dist(min=0.1, max=0.15),
        PistonParameters.ALPHA: get_uniform_dist(min=1e-6, max=1e-6),
        PistonParameters.GAMMA: get_uniform_dist(min=1.4, max=1.4),
    }


@pytest.fixture
def fom():
    domain, bcs, forcing, u0, Lt, dLt_dt = define_piston_problem(
        L=1.0, nx=100, tf=1.0, nt=100
    )
    solver = OneDimensionalBurgers(
        domain=domain, dirichlet=bcs,
        parameters=dict(a0=10.0, omega=18.0, alpha=1e-6, delta=0.12, gamma=1.4),
        forcing_term=forcing, u0=u0, Lt=Lt, dLt_dt=dLt_dt,
    )
    solver.setup()
    return solver


@pytest.fixture
def psi_basis(fom):
    """A small smooth state basis standing in for the reduced basis."""
    x = np.asarray(fom.mesh.x_dofs)
    cols = [np.sin((k + 1) * np.pi * x) * 0.1 for k in range(3)]
    return np.array(cols).T  # (Nh, 3)


def test_nmdeim_run_and_interpolate(fom, grid, psi_basis):
    ts = np.linspace(0.1, 1.0, 10)
    params = {RomParameters.TS: ts, RomParameters.NUM_SNAPSHOTS: 3}

    nmdeim = MatrixDiscreteEmpiricalInterpolationNonlinear(
        name="trilinear", assemble=fom.assemble_trilinear,
        grid=grid, tree_walk_params=params,
    )
    nmdeim.setup(rnd=np.random.RandomState(0))
    nmdeim.run(u_n=psi_basis)

    assert nmdeim.N > 0

    # Interpolation accuracy on a trained μ and ψ
    mu = nmdeim.mu_space[Stage.OFFLINE][0]
    psi = psi_basis[:, 0]
    truth = np.asarray(
        fom.assemble_trilinear(mu=mu, t=0.5, u_n=psi).gather(
            nmdeim.rows, nmdeim.cols
        )
    )
    appr = np.asarray(
        nmdeim.interpolate(mu=mu, t=0.5, u_n=psi).gather(nmdeim.rows, nmdeim.cols)
    )
    scale = np.abs(truth).max()
    assert np.abs(truth - appr).max() < 1e-8 * max(scale, 1.0)

    # Linearity in the state is preserved exactly by interpolation
    combo = 0.5 * psi_basis[:, 0] + 0.25 * psi_basis[:, 1]
    truth = np.asarray(
        fom.assemble_trilinear(mu=mu, t=0.5, u_n=combo).gather(
            nmdeim.rows, nmdeim.cols
        )
    )
    appr = np.asarray(
        nmdeim.interpolate(mu=mu, t=0.5, u_n=combo).gather(
            nmdeim.rows, nmdeim.cols
        )
    )
    assert np.abs(truth - appr).max() < 1e-8 * max(scale, 1.0)


def test_nmdeim_truncate(fom, grid, psi_basis):
    ts = np.linspace(0.1, 1.0, 8)
    params = {RomParameters.TS: ts, RomParameters.NUM_SNAPSHOTS: 2}

    nmdeim = MatrixDiscreteEmpiricalInterpolationNonlinear(
        name="trilinear", assemble=fom.assemble_trilinear,
        grid=grid, tree_walk_params=params,
    )
    nmdeim.setup(rnd=np.random.RandomState(0))
    nmdeim.run(u_n=psi_basis)

    N = nmdeim.N
    if N < 2:
        pytest.skip("Basis too small to truncate.")
    truncated = nmdeim.truncate(n=1)
    assert truncated.N == N - 1
    assert truncated.name.startswith("S-")
    assert truncated.rows is nmdeim.rows

    # The truncated object still interpolates
    mu = nmdeim.mu_space[Stage.OFFLINE][0]
    op = truncated.interpolate(mu=mu, t=0.5, u_n=psi_basis[:, 0])
    assert op.todense().shape == (fom.mesh.nh, fom.mesh.nh)


def test_nmdeim_projection_shape(fom, grid, psi_basis):
    ts = np.linspace(0.1, 1.0, 6)
    params = {RomParameters.TS: ts, RomParameters.NUM_SNAPSHOTS: 2}

    nmdeim = MatrixDiscreteEmpiricalInterpolationNonlinear(
        name="trilinear", assemble=fom.assemble_trilinear,
        grid=grid, tree_walk_params=params,
    )
    nmdeim.setup(rnd=np.random.RandomState(0))
    nmdeim.run(u_n=psi_basis)

    rng = np.random.default_rng(0)
    V = np.linalg.qr(rng.normal(size=(fom.mesh.nh, 4)))[0]
    nmdeim.project_basis(V)
    assert nmdeim.basis_rom.shape == (16, nmdeim.N)

    mu = nmdeim.mu_space[Stage.OFFLINE][0]
    AN = nmdeim.interpolate(mu=mu, t=0.5, u_n=psi_basis[:, 0], which=nmdeim.ROM)
    assert AN.shape == (4, 4)

    # Online evaluation sweep over (μ, t, ψ)
    nmdeim.evaluate(ts=ts, mu_space=nmdeim.mu_space[Stage.OFFLINE])
    errs = np.concatenate(
        [np.atleast_1d(v) for v in nmdeim.errors_rom.values() if np.size(v)]
    )
    assert np.all(np.isfinite(errs))
