"""Piston/Burgers FOM tests (reference: tests/fom/test_piston.py — its
golden CSV/pickle fixtures live in an unavailable submodule, so physical
invariants and self-generated regressions certify the path instead)."""

import numpy as np
import pytest

from romtime_tpu.conventions import PistonParameters
from romtime_tpu.fom import OneDimensionalBurgers
from romtime_tpu.problems import define_piston_problem


@pytest.fixture
def mu():
    return dict(a0=10.0, omega=25.0, alpha=1e-6, delta=0.1, gamma=1.4)


def create_solver(L, nx, nt, tf, grid_base, which="rest"):
    domain, bcs, forcing, u0, Lt, dLt_dt = define_piston_problem(
        L, nx, tf, nt, which=which
    )
    solver = OneDimensionalBurgers(
        domain=domain,
        dirichlet=bcs,
        parameters=grid_base,
        forcing_term=forcing,
        degrees=1,
        u0=u0,
        exact_solution=None,
        Lt=Lt,
        dLt_dt=dLt_dt,
    )
    solver.setup()
    return solver


@pytest.fixture
def solved(mu):
    solver = create_solver(L=1.0, nx=400, nt=600, tf=1.0, grid_base=mu)
    solver.solve()
    return solver


def test_fom_solves_and_is_bounded(solved, mu):
    sols = solved.solutions
    assert sols.fom.shape == (401, 600)
    # The response amplitude is set by the piston Mach number δω/a0.
    mach = solved.system_forcing
    assert np.isclose(mach, 0.25)
    assert np.abs(sols.fom).max() < 2.0 * mach
    assert np.abs(sols.fom).max() > 0.5 * mach


def test_piston_probe_tracks_dirichlet(solved, mu):
    """The piston probe equals the imposed boundary velocity."""
    ts = solved.timesteps
    bL = -mu["delta"] * (mu["omega"] / mu["a0"]) * np.sin(mu["omega"] * ts)
    piston = np.array(solved.probes[2])
    assert np.allclose(piston, bL, atol=1e-12)


def test_mass_conservation(solved, mu):
    """d/dt ∫ρ dx balances the boundary flux (reference:
    fom/nonlinear.py:627-683)."""
    sols = solved.solutions
    mc = solved.compute_mass_conservation(
        mu=mu, ts=sols.ts, solutions=sols.fom.T, which="fom"
    )
    scale = np.median(np.abs(mc["mass_change"]))
    residual = np.abs(mc["mass_change"] - mc["outflow"])
    assert np.median(residual) < 2e-3 * max(scale, 1.0)
    # Mass tracks the geometric compression range [1-2δ, 1]
    assert mc["mass"].max() <= 1.0 + 1e-3
    assert mc["mass"].min() >= 1.0 - 2 * mu["delta"] - 1e-2


def test_nonlinear_snapshots_captured(solved):
    snaps = solved.nonlinear_snapshots
    assert len(snaps) == 600
    # Initial condition is zero → first snapshot vanishes except for the
    # Dirichlet diagonal entry (reference drops it at rom/rom.py:345).
    assert np.allclose(snaps[0][:-1], 0.0)
    assert np.isclose(snaps[0][-1], 1.0)
    assert np.linalg.norm(snaps[-1]) > 0.0


def test_nonlinearity_measure(solved):
    u_p, eta = solved.nonlinearity
    assert np.isclose(u_p, 0.25)
    assert 0.0 < eta <= 1.5


def test_save_probes(solved, tmp_path):
    df = solved.save_probes(name=str(tmp_path / "probes.csv"))
    assert list(df.columns) == [0.0, 0.5, "L"]
    # Physical units: scaled by a0.
    assert np.abs(df["L"]).max() <= 0.25 * 10.0 + 1e-9


def test_sudden_start_regime(mu):
    solver = create_solver(L=1.0, nx=100, nt=100, tf=0.5, grid_base=mu,
                           which="sudden")
    solver.solve()
    # The sudden start carries inconsistent initial data at the Dirichlet
    # node (u0 - g0 = +δω/a0 there), which the BDF identity-row recurrence
    # preserves — a reference quirk reproduced faithfully. The solve must
    # stay bounded and the interior response must track the forcing scale.
    sols = solver.solutions
    assert np.all(np.isfinite(sols.fom))
    mach = solver.system_forcing
    assert np.abs(sols.fom[: sols.fom.shape[0] // 2]).max() < 4.0 * mach


def test_compute_at_physical_units(solved, mu):
    points = solved.solutions.compute_at(x=0.0)
    assert points.shape == (600,)
    assert np.abs(points).max() <= mu["a0"] * 0.5
    # compute_at scales by a0; the raw outflow dof is fom[0, :]
    assert np.allclose(points, solved.solutions.fom[0, :] * mu["a0"])


def test_isentropic_relations():
    gamma = 1.4
    u = np.linspace(-0.3, 0.3, 7)
    rho = OneDimensionalBurgers.compute_rho(u, gamma)
    p = OneDimensionalBurgers.compute_p(u, gamma)
    assert np.allclose(p, rho**gamma)
    assert np.isclose(OneDimensionalBurgers.compute_rho(0.0, gamma), 1.0)
