"""Topology-driven Dirichlet detection (reference: fom/base.py:320-348).

The BC layout is derived from the problem's Dirichlet data dict and the
(M)DEIM masks are detected from assembled operator topology — so a
non-default layout (left-only Dirichlet, the piston's right-only end)
passes the local≡global and MDEIM-exactness pyramid without any
hardcoded endpoint convention.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from romtime_tpu.conventions import OperatorType
from romtime_tpu.deim import MatrixDiscreteEmpiricalInterpolation
from romtime_tpu.parameters import ParameterSampler, get_uniform_dist
from romtime_tpu.testing import MockSolver

DOMAIN = {"L0": 1.0, "nx": 60, "T": 5.0, "nt": 100}


@pytest.fixture
def grid():
    return {
        "delta": get_uniform_dist(min=0.01, max=2.0),
        "beta": get_uniform_dist(min=1.0, max=10.0),
        "alpha_0": get_uniform_dist(min=0.01, max=2.0),
    }


def make_solver(dirichlet):
    solver = MockSolver(domain=DOMAIN, dirichlet=dirichlet)
    solver.setup()
    return solver


def test_default_layout_is_both_ends():
    solver = make_solver(None)
    nh = solver.mesh.nh
    assert solver.dirichlet_dofs == (0, nh - 1)
    assert sorted(solver.entries_dirichlet) == [(0, 0), (nh - 1, nh - 1)]
    assert sorted(solver.dofs_dirichlet) == [(0,), (nh - 1,)]


def test_left_only_layout_detected():
    solver = make_solver({"b0": 0.0, "db0_dt": 0.0})
    assert solver.dirichlet_dofs == (0,)
    assert solver.entries_dirichlet == [(0, 0)]
    assert solver.dofs_dirichlet == [(0,)]


def test_right_only_layout_detected():
    solver = make_solver({"bL": 0.0, "dbL_dt": 0.0})
    nh = solver.mesh.nh
    assert solver.dirichlet_dofs == (nh - 1,)
    assert solver.entries_dirichlet == [(nh - 1, nh - 1)]


def test_piston_layout_needs_no_override():
    """The Burgers/piston right-only convention flows from its BC dict
    (reference: nonlinear.py:241-262 hand-overrides this)."""
    from romtime_tpu.problems import define_piston_problem
    from romtime_tpu.fom.nonlinear import OneDimensionalBurgers

    domain, bcs, forcing, u0, Lt, dLt_dt = define_piston_problem(
        L=1.0, nx=40, tf=1.0, nt=10
    )
    fom = OneDimensionalBurgers(
        domain=domain, dirichlet=bcs, forcing_term=forcing, u0=u0,
        Lt=Lt, dLt_dt=dLt_dt,
    )
    fom.setup()
    assert fom.dirichlet_dofs == (fom.mesh.nh - 1,)
    assert fom.entries_dirichlet == [(fom.mesh.nh - 1, fom.mesh.nh - 1)]


@pytest.mark.parametrize("dirichlet", [
    {"b0": 0.0, "db0_dt": 0.0},
    {"bL": 0.0, "dbL_dt": 0.0},
    None,
])
def test_local_equals_global(dirichlet, grid):
    """Gathered entry assembly ≡ the banded global operator at boundary
    and interior entries, for every BC layout."""
    solver = make_solver(dirichlet)
    nh = solver.mesh.nh
    mu = list(ParameterSampler(grid, 1, np.random.RandomState(0)))[0]

    entries = [(0, 0), (0, 1), (5, 6), (nh // 2, nh // 2),
               (nh - 1, nh - 2), (nh - 1, nh - 1)]
    for assemble in (solver.assemble_stiffness, solver.assemble_convection):
        dense = np.asarray(assemble(mu=mu, t=0.7).todense())
        local = np.asarray(assemble(mu=mu, t=0.7, entries=entries))
        expected = np.array([dense[r, c] for r, c in entries])
        assert_allclose(local, expected, atol=1e-14)


@pytest.mark.parametrize("dirichlet", [
    {"b0": 0.0, "db0_dt": 0.0},
    {"bL": 0.0, "dbL_dt": 0.0},
])
def test_mdeim_exactness_nondefault_layout(dirichlet, grid):
    """MDEIM interpolation is exact for one-sided Dirichlet layouts —
    the detection-driven masks feed the training/interpolation pyramid
    (analog of the default-layout exactness test, tests/test_mdeim.py)."""
    solver = make_solver(dirichlet)
    ts = np.linspace(0, 5.0, 20)
    mdeim = MatrixDiscreteEmpiricalInterpolation(
        name=OperatorType.STIFFNESS, assemble=solver.assemble_stiffness,
        tree_walk_params={"ts": ts, "num_snapshots": 20}, grid=grid,
    )
    mdeim.setup(rnd=np.random.RandomState(0))
    mdeim.run()

    mu = list(ParameterSampler(grid, 3, np.random.RandomState(1)))[-1]
    expected = np.asarray(solver.assemble_stiffness(mu=mu, t=0.5).todense())
    got = np.asarray(
        mdeim.interpolate(mu=mu, t=0.5, which=OperatorType.FOM).todense()
    )
    assert_allclose(got, expected, atol=1e-12)
