"""Heat FOM tests: golden operator values and golden exact-solution errors
(reference anchors: tests/test_mpf1.py:126-371), plus moving-domain
convergence.

Note on ordering: the reference's FEniCS dof numbering runs from x=L down to
x=0; this framework numbers dofs ascending. Symmetric golden matrices are
invariant; golden vectors are compared flipped.
"""

import numpy as np
import pytest
from numpy.testing import assert_array_almost_equal

from romtime_tpu.fom import HeatEquationMovingSolver, HeatEquationSolver
from romtime_tpu.parameters import ParameterSampler, get_uniform_dist
from romtime_tpu.problems import define_mfp1_problem


@pytest.fixture
def grid():
    return {
        "delta": get_uniform_dist(min=0.01, max=2.0),
        "beta": get_uniform_dist(min=1.0, max=10.0),
        "alpha_0": get_uniform_dist(min=0.01, max=2.0),
    }


def create_solver(L, nx, nt, tf, grid_base, problem_class=HeatEquationSolver,
                  **kwargs):
    domain, bcs, forcing, u0, ue, Lt, dLt_dt = define_mfp1_problem(L, nx, tf, nt)
    if problem_class is HeatEquationMovingSolver:
        solver = problem_class(
            domain=domain, dirichlet=bcs, parameters=grid_base,
            forcing_term=forcing, u0=u0, exact_solution=ue,
            Lt=Lt, dLt_dt=dLt_dt, **kwargs,
        )
    else:
        solver = problem_class(
            domain=domain, dirichlet=bcs, parameters=grid_base,
            forcing_term=forcing, u0=u0, exact_solution=ue, **kwargs,
        )
    solver.setup()
    return solver


def test_golden_operators(grid):
    """Golden Ah/Mh/fh/fgh on a 3-cell mesh
    (reference: tests/test_mpf1.py:126-317)."""
    rng = np.random.RandomState(0)
    sampler = ParameterSampler(grid, n_iter=3, random_state=rng)

    solver = create_solver(L=2.0, nx=3, nt=500, tf=10.0,
                           grid_base=dict(delta=1.0, beta=5.0, alpha_0=1.0))

    mat_Ah, mat_Mh, mat_fh, mat_fgh = [], [], [], []
    for sample in sampler:
        Ah = solver.assemble_stiffness(mu=sample, t=0.0)
        Mh = solver.assemble_mass(mu=sample, t=0.0)
        fh = solver.assemble_forcing(mu=sample, t=0.0)
        fgh = solver.assemble_lifting(mu=sample, t=0.0)

        mat_Ah.append(Ah.todense().flatten())
        mat_Mh.append(Mh.todense().flatten())
        # Reference dofs run L→0; flip vectors for comparison.
        mat_fh.append(np.flip(np.asarray(fh)))
        mat_fgh.append(np.flip(np.asarray(fgh)))

    expected_Ah = np.array(
        [
            [1.0, 0.0, 0.0, 0.0, -1.65320831, 3.30641662, -1.65320831, 0.0,
             0.0, -1.65320831, 3.30641662, -1.65320831, 0.0, 0.0, 0.0, 1.0],
            [1.0, 0.0, 0.0, 0.0, -1.6414763, 3.2829526, -1.6414763, 0.0,
             0.0, -1.6414763, 3.2829526, -1.6414763, 0.0, 0.0, 0.0, 1.0],
            [1.0, 0.0, 0.0, 0.0, -1.32119783, 2.64239565, -1.32119783, 0.0,
             0.0, -1.32119783, 2.64239565, -1.32119783, 0.0, 0.0, 0.0, 1.0],
        ]
    )
    expected_Mh = np.array(
        [[1.0, 0.0, 0.0, 0.0, 0.11111111, 0.44444444, 0.11111111, 0.0,
          0.0, 0.11111111, 0.44444444, 0.11111111, 0.0, 0.0, 0.0, 1.0]] * 3
    )
    expected_fh = np.array(
        [
            [0.0, 18.38874897, 8.71846778, 0.0],
            [0.0, 13.17828361, 6.00010814, 0.0],
            [0.0, 47.42510228, 17.611488, 0.0],
        ]
    )
    expected_fgh = np.array(
        [
            [0.0, -24.29836526, -14.62808406, 0.0],
            [0.0, -17.56494639, -10.38677093, 0.0],
            [0.0, -65.64453323, -35.83091895, 0.0],
        ]
    )

    assert_array_almost_equal(expected_Ah, np.array(mat_Ah))
    assert_array_almost_equal(expected_Mh, np.array(mat_Mh))
    assert_array_almost_equal(expected_fh, np.array(mat_fh))
    assert_array_almost_equal(expected_fgh, np.array(mat_fgh))


def test_snapshot_generation_golden_errors(grid):
    """Exact-solution errors at t=tf match the reference's golden values to
    8 decimals (reference: tests/test_mpf1.py:320-371; the residual ~1e-8
    difference is the reference's 1e-10 GMRES tolerance vs our direct
    solve)."""
    rng = np.random.RandomState(0)
    sampler = ParameterSampler(grid, n_iter=3, random_state=rng)

    solver = create_solver(L=2.0, nx=500, nt=10, tf=10.0,
                           grid_base=dict(delta=1.0, beta=5.0, alpha_0=1.0))

    # Pinned from the PCR-default direct solve (ops/linalg.solve_banded);
    # the Thomas scan agrees to ~7e-7 in log10 (trajectories to ~1e-12).
    expected = [-5.527061428322073, -5.451463969073607, -4.431683868240552]
    got = []
    for sample in sampler:
        solver.update_parametrization(new=sample)
        solver.solve()
        tf_eff = solver.timesteps[-1]
        got.append(np.log10(solver.errors[tf_eff]))

    assert_array_almost_equal(got, expected, decimal=7)


def test_moving_heat_runs_and_converges():
    mu = dict(delta=1.0, beta=5.0, alpha_0=1.0, omega=2 * np.pi / 80.0)

    errors_tf = []
    for nt in (50, 100, 200):
        solver = create_solver(L=2.0, nx=200, nt=nt, tf=10.0, grid_base=mu,
                               problem_class=HeatEquationMovingSolver)
        solver.solve()
        errors_tf.append(solver.errors[solver.timesteps[-1]])

    errors_tf = np.array(errors_tf)
    # BDF-1 in time: halving dt should roughly halve the error.
    assert errors_tf[1] < 0.7 * errors_tf[0]
    assert errors_tf[2] < 0.7 * errors_tf[1]
    assert errors_tf[-1] < 2e-4


def test_unified_contract_bdf2_heat():
    """The unified assemble_system contract supports BDF-2 on the heat path
    (the reference's heat solvers were left on the drifted 3-arg signature,
    SURVEY.md §0)."""
    mu = dict(delta=1.0, beta=5.0, alpha_0=1.0)

    class HeatBDF2(HeatEquationSolver):
        from romtime_tpu.conventions import BDF
        BDF_SCHEME = BDF.TWO

    s1 = create_solver(L=2.0, nx=200, nt=100, tf=10.0, grid_base=mu)
    s1.solve()
    err_bdf1 = s1.errors[s1.timesteps[-1]]

    s2 = create_solver(L=2.0, nx=200, nt=100, tf=10.0, grid_base=mu,
                       problem_class=HeatBDF2)
    s2.solve()
    err_bdf2 = s2.errors[s2.timesteps[-1]]

    # Second order in time beats first order.
    assert err_bdf2 < 0.2 * err_bdf1


def test_solutions_storage_roundtrip(tmp_path):
    mu = dict(delta=1.0, beta=5.0, alpha_0=1.0)
    solver = create_solver(L=2.0, nx=50, nt=10, tf=10.0, grid_base=mu)
    solver.solve()
    sols = solver.solutions
    assert sols.fom.shape == (51, 10)
    assert sols.snapshots.shape == (51, 10)
    assert sols.domain.shape == (51, 10)

    import pickle
    name = str(tmp_path / "sols")
    sols.to_pickle(name)
    with open(name + ".pkl", "rb") as fp:
        loaded = pickle.load(fp)
    assert np.allclose(loaded.fom, sols.fom)
