"""DEIM (vector) tests — interpolation exactness on train AND unseen μ at
the reference tolerances (reference: tests/test_deim.py:165-213,
atol=1e-15)."""

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from romtime_tpu.conventions import Stage
from romtime_tpu.deim import DiscreteEmpiricalInterpolation
from romtime_tpu.parameters import ParameterSampler, get_uniform_dist
from romtime_tpu.testing import MockSolver


@pytest.fixture
def problem_definition():
    domain = {"L0": 1.0, "nx": 100, "T": 5.0, "nt": 100}

    def forcing_term(x, t, beta=None, delta=None, alpha_0=None, **mu):
        decay = jnp.exp(-beta * t)
        return beta * decay * (1.0 + delta * delta * x * x) - (
            2.0 * delta * delta * alpha_0 * (1.0 - decay)
        )

    return domain, None, forcing_term


@pytest.fixture
def grid():
    return {
        "delta": get_uniform_dist(min=0.01, max=2.0),
        "beta": get_uniform_dist(min=1.0, max=10.0),
        "alpha_0": get_uniform_dist(min=0.01, max=2.0),
    }


def test_deim_tree_walk(problem_definition, grid):
    domain, dirichlet, forcing_term = problem_definition

    solver = MockSolver(domain=domain, dirichlet=dirichlet,
                        forcing_term=forcing_term)
    solver.setup()

    ts = np.linspace(0, 5.0, 20)
    tree_walk = {"ts": ts, "num_snapshots": 50}
    fh_deim = DiscreteEmpiricalInterpolation(
        name="forcing", assemble=solver.assemble_forcing,
        tree_walk_params=tree_walk, grid=grid,
    )

    rnd = np.random.RandomState(0)
    fh_deim.setup(rnd=rnd)
    fh_deim.run()

    # Train parameter
    mu = fh_deim.mu_space[Stage.OFFLINE][0]
    approximation = fh_deim._interpolate(mu=mu, t=1.0)
    expected = np.asarray(solver.assemble_forcing(mu=mu, t=1.0))
    assert_allclose(expected, approximation, atol=1e-15)

    # Unseen parameter
    rng = np.random.RandomState(19219)
    test_mu = list(ParameterSampler(grid, n_iter=50, random_state=rng))[0]
    expected = np.asarray(solver.assemble_forcing(mu=test_mu, t=0.5))
    approximation = fh_deim._interpolate(mu=test_mu, t=0.5)
    assert_allclose(expected, approximation, atol=1e-15)

    # Online error sweep
    fh_deim.evaluate(num=20, ts=tree_walk["ts"])
    errors = np.concatenate(
        [np.atleast_1d(v) for v in fh_deim.errors_rom.values() if np.size(v)]
    )
    assert errors.mean() < 1e-15

    fh_deim.create_errors_summary()
    assert fh_deim.summary_errors.shape[1] == 4


def test_deim_batch_matches_serial(problem_definition, grid):
    domain, dirichlet, forcing_term = problem_definition
    solver = MockSolver(domain=domain, dirichlet=dirichlet,
                        forcing_term=forcing_term)
    solver.setup()

    mu = list(ParameterSampler(grid, 1, np.random.RandomState(3)))[0]
    ts = np.linspace(0.5, 5.0, 7)

    deim = DiscreteEmpiricalInterpolation(
        name="forcing", assemble=solver.assemble_forcing,
        tree_walk_params={"ts": ts, "num_snapshots": 5}, grid=grid,
    )
    deim.setup(rnd=np.random.RandomState(0))

    batch = deim.assemble_snapshots_batch(mu, ts)
    for i, t in enumerate(ts):
        serial = np.asarray(solver.assemble_forcing(mu=mu, t=float(t)))
        assert_allclose(batch[:, i], serial, atol=1e-15)


def test_deim_copy_and_persistence(problem_definition, grid, tmp_path):
    domain, dirichlet, forcing_term = problem_definition
    solver = MockSolver(domain=domain, dirichlet=dirichlet,
                        forcing_term=forcing_term)
    solver.setup()

    ts = np.linspace(0, 5.0, 10)
    deim = DiscreteEmpiricalInterpolation(
        name="forcing", assemble=solver.assemble_forcing,
        tree_walk_params={"ts": ts, "num_snapshots": 10}, grid=grid,
    )
    deim.setup(rnd=np.random.RandomState(0))
    deim.run()

    # copy carries the trained state
    other = deim.copy()
    assert np.allclose(other.basis_fom, deim.basis_fom)
    assert other.dofs == deim.dofs

    # dump/load roundtrip rebuilds the interpolation mesh
    path = str(tmp_path / "basis.pkl")
    deim.dump_fom_basis(path=path)

    fresh = DiscreteEmpiricalInterpolation(
        name="forcing", assemble=solver.assemble_forcing,
        tree_walk_params={"ts": ts, "num_snapshots": 10}, grid=grid,
    )
    fresh.setup(rnd=np.random.RandomState(0))
    from romtime_tpu.utils import read_pickle

    fresh.load_fom_basis(basis=read_pickle(path))
    mu = deim.mu_space[Stage.OFFLINE][0]
    assert_allclose(
        fresh._interpolate(mu=mu, t=1.0), deim._interpolate(mu=mu, t=1.0),
        atol=1e-15,
    )

    # projection onto a solution basis
    rng = np.random.default_rng(0)
    V = np.linalg.qr(rng.normal(size=(solver.mesh.nh, 5)))[0]
    deim.project_basis(V)
    assert deim.basis_rom.shape == (5, deim.N)


def test_deim_weighted_tree_walk(problem_definition, grid):
    """RomParameters.WEIGHTED_POD keeps the sigma-weighted per-mu stacks
    unnormalized at the mu-combination stage, so a dominant-energy branch
    wins the leading modes under truncation. Extension beyond the
    reference (which always re-normalizes, deim/deim.py:306-311); the
    untruncated weighted basis must still interpolate exactly."""
    domain, dirichlet, forcing_term = problem_definition
    solver = MockSolver(domain=domain, dirichlet=dirichlet,
                        forcing_term=forcing_term)
    solver.setup()

    ts = np.linspace(0.0, 5.0, 20)
    # Two branches with a large operator-energy gap: the forcing for
    # mu_big is O(10) while mu_small is O(1e-2).
    mu_small = {"delta": 0.01, "beta": 1.0, "alpha_0": 0.01}
    mu_big = {"delta": 2.0, "beta": 9.0, "alpha_0": 2.0}
    mu_space = [mu_small, mu_big]

    def build(weighted, num_mu=None):
        params = {"ts": ts}
        if weighted:
            params["weighted_pod"] = True
        if num_mu is not None:
            params["num_mu"] = num_mu
        deim = DiscreteEmpiricalInterpolation(
            name="forcing", assemble=solver.assemble_forcing,
            tree_walk_params=params, grid=grid,
        )
        deim.setup(rnd=np.random.RandomState(0))
        deim.run(mu_space=mu_space)
        return deim

    # Truncated to ONE mode across mu: the weighted basis must sit on the
    # dominant branch's own rank-1 optimum; the unit-normalized basis
    # gives the low-energy branch equal say and lands strictly above it.
    f_big = np.asarray(solver.assemble_forcing(mu=mu_big, t=0.0))

    def proj_err(deim):
        V = deim.basis_fom[:, :1]
        rec = V @ (V.T @ f_big)
        return np.linalg.norm(rec - f_big) / np.linalg.norm(f_big)

    snaps_big = np.stack(
        [np.asarray(solver.assemble_forcing(mu=mu_big, t=float(t)))
         for t in ts], axis=1,
    )
    U1 = np.linalg.svd(snaps_big, full_matrices=False)[0][:, :1]
    rec = U1 @ (U1.T @ f_big)
    floor_r1 = np.linalg.norm(rec - f_big) / np.linalg.norm(f_big)

    err_plain = proj_err(build(weighted=False, num_mu=1))
    err_weighted = proj_err(build(weighted=True, num_mu=1))
    assert err_weighted < err_plain
    assert err_weighted < 1.01 * floor_r1

    # Untruncated weighted basis: interpolation exactness is unaffected
    # (orth returns an orthonormal basis of the same span).
    deim_w = build(weighted=True)
    for mu in mu_space:
        approx = deim_w._interpolate(mu=mu, t=0.7)
        expected = np.asarray(solver.assemble_forcing(mu=mu, t=0.7))
        assert_allclose(expected, approx, atol=1e-13)
