"""Native C++ host kernels equal the numpy reference implementations."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from romtime_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("Native toolchain unavailable.")
    return lib


def _numpy_greedy(Vf, forbidden=()):
    """The pure-numpy greedy (duplicated here as the independent oracle)."""
    Vf = np.asarray(Vf)
    Nh, Ns = Vf.shape
    banned = np.zeros(Nh, dtype=bool)
    if len(forbidden):
        banned[np.asarray(forbidden, dtype=int)] = True

    def argmax(v):
        vv = np.where(banned, -np.inf, np.abs(v).ravel())
        return int(np.argmax(vv))

    dofs = [argmax(Vf[:, 0])]
    for j in range(1, Ns):
        M = Vf[dofs, :j]
        rhs = Vf[dofs, j]
        coeff = np.linalg.solve(M, rhs)
        residual = Vf[:, j] - Vf[:, :j] @ coeff
        dofs.append(argmax(residual))
    return dofs


def test_greedy_matches_numpy(lib):
    rng = np.random.default_rng(0)
    # Smooth decaying basis, like POD output
    x = np.linspace(0, 1, 200)
    Vf = np.array([np.sin((k + 1) * np.pi * x) / (k + 1) for k in range(8)]).T
    Vf += 1e-3 * rng.normal(size=Vf.shape)

    dofs_native = native.deim_greedy(Vf, forbidden=(0, 199))
    dofs_numpy = _numpy_greedy(Vf, forbidden=(0, 199))
    assert dofs_native == dofs_numpy


def test_greedy_respects_forbidden(lib):
    rng = np.random.default_rng(1)
    Vf = rng.normal(size=(50, 5))
    forbidden = (0, 1, 2, 49)
    dofs = native.deim_greedy(Vf, forbidden=forbidden)
    assert not set(dofs) & set(forbidden)


def test_thomas_matches_dense(lib):
    rng = np.random.default_rng(2)
    n = 64
    diag = 4.0 + rng.random(n)
    lower = rng.random(n)
    upper = rng.random(n)
    lower[0] = upper[-1] = 0.0
    rhs = rng.normal(size=n)

    A = np.diag(diag) + np.diag(lower[1:], -1) + np.diag(upper[:-1], 1)
    x_native = native.thomas_solve(lower, diag, upper, rhs)
    x_dense = np.linalg.solve(A, rhs)
    assert_allclose(x_native, x_dense, atol=1e-12)


def test_deim_pipeline_uses_native(lib):
    """The DEIM offline path goes through the native selector and stays
    exact (duplicates the interpolation-exactness check end-to-end)."""
    import jax.numpy as jnp

    from romtime_tpu.deim import DiscreteEmpiricalInterpolation
    from romtime_tpu.parameters import get_uniform_dist
    from romtime_tpu.testing import MockSolver
    from romtime_tpu.conventions import Stage

    domain = {"L0": 1.0, "nx": 60, "T": 5.0, "nt": 50}

    def forcing(x, t, beta=None, delta=None, alpha_0=None, **mu):
        decay = jnp.exp(-beta * t)
        return beta * decay * (1.0 + delta * delta * x * x)

    grid = {
        "delta": get_uniform_dist(min=0.01, max=2.0),
        "beta": get_uniform_dist(min=1.0, max=10.0),
        "alpha_0": get_uniform_dist(min=0.01, max=2.0),
    }
    solver = MockSolver(domain=domain, dirichlet=None, forcing_term=forcing)
    solver.setup()

    deim = DiscreteEmpiricalInterpolation(
        name="forcing", assemble=solver.assemble_forcing,
        tree_walk_params={"ts": np.linspace(0, 5, 10), "num_snapshots": 10},
        grid=grid,
    )
    deim.setup(rnd=np.random.RandomState(0))
    deim.run()

    mu = deim.mu_space[Stage.OFFLINE][0]
    expected = np.asarray(solver.assemble_forcing(mu=mu, t=1.0))
    approx = deim._interpolate(mu=mu, t=1.0)
    assert_allclose(expected, approx, atol=1e-14)
