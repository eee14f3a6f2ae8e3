"""Kernel-exactness level of the test pyramid (SURVEY.md §4):

1. Golden P1 operators on a 3-cell mesh (values transcribed from the
   reference's inline goldens, tests/test_mpf1.py:170-317 and
   tests/test_moving_mesh.py:134-144).
2. Local (per-entry, DEIM-path) assembly ≡ global assembly for degrees 1–5
   and all operator types (reference: tests/test_deim.py:60-108,
   tests/test_mdeim.py:61-95).
3. Banded direct solves against dense references.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_almost_equal

from romtime_tpu.ops import (
    Mesh1D,
    apply_dirichlet_band,
    apply_dirichlet_vector,
    assemble_bilinear_band,
    assemble_bilinear_entries,
    assemble_linear_entries,
    assemble_linear_vector,
    band_matvec,
    band_to_dense,
    eval_function_at,
    interpolate_dofs,
    norm_L2,
    solve_banded,
    tridiag_solve,
)
from romtime_tpu.ops.assembly import band_nonzero_entries, band_matmat

DEGREES = [1, 2, 3, 4, 5]


def _ones_coeff(mesh, value=1.0):
    Q = len(mesh.tables.quad_points)
    return value * jnp.ones((mesh.ne, Q))


# ---------------------------------------------------------------------------
# Golden values (P1, nx=3, L0=2) — reference tests/test_mpf1.py:229-286
# ---------------------------------------------------------------------------
def test_golden_mass_matrix():
    mesh = Mesh1D(L0=2.0, nx=3, degree=1)
    M = assemble_bilinear_band(mesh, _ones_coeff(mesh), 0, 0, mesh.h0)
    M = apply_dirichlet_band(M, (0, mesh.nh - 1), 1)
    dense = np.asarray(band_to_dense(M, 1)).flatten()
    expected = np.array(
        [1.0, 0.0, 0.0, 0.0,
         0.11111111, 0.44444444, 0.11111111, 0.0,
         0.0, 0.11111111, 0.44444444, 0.11111111,
         0.0, 0.0, 0.0, 1.0]
    )
    assert_array_almost_equal(dense, expected)


def test_golden_stiffness_matrix():
    # alpha/h with alpha=1.10213887, h=2/3 — reference test_mpf1.py:170-189
    mesh = Mesh1D(L0=2.0, nx=3, degree=1)
    alpha = 1.10213887
    A = assemble_bilinear_band(mesh, _ones_coeff(mesh, alpha), 1, 1, mesh.h0)
    A = apply_dirichlet_band(A, (0, mesh.nh - 1), 1)
    dense = np.asarray(band_to_dense(A, 1))
    assert_array_almost_equal(
        dense[1], np.array([-1.65320831, 3.30641662, -1.65320831, 0.0]), decimal=6
    )
    assert_array_almost_equal(dense[0], np.array([1.0, 0.0, 0.0, 0.0]))


def test_golden_scaled_stiffness():
    # Moving-mesh stiffness golden (reference tests/test_moving_mesh.py:102-153):
    # nx=5, L0=1, alpha = 0.5*(1+t^2), mesh scaled by Lt = 1 + sin(omega t).
    mesh = Mesh1D(L0=1.0, nx=5, degree=1)

    def assemble(t, omega, alpha_0):
        scale = 1.0 + np.sin(omega * t)
        alpha = alpha_0 * (1.0 + t * t)
        A = assemble_bilinear_band(mesh, _ones_coeff(mesh, alpha), 1, 1, mesh.h0 * scale)
        A = apply_dirichlet_band(A, (0, mesh.nh - 1), 1)
        rows, cols, vals = band_nonzero_entries(A, mesh)
        return vals

    omega = np.pi / 2.0 / 10.0
    # Reference golden vectors are the stored CSR entries (Dirichlet rows keep
    # an explicit zero); our nonzero filter drops those, so compare the
    # surviving interior values.
    expected0 = np.array([1.0, -2.5, 5.0, -2.5, -2.5, 5.0, -2.5,
                          -2.5, 5.0, -2.5, -2.5, 5.0, -2.5, 1.0])
    expected1 = np.array(
        [1.0, -38.07611845, 76.15223689, -38.07611845,
         -38.07611845, 76.15223689, -38.07611845, -38.07611845,
         76.15223689, -38.07611845, -38.07611845, 76.15223689,
         -38.07611845, 1.0]
    )
    assert_allclose(assemble(0.0, omega, 0.5), expected0, atol=1e-12)
    assert_allclose(assemble(5.0, omega, 0.5), expected1, atol=1e-7)
    # Assembling at t=0 again must restore the original operator
    # (reference decorator invariant, tests/test_moving_mesh.py:102-153).
    assert_allclose(assemble(0.0, omega, 0.5), expected0, atol=1e-12)


# ---------------------------------------------------------------------------
# Local ≡ global assembly (kernel-exactness, degrees 1–5)
# ---------------------------------------------------------------------------
FORMS = {
    "mass": (0, 0, lambda x: jnp.ones_like(x)),
    "stiffness": (1, 1, lambda x: 0.7 + jnp.sin(x)),
    "convection": (1, 0, lambda x: -(1.0 + 0.3 * x)),
}


@pytest.mark.parametrize("degree", DEGREES)
@pytest.mark.parametrize("form", list(FORMS))
def test_local_assembler_complete_operator(degree, form):
    a, b, cfun = FORMS[form]
    mesh = Mesh1D(L0=1.0, nx=20, degree=degree)
    xq = jnp.asarray(mesh.xq_ref)
    c = cfun(xq)
    dirichlet = (0, mesh.nh - 1)

    A = assemble_bilinear_band(mesh, c, a, b, mesh.h0)
    A = apply_dirichlet_band(A, dirichlet, degree)
    rows, cols, expected = band_nonzero_entries(A, mesh)

    emap = mesh.build_entry_map(list(zip(rows, cols)), dirichlet_dofs=dirichlet)
    check = assemble_bilinear_entries(mesh, emap, c[emap.elements], a, b, mesh.h0)

    assert_allclose(expected, np.asarray(check))


@pytest.mark.parametrize("degree", DEGREES)
def test_local_assembler_complete_vector(degree):
    mesh = Mesh1D(L0=1.0, nx=20, degree=degree)
    xq = jnp.asarray(mesh.xq_ref)
    c = jnp.exp(-xq) * (1.0 + xq**2)
    dirichlet = (0, mesh.nh - 1)

    fh = assemble_linear_vector(mesh, c, 0, mesh.h0)
    fh = apply_dirichlet_vector(fh, dirichlet)

    entries = [(dof,) for dof in range(mesh.nh)]
    emap = mesh.build_entry_map(entries, dirichlet_dofs=dirichlet)
    check = assemble_linear_entries(mesh, emap, c[emap.elements], 0, mesh.h0)

    assert_allclose(np.asarray(fh), np.asarray(check))


@pytest.mark.parametrize("degree", DEGREES)
def test_local_assembler_dofs(degree):
    # Sparse dof subset (reference: tests/test_deim.py:86-108)
    mesh = Mesh1D(L0=1.0, nx=100, degree=degree)
    xq = jnp.asarray(mesh.xq_ref)
    c = jnp.cos(3.0 * xq)
    dirichlet = (0, mesh.nh - 1)

    fh = np.asarray(
        apply_dirichlet_vector(assemble_linear_vector(mesh, c, 0, mesh.h0), dirichlet)
    )

    target_dofs = [5, 47, 98, 55, 14]
    emap = mesh.build_entry_map([(d,) for d in target_dofs], dirichlet_dofs=dirichlet)
    check = assemble_linear_entries(mesh, emap, c[emap.elements], 0, mesh.h0)

    assert_allclose(fh[target_dofs], np.asarray(check))


# ---------------------------------------------------------------------------
# Moving mesh: interpolation roundtrip and scaling invariants
# (reference: tests/test_moving_mesh.py:12-99)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("degree", DEGREES)
def test_function_interpolation_roundtrip(degree):
    mesh = Mesh1D(L0=1.0, nx=100, degree=degree)
    f = lambda x: x
    fh = interpolate_dofs(f, mesh, scale=1.0)
    fhm = interpolate_dofs(f, mesh, scale=0.33)
    fhb = interpolate_dofs(f, mesh, scale=1.0)
    assert np.isclose(np.linalg.norm(np.asarray(fh - fhb)), 0.0)
    assert np.isclose(float(jnp.max(fhm)), 0.33)


@pytest.mark.parametrize("degree", DEGREES)
def test_interpolation_in_time(degree):
    mesh = Mesh1D(L0=1.0, nx=100, degree=degree)
    T = 10.0
    omega = np.pi / 2.0 / T
    Lt = lambda t: 1.0 + np.sin(omega * t)
    for t in np.linspace(0.0, T, 10):
        fhm = interpolate_dofs(lambda x: x, mesh, scale=Lt(t))
        assert np.isclose(float(jnp.max(fhm)), Lt(t))


# ---------------------------------------------------------------------------
# Solvers
# ---------------------------------------------------------------------------
def test_tridiag_solve_exact():
    mesh = Mesh1D(L0=1.0, nx=50, degree=1)
    ones = _ones_coeff(mesh)
    K = assemble_bilinear_band(mesh, ones, 0, 0, mesh.h0)
    K = K + 0.1 * assemble_bilinear_band(mesh, ones, 1, 1, mesh.h0)
    K = apply_dirichlet_band(K, (0, mesh.nh - 1), 1)
    b = jnp.sin(jnp.asarray(mesh.x_dofs))
    x = tridiag_solve(K, b)
    res = band_matvec(K, x, 1) - b
    assert float(jnp.max(jnp.abs(res))) < 1e-11

    xd = jnp.linalg.solve(band_to_dense(K, 1), b)
    assert_allclose(np.asarray(x), np.asarray(xd), atol=1e-10)


def test_tridiag_solve_batched():
    mesh = Mesh1D(L0=1.0, nx=30, degree=1)
    ones = _ones_coeff(mesh)
    K = assemble_bilinear_band(mesh, ones, 0, 0, mesh.h0)
    K = apply_dirichlet_band(K, (0, mesh.nh - 1), 1)
    rng = np.random.default_rng(0)
    B = jnp.asarray(rng.normal(size=(7, mesh.nh)))
    Kb = jnp.broadcast_to(K, (7,) + K.shape)
    X = tridiag_solve(Kb, B)
    for i in range(7):
        assert_allclose(np.asarray(X[i]), np.asarray(tridiag_solve(K, B[i])), atol=1e-12)


@pytest.mark.parametrize("degree", [2, 3, 5])
def test_banded_solve_higher_degree(degree):
    mesh = Mesh1D(L0=1.0, nx=12, degree=degree)
    ones = _ones_coeff(mesh)
    K = assemble_bilinear_band(mesh, ones, 0, 0, mesh.h0)
    K = K + 0.05 * assemble_bilinear_band(mesh, ones, 1, 1, mesh.h0)
    K = apply_dirichlet_band(K, (0, mesh.nh - 1), degree)
    b = jnp.cos(jnp.asarray(mesh.x_dofs))
    x = solve_banded(K, b, degree)
    res = band_matvec(K, x, degree) - b
    assert float(jnp.max(jnp.abs(res))) < 1e-10


def test_band_matmat_matches_dense():
    mesh = Mesh1D(L0=1.0, nx=16, degree=3)
    xq = jnp.asarray(mesh.xq_ref)
    A = assemble_bilinear_band(mesh, jnp.exp(xq), 1, 0, mesh.h0)
    rng = np.random.default_rng(1)
    V = jnp.asarray(rng.normal(size=(mesh.nh, 4)))
    Y = band_matmat(A, V, 3)
    Yd = band_to_dense(A, 3) @ V
    assert_allclose(np.asarray(Y), np.asarray(Yd), atol=1e-12)


def test_point_eval_and_norm():
    mesh = Mesh1D(L0=2.0, nx=64, degree=2)
    u = interpolate_dofs(lambda x: x**2, mesh, scale=0.5)
    v = eval_function_at(jnp.asarray(u), jnp.array([0.3, 0.77]), mesh, scale=0.5)
    assert_allclose(np.asarray(v), [0.09, 0.5929], atol=1e-13)
    n = norm_L2(jnp.asarray(u), mesh, h_phys=mesh.h0 * 0.5)
    assert np.isclose(float(n), np.sqrt(1.0 / 5.0), atol=1e-12)


def test_point_eval_exactly_on_nodes():
    """Eval points landing exactly on mesh nodes (ξ = 0) must not NaN:
    an array exponent in the monomial table lowers to exp(0·log 0) on
    some backends — the probe locations 0.0/0.5 hit this in production
    (fom/nonlinear.py _step_outputs)."""
    mesh = Mesh1D(L0=1.0, nx=400, degree=1)
    u = interpolate_dofs(lambda x: np.sin(3.0 * x), mesh)
    v = eval_function_at(jnp.asarray(u), jnp.array([0.0, 0.5, 1.0]), mesh)
    assert_allclose(np.asarray(v), np.sin(3.0 * np.array([0.0, 0.5, 1.0])),
                    atol=1e-12)
