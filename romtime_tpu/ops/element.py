"""Reference-element tables for 1-D Lagrange elements P1..P5.

The reference delegates element integration to FFC-generated C++ kernels
(reference: fom/base.py:518 ``fenics.assemble``, :582 ``assemble_local``).
On a 1-D interval mesh those kernels reduce to tiny dense tables: basis
values/derivatives at Gauss points on the unit reference element [0, 1].
Everything here is static numpy computed once at setup; the hot path only
consumes the resulting constant arrays inside jitted einsums.
"""

from dataclasses import dataclass, field

import numpy as np


def lagrange_nodes(degree):
    """Equispaced Lagrange nodes on [0, 1] (FEniCS 'P' family layout)."""
    return np.linspace(0.0, 1.0, degree + 1)


def lagrange_coefficients(degree):
    """Monomial coefficients of the Lagrange basis on [0, 1].

    Returns
    -------
    coeffs : np.array (degree+1, degree+1)
        ``coeffs[i, k]`` is the coefficient of ``xi**k`` in basis i, i.e.
        P_i(xi) = sum_k coeffs[i, k] * xi**k with P_i(node_j) = delta_ij.
    """
    nodes = lagrange_nodes(degree)
    vander = np.vander(nodes, degree + 1, increasing=True)  # V[j,k] = node_j^k
    # P_i coefficients solve V @ c_i = e_i  =>  C = inv(V)^T rows
    coeffs = np.linalg.solve(vander, np.eye(degree + 1)).T
    return coeffs


def polyval_table(coeffs, points):
    """Evaluate each polynomial row of ``coeffs`` at ``points``.

    Returns table[q, i] = P_i(points[q]).
    """
    points = np.asarray(points)
    powers = np.vander(points, coeffs.shape[1], increasing=True)  # (Q, k)
    return powers @ coeffs.T


def polyder_coeffs(coeffs, order=1):
    """Differentiate polynomial coefficient rows ``order`` times."""
    out = coeffs
    for _ in range(order):
        k = np.arange(1, out.shape[1])
        out = out[:, 1:] * k[None, :]
    if out.shape[1] == 0:
        out = np.zeros((coeffs.shape[0], 1))
    return out


def gauss_quadrature(npoints):
    """Gauss–Legendre rule mapped to [0, 1]."""
    x, w = np.polynomial.legendre.leggauss(npoints)
    return 0.5 * (x + 1.0), 0.5 * w


@dataclass(frozen=True)
class ElementTables:
    """Static per-degree tables consumed by the assembly kernels.

    Attributes
    ----------
    degree : int
    quad_points : (Q,) Gauss points on [0, 1]
    quad_weights : (Q,)
    B0 : (Q, degree+1) basis values at quad points
    B1 : (Q, degree+1) basis first derivatives (reference coords)
    coeffs : (degree+1, degree+1) monomial coefficients (for point eval)
    dcoeffs : monomial coefficients of the first derivatives
    """

    degree: int
    quad_points: np.ndarray = field(repr=False)
    quad_weights: np.ndarray = field(repr=False)
    B0: np.ndarray = field(repr=False)
    B1: np.ndarray = field(repr=False)
    coeffs: np.ndarray = field(repr=False)
    dcoeffs: np.ndarray = field(repr=False)

    def basis_table(self, derivative_order):
        if derivative_order == 0:
            return self.B0
        if derivative_order == 1:
            return self.B1
        raise ValueError(f"Unsupported derivative order {derivative_order}.")


_TABLE_CACHE = {}


def lagrange_tables(degree, nquad=None):
    """Build (and cache) the :class:`ElementTables` for a degree.

    The default quadrature uses 2(degree+1) points — exact through polynomial
    degree 4*degree+3, which covers every form in the framework including the
    trilinear term u_n·u'·v with u_n in the same P-space (total degree 3p-1).
    """
    if nquad is None:
        nquad = 2 * (degree + 1)
    key = (degree, nquad)
    if key in _TABLE_CACHE:
        return _TABLE_CACHE[key]

    xq, wq = gauss_quadrature(nquad)
    coeffs = lagrange_coefficients(degree)
    dcoeffs = polyder_coeffs(coeffs)
    B0 = polyval_table(coeffs, xq)
    B1 = polyval_table(dcoeffs, xq)

    tables = ElementTables(
        degree=degree,
        quad_points=xq,
        quad_weights=wq,
        B0=B0,
        B1=B1,
        coeffs=coeffs,
        dcoeffs=dcoeffs,
    )
    _TABLE_CACHE[key] = tables
    return tables
