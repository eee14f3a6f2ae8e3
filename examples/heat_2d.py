#!/usr/bin/env python
"""2-D heat equation on a structured grid — the analog of the reference's
deprecated 2-D exploration (reference: deprecated/heat_equation_2d.py and
notebooks/Heat-Equation.ipynb: a FEniCS-tutorial solver with exact-solution
certification).

TPU-native formulation: tensor-product P1 elements on a uniform grid give
Kronecker operators M = M1⊗M1, A = A1⊗M1 + M1⊗A1 (field form:
MG = M1 G M1ᵀ, AG = A1 G M1ᵀ + M1 G A1ᵀ). The implicit-Euler step
diagonalizes in the 1-D generalized eigenbasis of (A1, M1), so the whole
time loop is dense matmuls (MXU) + an elementwise scale — no sparse solver.

Manufactured problem (reference-notebook family):
    u_e = 1 + x² + β y² + α t,   u_t = Δu + f,   f = α − 2 − 2β,
with Dirichlet data u_e on the boundary. Writing u = w + g with g = u_e,
the homogeneous variable w solves the heat equation with zero data, so the
scheme must track u_e to solver precision.

Run:  python examples/heat_2d.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from romtime_tpu.ops import Mesh1D, assemble_bilinear_band
from romtime_tpu.ops.assembly import band_to_dense


def one_dimensional_operators(nx):
    """Dense 1-D mass/stiffness (no BCs) on [0,1]."""
    mesh = Mesh1D(L0=1.0, nx=nx, degree=1)
    ones = jnp.ones((mesh.ne, len(mesh.tables.quad_points)))
    M1 = band_to_dense(assemble_bilinear_band(mesh, ones, 0, 0, mesh.h0), 1)
    A1 = band_to_dense(assemble_bilinear_band(mesh, ones, 1, 1, mesh.h0), 1)
    x = jnp.asarray(mesh.x_dofs)
    return M1, A1, x


def solve_heat_2d(nx=32, nt=50, tf=2.0, alpha=3.0, beta=1.2):
    M1, A1, x = one_dimensional_operators(nx)
    dt = tf / nt

    ue = lambda X, Y, t: 1.0 + X**2 + beta * Y**2 + alpha * t
    f_const = alpha - 2.0 - 2.0 * beta

    X, Y = jnp.meshgrid(x, x, indexing="ij")

    # Interior-row (full-column) operator blocks for the lifting couplings
    M1f, A1f = M1[1:-1, :], A1[1:-1, :]
    Mi, Ai = M1[1:-1, 1:-1], A1[1:-1, 1:-1]

    # Generalized eigenbasis of (A1, M1) on the interior: A1 φ = λ M1 φ via
    # Cholesky congruence — the Kronecker step solve becomes diagonal.
    L = jnp.linalg.cholesky(Mi)
    Linv = jnp.linalg.inv(L)
    lam, Q = jnp.linalg.eigh(Linv @ Ai @ Linv.T)
    P = Linv.T @ Q  # M-orthonormal eigenvectors: PᵀMiP = I, (MiP)⁻¹ = Pᵀ

    denom = 1.0 + dt * (lam[:, None] + lam[None, :])

    # Load vector of a constant: ∫ c φ_i φ_j factorizes over axes.
    m1 = M1 @ jnp.ones_like(x)

    @jax.jit
    def step(w_int, t_new):
        """(M + dt A) w⁺ = M wⁿ + dt (F − A g⁺ − M ġ⁺), interior rows."""
        G = ue(X, Y, t_new)
        F_int = f_const * jnp.outer(m1[1:-1], m1[1:-1])
        Ag_int = A1f @ G @ M1f.T + M1f @ G @ A1f.T
        Mgdot_int = alpha * jnp.outer(m1[1:-1], m1[1:-1])

        rhs = Mi @ w_int @ Mi.T + dt * (F_int - Ag_int - Mgdot_int)

        # With W = P Ŵ Pᵀ the system becomes Mi P (Ŵ∘denom) PᵀMi = rhs and
        # (MiP)⁻¹ = Pᵀ, so Ŵ = (Pᵀ rhs P) / denom.
        w_hat = (P.T @ rhs @ P) / denom
        return P @ w_hat @ P.T

    n = x.shape[0]
    w = jnp.zeros((n - 2, n - 2))
    errors, ts = [], []
    for k in range(nt):
        t_new = (k + 1) * dt
        w = step(w, t_new)
        u = ue(X, Y, t_new).at[1:-1, 1:-1].add(w)
        e = u - ue(X, Y, t_new)
        errors.append(float(jnp.max(jnp.abs(e))))
        ts.append(t_new)

    return np.array(ts), np.array(errors)


def main():
    for nx in (16, 32):
        ts, errors = solve_heat_2d(nx=nx, nt=50)
        print(f"nx={nx:3d}  max|u - u_e| at t=tf: {errors[-1]:.3e}  "
              f"(max over run: {errors.max():.3e})")


if __name__ == "__main__":
    main()
