#!/usr/bin/env python
"""Poisson tutorial — the analog of the reference's Poisson-Equation
notebook (reference: notebooks/Poisson-Equation.ipynb): steady 1-D solve
with manufactured solution, then a tiny parametrized POD demonstration.

Run:  python examples/poisson_tutorial.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from romtime_tpu.ops import (
    Mesh1D,
    apply_dirichlet_band,
    apply_dirichlet_vector,
    assemble_bilinear_band,
    assemble_linear_vector,
    interpolate_dofs,
    norm_L2,
    solve_banded,
)
from romtime_tpu.rom.pod import orth


def solve_poisson(nx, alpha):
    """-alpha u'' = f on [0,1], u(0)=u(1)=0, f = pi^2 sin(pi x)."""
    mesh = Mesh1D(L0=1.0, nx=nx, degree=1)
    xq = jnp.asarray(mesh.xq_ref)

    A = assemble_bilinear_band(mesh, alpha * jnp.ones_like(xq), 1, 1, mesh.h0)
    f = assemble_linear_vector(mesh, jnp.pi**2 * jnp.sin(jnp.pi * xq), 0, mesh.h0)

    dirichlet = (0, mesh.nh - 1)
    A = apply_dirichlet_band(A, dirichlet, mesh.degree)
    f = apply_dirichlet_vector(f, dirichlet)

    u = solve_banded(A, f, mesh.degree)
    return mesh, u


def main():
    # ------------------------------------------------------------------
    # 1) Certify against the exact solution (alpha = 1: u = sin(pi x))
    # ------------------------------------------------------------------
    for nx in (16, 64, 256):
        mesh, u = solve_poisson(nx, alpha=1.0)
        ue = interpolate_dofs(lambda x: jnp.sin(jnp.pi * x), mesh)
        err = float(norm_L2(u - ue, mesh))
        print(f"nx={nx:4d}  L2 error vs interpolant = {err:.3e} (nodally exact)")

    # ------------------------------------------------------------------
    # 2) Parametrized family: u(x; alpha) = sin(pi x)/alpha is rank-1 —
    #    POD finds it with one mode.
    # ------------------------------------------------------------------
    alphas = np.linspace(0.5, 2.0, 12)
    snapshots = []
    for alpha in alphas:
        _, u = solve_poisson(128, alpha=float(alpha))
        snapshots.append(np.asarray(u))
    snapshots = np.array(snapshots).T  # (nh, n_mu)

    basis, sigmas, energy = orth(snapshots)
    print(f"\nPOD of the parametrized family: {basis.shape[1]} mode(s), "
          f"sigma_2/sigma_1 = {sigmas[1] / sigmas[0]:.2e}")

    # Reduced solve for an unseen alpha: exact because the family is rank-1.
    mesh, u_new = solve_poisson(128, alpha=1.234)
    uN = basis.T @ np.asarray(u_new)
    reconstruction = basis @ uN
    rel = np.linalg.norm(reconstruction - np.asarray(u_new)) / np.linalg.norm(
        np.asarray(u_new)
    )
    print(f"1-mode reconstruction error at unseen alpha: {rel:.2e}")


if __name__ == "__main__":
    main()
