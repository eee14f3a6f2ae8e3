"""TPU-native 1-D FEM kernel layer.

This package replaces the reference's entire native L0 stack — DOLFIN/FFC
assembly, PETSc Krylov solvers and CSR extraction (reference:
src/romtime/fom/base.py:260-375, utils.py:76-149) — with closed-form
reference-element tables and banded-array kernels:

- :mod:`element` — Lagrange P1..P5 basis tables and Gauss quadrature.
- :mod:`mesh` — static interval-mesh topology (dof maps, banded nonzero
  pattern, DEIM entry→element maps).
- :mod:`assembly` — jit-friendly global (banded, einsum/MXU) and gathered
  (per-entry, DEIM) weak-form assembly; Dirichlet row enforcement.
- :mod:`linalg` — banded direct solvers (Thomas scan, dense fallback) and
  band⇄dense⇄nonzero-vector conversions.

Mesh motion is never data movement: the ALE map is a uniform scale factor
(reference moves the mesh with ``mesh.scale``, fom/base.py:222-237), applied
here as pull-back factors on quadrature points and Jacobians.
"""

from .element import ElementTables, gauss_quadrature, lagrange_tables
from .mesh import Mesh1D, EntryMap
from .assembly import (
    apply_dirichlet_band,
    apply_dirichlet_vector,
    assemble_bilinear_band,
    assemble_bilinear_entries,
    assemble_linear_entries,
    assemble_linear_vector,
    band_gather_nnz,
    band_matvec,
    band_to_dense,
    eval_function_at,
    interpolate_dofs,
    norm_L2,
    norm_H1,
)
from .linalg import solve_banded, tridiag_solve

__all__ = [
    "ElementTables",
    "gauss_quadrature",
    "lagrange_tables",
    "Mesh1D",
    "EntryMap",
    "apply_dirichlet_band",
    "apply_dirichlet_vector",
    "assemble_bilinear_band",
    "assemble_bilinear_entries",
    "assemble_linear_entries",
    "assemble_linear_vector",
    "band_gather_nnz",
    "band_matvec",
    "band_to_dense",
    "eval_function_at",
    "interpolate_dofs",
    "norm_L2",
    "norm_H1",
    "solve_banded",
    "tridiag_solve",
]
