"""Static 1-D interval-mesh topology.

Replaces ``fenics.IntervalMesh`` + dofmap machinery (reference:
fom/base.py:188-220, 260-295). The mesh is never moved: motion enters as a
scalar pull-back factor (see :mod:`romtime_tpu.ops.assembly`). All structures
here are plain numpy, computed once; jitted kernels close over them as
constants.

Degrees of freedom are globally ordered left→right (cell ``e`` of degree
``p`` owns dofs ``e*p .. e*p+p``), which makes every operator a banded matrix
with half-bandwidth ``p`` — the analog of the reference's "CSR nonzeros as a
vector" trick (reference: utils.py:116-149, deim/mdeim.py:126-151), but with
a fixed, shape-static layout that XLA can tile.
"""

from dataclasses import dataclass, field
from functools import cached_property

import numpy as np

from .element import lagrange_tables


@dataclass(frozen=True)
class EntryMap:
    """Static gather map: DEIM entries → element-local contributions.

    For a list of matrix entries (row, col) or vector entries (dof,), this
    precomputes which elements must be integrated and how local values
    scatter into entry values — the analog of the reference's
    ``assemble_local`` cell walk (fom/base.py:523-599), but as index arrays
    suitable for one jitted gather/segment-sum.

    Attributes
    ----------
    entries : tuple
        The original entry tuples, caller order.
    elements : np.array (n_needed,)
        Unique element ids that must be integrated.
    term_elem_pos : np.array (n_terms,) int
        Position into ``elements`` of each contribution.
    term_i / term_j : np.array (n_terms,) int
        Local test/trial indices of each contribution (term_j unused for
        vectors).
    term_entry : np.array (n_terms,) int
        Which entry each contribution accumulates into.
    dirichlet_mask : np.array (n_entries,) bool
        Entries short-circuited by the Dirichlet convention.
    dirichlet_values : np.array (n_entries,) float
    is_vector : bool
    """

    entries: tuple
    elements: np.ndarray
    term_elem_pos: np.ndarray
    term_i: np.ndarray
    term_j: np.ndarray
    term_entry: np.ndarray
    dirichlet_mask: np.ndarray
    dirichlet_values: np.ndarray
    is_vector: bool

    @property
    def n_entries(self):
        return len(self.entries)


@dataclass(frozen=True)
class Mesh1D:
    """Uniform interval mesh [0, L0] with nx cells and P-degree elements."""

    L0: float
    nx: int
    degree: int = 1

    @property
    def ne(self):
        return self.nx

    @property
    def p(self):
        return self.degree

    @property
    def nh(self):
        """Number of global dofs."""
        return self.nx * self.degree + 1

    @property
    def h0(self):
        """Reference cell width (unscaled mesh)."""
        return self.L0 / self.nx

    @cached_property
    def tables(self):
        return lagrange_tables(self.degree)

    @cached_property
    def x_dofs(self):
        """Reference dof coordinates, left→right (nh,)."""
        return np.linspace(0.0, self.L0, self.nh)

    @cached_property
    def xq_ref(self):
        """Reference quadrature coordinates (ne, Q)."""
        starts = self.h0 * np.arange(self.ne)
        return starts[:, None] + self.h0 * self.tables.quad_points[None, :]

    @cached_property
    def scatter_rows(self):
        """scatter_rows[i] = global rows of local index i across elements."""
        p = self.degree
        return [i + p * np.arange(self.ne) for i in range(p + 1)]

    # ------------------------------------------------------------------
    # Connectivity
    # ------------------------------------------------------------------
    def cell_dofs(self, e):
        p = self.degree
        return list(range(e * p, e * p + p + 1))

    def dof_cells(self, dof):
        """Elements whose basis support covers ``dof``
        (reference analog: build_dofs_to_cells, fom/base.py:205-220)."""
        p = self.degree
        if dof % p == 0:
            vertex = dof // p
            cells = [e for e in (vertex - 1, vertex) if 0 <= e < self.ne]
        else:
            cells = [dof // p]
        return cells

    @cached_property
    def band_pattern(self):
        """Structural nonzero pattern of any assembled operator.

        Returns (rows, cols) sorted by (row, col) — matching the CSR storage
        order PETSc produces from element connectivity, which fixes the
        MDEIM vector layout (reference: deim/mdeim.py:126-151).
        """
        pairs = set()
        for e in range(self.ne):
            dofs = self.cell_dofs(e)
            for i in dofs:
                for j in dofs:
                    pairs.add((i, j))
        pairs = sorted(pairs)
        rows = np.array([r for r, _ in pairs], dtype=np.int64)
        cols = np.array([c for _, c in pairs], dtype=np.int64)
        return rows, cols

    # ------------------------------------------------------------------
    # DEIM entry maps
    # ------------------------------------------------------------------
    def build_entry_map(self, entries, dirichlet_dofs=(), dirichlet_entry=1.0,
                        dirichlet_value=0.0):
        """Precompute the gather map for per-entry (DEIM) assembly.

        Parameters
        ----------
        entries : sequence of tuples
            (row, col) matrix entries or (dof,) vector entries.
        dirichlet_dofs : sequence of int
            Dofs whose rows are overwritten by the Dirichlet convention
            (diag → ``dirichlet_entry``, vector → ``dirichlet_value``;
            reference: fom/base.py:50-51, 546-553).
        """
        entries = tuple(tuple(int(v) for v in entry) for entry in entries)
        if not entries:
            raise ValueError("Empty entry list.")
        is_vector = len(entries[0]) == 1

        dirichlet = set(int(d) for d in dirichlet_dofs)
        p = self.degree

        term_e, term_i, term_j, term_entry = [], [], [], []
        diri_mask = np.zeros(len(entries), dtype=bool)
        diri_vals = np.zeros(len(entries), dtype=np.float64)

        for k, entry in enumerate(entries):
            if is_vector:
                (dof,) = entry
                if dof in dirichlet:
                    diri_mask[k] = True
                    diri_vals[k] = dirichlet_value
                    continue
                for e in self.dof_cells(dof):
                    term_e.append(e)
                    term_i.append(dof - e * p)
                    term_j.append(0)
                    term_entry.append(k)
            else:
                row, col = entry
                # Dirichlet rows are overwritten wholesale in the
                # assembled operator (identity diagonal, zero
                # off-diagonals; reference: fom/base.py:546-553) — mirror
                # that for ANY requested entry so local ≡ global holds
                # unconditionally. DEIM itself only ever selects the
                # diagonal (off-diagonals are structurally eliminated),
                # but the gathered path should not depend on it.
                if row in dirichlet:
                    diri_mask[k] = True
                    diri_vals[k] = dirichlet_entry if row == col else 0.0
                    continue
                cells = set(self.dof_cells(row)) & set(self.dof_cells(col))
                for e in sorted(cells):
                    term_e.append(e)
                    term_i.append(row - e * p)
                    term_j.append(col - e * p)
                    term_entry.append(k)

        term_e = np.asarray(term_e, dtype=np.int64)
        elements, elem_pos = np.unique(term_e, return_inverse=True)

        return EntryMap(
            entries=entries,
            elements=elements,
            term_elem_pos=elem_pos.astype(np.int64),
            term_i=np.asarray(term_i, dtype=np.int64),
            term_j=np.asarray(term_j, dtype=np.int64),
            term_entry=np.asarray(term_entry, dtype=np.int64),
            dirichlet_mask=diri_mask,
            dirichlet_values=diri_vals,
            is_vector=is_vector,
        )
