"""Matrix DEIM: empirical interpolation of parametrized operators stored as
vectors of structural nonzeros (reference: src/romtime/deim/mdeim.py:18-261).

The reference works on PETSc-CSR nonzero data; here the fixed banded layout
of the 1-D FEM operators provides the same "matrix as vector" trick with
static shapes: the topology (rows, cols) is probed once per operator, and
every snapshot/gather/projection is a jitted gather on the banded array.
"""

from copy import deepcopy

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial

from ..conventions import EmpiricalInterpolation
from ..ops.assembly import band_matmat, nnz_to_band
from .deim import DiscreteEmpiricalInterpolation


@partial(jax.jit, static_argnames=("p", "nh"))
def _project_modes(modes, V, rows, cols, p, nh):
    """A_N = Vᵀ A_h V per collateral mode, vmapped. Module-level jit:
    the windowed builds call project_basis once PER WINDOW per operator
    (W×operators×cells calls at the flagship fleet) and a closure-local
    jit would recompile every call — this caches one compilation per
    (shape, p, nh) for the whole build."""

    def project_mode(mode_vec):
        band = nnz_to_band(mode_vec, rows, cols, p, nh)
        AN = V.T @ band_matmat(band, V, p)
        return AN.reshape(-1)

    return jax.vmap(project_mode)(modes)


class MatrixDiscreteEmpiricalInterpolation(DiscreteEmpiricalInterpolation):

    TYPE = EmpiricalInterpolation.MDEIM

    def __init__(
        self,
        assemble,
        name=None,
        grid=None,
        tree_walk_params=None,
    ):
        super().__init__(
            assemble=assemble,
            name=name,
            grid=grid,
            tree_walk_params=tree_walk_params,
        )

        # Matrix topology (reference: mdeim.py:64-66)
        self.rows = None
        self.cols = None

    def copy(self):
        new = super().copy()
        if self.rows is not None:
            new.rows = deepcopy(self.rows)
        if self.cols is not None:
            new.cols = deepcopy(self.cols)
        if getattr(self, "_boundary_positions", None) is not None:
            # Needed to RETRAIN the copy (load_fom_basis → greedy mesh):
            # rom.mdeim_Nh is a copy (add_hyper_reductor), and the μ-local
            # per-cell N-MDEIM retrains exactly that object.
            new._boundary_positions = deepcopy(self._boundary_positions)
        return new

    # ------------------------------------------------------------------
    # Topology
    # ------------------------------------------------------------------
    def setup(self, rnd):
        """Fix the operator sparsity topology from one sample assembly
        (reference: mdeim.py:79-100)."""
        super().setup(rnd=rnd)

        sampler = self.build_sampling_space(num=1)
        mu = list(sampler)[0]

        rows, cols = self.get_matrix_topology(mu=mu, t=1.0)
        self.rows = rows
        self.cols = cols
        self._compute_boundary_positions()

    def get_matrix_topology(self, mu, t):
        """Stored-nonzero pattern, sorted by (row, col) — zero-eliminated
        like the reference CSR path (mdeim.py:126-151)."""
        op = self.assemble(mu=mu, t=t)
        rows, cols, _ = op.nonzero_entries(tolerance=1e-15)
        return rows, cols

    def _compute_boundary_positions(self):
        """Positions in the nonzero vector holding Dirichlet diagonals.

        The reference hard-codes position 0 (its dof 0 sits at x=L, the
        Dirichlet end — deim/deim.py:388,449); with ascending dof order the
        principled equivalent is every (d, d) with d a Dirichlet dof.
        """
        dirichlet = set(int(d) for d in self.solver.dirichlet_dofs)
        mask = np.array(
            [(r == c) and (int(r) in dirichlet)
             for r, c in zip(self.rows, self.cols)]
        )
        self._boundary_positions = np.where(mask)[0]

    def store_dofs(self, dofs):
        """Vector index → (row, col) (reference: mdeim.py:117-124)."""
        self.dofs = [self.get_entry(dof) for dof in dofs]

    def _forbidden_greedy_positions(self):
        return list(self._boundary_positions)

    def get_entry(self, idx):
        return self.rows[idx], self.cols[idx]

    # ------------------------------------------------------------------
    # Snapshots: banded gather at fixed topology
    # ------------------------------------------------------------------
    def _assemble_snapshot_traced(self, mu, t):
        op = self.assemble(mu=mu, t=t)
        return op.gather(self.rows, self.cols)

    def _mask_boundary_snapshots(self, snapshots):
        """Zero the Dirichlet diagonals before POD (reference:
        deim/deim.py:387-389)."""
        snapshots = np.array(snapshots)
        snapshots[self._boundary_positions, :] = 0.0
        return snapshots

    def _fix_boundary(self, approximation):
        """Restore the Dirichlet identity entries on FOM interpolation
        (reference: deim/deim.py:447-451)."""
        if len(self._boundary_positions) == 0:
            return approximation
        return approximation.at[jnp.asarray(self._boundary_positions)].set(
            self.solver.DIRICHLET_ENTRY
        )

    # ------------------------------------------------------------------
    # Projection: per-mode VᵀA_iV on banded storage
    # ------------------------------------------------------------------
    def project_basis(self, V):
        """Project each collateral mode: A_N = Vᵀ A_h V, stored flattened
        (reference: mdeim.py:153-192); one jitted vmap over modes."""
        V = jnp.asarray(np.asarray(V))
        self.N_V = V.shape[1]
        p = self.solver.mesh.degree
        nh = self.solver.mesh.nh
        rows = np.asarray(self.rows)
        cols = np.asarray(self.cols)

        modes = jnp.asarray(self.basis_fom.T)  # (N, nnz)
        VfN = _project_modes(modes, V, jnp.asarray(rows),
                             jnp.asarray(cols), p, nh)  # (N, N_V^2)
        self.basis_rom = np.asarray(VfN).T
        self._combine_cache = {}

    # ------------------------------------------------------------------
    # Online interpolation
    # ------------------------------------------------------------------
    def interpolate(self, mu, t, which=None):
        """FOM: banded operator; ROM: dense N_V×N_V
        (reference: mdeim.py:230-261)."""
        approximation = self._interpolate(mu, t, which=which)

        if which == self.ROM:
            return approximation.reshape((self.N_V, self.N_V))

        return self.to_operator(approximation)

    def to_operator(self, values):
        """Scatter a nonzero vector back into a banded operator."""
        from ..fom.base import BandedOperator

        mesh = self.solver.mesh
        band = nnz_to_band(
            jnp.asarray(values), np.asarray(self.rows), np.asarray(self.cols),
            mesh.degree, mesh.nh,
        )
        return BandedOperator(band, mesh)
