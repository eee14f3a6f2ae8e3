"""Nonlinear MDEIM: empirical interpolation of the state-dependent
trilinear operator N(u) (reference: src/romtime/deim/nonlinear.py:26-556).

Snapshots sweep (μ, t, ψ) where ψ ranges over the reduced-basis columns; the
reference's triple Python loop (nonlinear.py:439-456) becomes one jitted
vmap over (t × ψ) per μ. Supports truncation into the sacrificial "S-"
variant sharing the topology.
"""

from copy import deepcopy

import jax
import jax.numpy as jnp
import numpy as np

from ..conventions import EmpiricalInterpolation, RomParameters, Stage, Treewalk
from ..dtypes import asarray as _dtype_asarray, compute_dtype
from ..ops.linalg import gauss_solve, solve_small
from ..rom.base import Reductor
from ..rom.pod import orth
from .mdeim import MatrixDiscreteEmpiricalInterpolation


class MatrixDiscreteEmpiricalInterpolationNonlinear(
    MatrixDiscreteEmpiricalInterpolation
):

    TYPE = EmpiricalInterpolation.NONLINEAR

    def __init__(
        self,
        assemble,
        name=None,
        grid=None,
        tree_walk_params=None,
    ):
        super().__init__(
            assemble,
            name=name,
            grid=grid,
            tree_walk_params=tree_walk_params,
        )

        # External function basis ψ (reference: nonlinear.py:46-47)
        self.u_n = None
        self._batch_snapshots_psi_fn = None

    # ------------------------------------------------------------------
    # Truncation into the sacrificial variant
    # ------------------------------------------------------------------
    def copy(self):
        new = super().copy()
        if self.u_n is not None:
            new.u_n = self.u_n
        return new

    def truncate(self, n):
        """Remove n modes, rebuilding the interpolation mesh; shares the
        matrix topology (reference: nonlinear.py:49-104)."""
        name = "S-" + self.name

        truncated = self.__class__(
            assemble=self.assemble,
            grid=self.grid,
            tree_walk_params=self.tree_walk_params,
            name=name,
        )
        Reductor.setup(self=truncated, rnd=self.random_state)

        truncated.rows = self.rows
        truncated.cols = self.cols
        truncated._boundary_positions = self._boundary_positions

        N = self.N
        assert n < N, (
            "You want to remove too many modes from S-NonlinearMDEIM "
            "to create NonlinearMDEIM."
        )
        truncated.basis_fom = self.basis_fom[:, : N - n]
        truncated.u_n = self.u_n
        truncated._finalize_basis()

        truncated.mu_space = deepcopy(self.mu_space)
        truncated.report = deepcopy(self.report)
        truncated.report[Stage.OFFLINE][Treewalk.BASIS_FINAL] = truncated.N

        return truncated

    # ------------------------------------------------------------------
    # Topology: probed with a non-constant state
    # ------------------------------------------------------------------
    def setup(self, rnd, V=None):
        """Probe the topology with u = x so every structural entry is live
        (reference: nonlinear.py:133-157)."""
        Reductor.setup(self=self, rnd=rnd)

        sampler = self.build_sampling_space(num=1)
        mu = list(sampler)[0]

        u_n = np.asarray(self.solver.mesh.x_dofs)
        rows, cols = self.get_matrix_topology(mu=mu, t=1.0, u_n=u_n)
        self.rows = rows
        self.cols = cols
        self._compute_boundary_positions()

    def get_matrix_topology(self, mu, t, u_n=None):
        op = self.assemble(mu=mu, t=t, u_n=u_n)
        rows, cols, _ = op.nonzero_entries(tolerance=1e-15)
        return rows, cols

    # ------------------------------------------------------------------
    # Offline phase
    # ------------------------------------------------------------------
    def run(self, u_n, mu_space=None):
        """N-MDEIM offline phase over the ψ-basis ``u_n``
        (reference: nonlinear.py:159-212)."""
        u_n = np.asarray(u_n)
        if u_n.ndim == 1:
            u_n = u_n.reshape((-1, 1))
        self.u_n = u_n
        self._batch_snapshots_psi_fn = None

        params = self.tree_walk_params
        ts = params[RomParameters.TS]
        num_snapshots = params[RomParameters.NUM_SNAPSHOTS]

        num_mu = params.get(RomParameters.NUM_MU, None)
        num_t = params.get(RomParameters.NUM_TIME, None)
        tol_mu = params.get(RomParameters.TOL_MU, None)
        tol_t = params.get(RomParameters.TOL_TIME, None)

        Vfh, sigmas = self.tree_walk(
            ts=ts,
            normalize=True,
            num_mu=num_mu,
            num_t=num_t,
            tol_mu=tol_mu,
            tol_t=tol_t,
            num_snapshots=num_snapshots,
            mu_space=mu_space,
        )

        self.basis_fom = Vfh
        self.sigmas = sigmas
        self._finalize_basis()

    # ------------------------------------------------------------------
    # Snapshots over (t, ψ)
    # ------------------------------------------------------------------
    def _assemble_snapshot_traced(self, mu, t, u_n=None):
        op = self.assemble(mu=mu, t=t, u_n=u_n)
        return op.gather(self.rows, self.cols)

    def assemble_snapshot(self, mu, t, u_n=None):
        return np.asarray(self._assemble_snapshot_traced(self._mu_jnp(mu), t, u_n))

    def assemble_snapshots_batch_psi(self, mu, ts):
        """All (t, ψ) snapshots in one jitted launch: (nt, k, nnz)."""
        if not isinstance(self._batch_snapshots_psi_fn, dict):
            self._batch_snapshots_psi_fn = {}
        key = compute_dtype()
        if key not in self._batch_snapshots_psi_fn:
            fn = lambda mu, t, psi: self._assemble_snapshot_traced(mu, t, psi)
            over_psi = jax.vmap(fn, in_axes=(None, None, 1))
            over_t = jax.vmap(over_psi, in_axes=(None, 0, None))
            self._batch_snapshots_psi_fn[key] = jax.jit(over_t)
        out = self._batch_snapshots_psi_fn[key](
            self._mu_jnp(mu), _dtype_asarray(ts), _dtype_asarray(self.u_n)
        )
        return np.asarray(out)

    def walk_time(self, mu, ts, normalize=True, num=None, tol=None):
        """Per-t POD over the ψ-branch, then POD over time
        (reference: nonlinear.py:405-468)."""
        all_snaps = self.assemble_snapshots_batch_psi(mu, ts)  # (nt, k, nnz)

        basis_time = []
        for snap_t in all_snaps:
            snapshots = self._mask_boundary_snapshots(snap_t.T)  # (nnz, k)
            phi_psi, s_psi, _ = orth(
                snapshots=snapshots, num=num, tol=tol, normalize=normalize
            )
            # Hierarchical-POD weighting (see rom/rom.py build_reduced_basis)
            basis_time.append(phi_psi * s_psi[: phi_psi.shape[1]])

        basis_time = np.hstack(basis_time)
        # basis_time columns are sigma-weighted; under WEIGHTED_POD skip
        # the re-normalization so per-t branch energies survive into the
        # time-stage ordering (see DiscreteEmpiricalInterpolation.weighted).
        phi, sigmas, energy = orth(
            snapshots=basis_time, num=num, tol=tol,
            normalize=normalize and not self.weighted,
        )
        basis = phi * sigmas[: phi.shape[1]]
        return basis, sigmas, energy

    # ------------------------------------------------------------------
    # Online interpolation (state-dependent)
    # ------------------------------------------------------------------
    def _interpolate_traced(self, mu, t, u_n=None, which=None):
        fh_local = jnp.asarray(
            self.assemble(mu=mu, t=t, u_n=u_n, entries=self.dofs)
        )
        thetas = self._solve_thetas(fh_local)
        return self._combine_traced(thetas, which)

    def _interpolate(self, mu, t, u_n=None, which=None):
        return np.asarray(
            self._interpolate_traced(self._mu_jnp(mu), t, u_n, which)
        )

    def interpolate(self, mu, t, u_n=None, which=None):
        """FOM: banded operator; ROM: dense N_V×N_V
        (reference: nonlinear.py:214-245)."""
        approximation = self._interpolate(mu, t, u_n=u_n, which=which)
        if which == self.ROM:
            return approximation.reshape((self.N_V, self.N_V))
        return self.to_operator(approximation)

    # ------------------------------------------------------------------
    # Online evaluation
    # ------------------------------------------------------------------
    def evaluate(self, ts, funcs=None, num=None, mu_space=None):
        """Average interpolation error over the ψ columns
        (reference: nonlinear.py:470-540); batched over (t, ψ)."""
        if mu_space:
            space = mu_space
        else:
            assert num, "Provide number of samples to test"
            space = self.build_sampling_space(num=num)

        u_n = self.u_n if funcs is None else np.asarray(funcs)
        ts = np.asarray(ts)
        N_psi = u_n.shape[1]

        interp_fn = jax.jit(
            jax.vmap(
                jax.vmap(
                    lambda mu, t, psi: self._interpolate_traced(
                        mu, t, psi, which=self.FOM
                    ),
                    in_axes=(None, None, 1),
                ),
                in_axes=(None, 0, None),
            )
        )

        for mu in space:
            mu_idx, mu = self.add_mu(step=Stage.ONLINE, mu=mu)

            truth = self.assemble_snapshots_batch_psi(mu, ts)  # (nt, k, nnz)
            approx = np.asarray(
                interp_fn(self._mu_jnp(mu), jnp.asarray(ts), jnp.asarray(u_n))
            )

            diff = truth - approx
            errors_t_psi = np.linalg.norm(diff, axis=2) / np.sqrt(diff.shape[2])
            self.errors_rom[mu_idx] = errors_t_psi.mean(axis=1)
