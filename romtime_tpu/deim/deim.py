"""Discrete Empirical Interpolation (DEIM) for parametrized vectors.

Rebuild of the reference's DEIM (reference: src/romtime/deim/deim.py:25-561)
with TPU-native execution:

- the (μ, t) snapshot sweep of the tree walk is one jitted ``vmap`` over the
  time grid per μ (the reference loops ``fenics.assemble`` per (μ, t),
  deim/deim.py:379-384);
- online interpolation — gathered local assembly at the interpolation dofs,
  the small PᵀU θ-solve, and the basis combination — is a single jitted
  kernel, vmappable over time and μ (the reference calls back into FEniCS
  local assembly per evaluation, deim/deim.py:438);
- greedy point selection stays host-side numpy (inherently sequential,
  N ≲ 100).
"""

from copy import deepcopy

import jax
import jax.numpy as jnp
import numpy as np

from ..conventions import EmpiricalInterpolation, RomParameters, Stage
from ..dtypes import asarray as _dtype_asarray, compute_dtype, scalar as _dtype_scalar
from ..ops.linalg import gauss_solve, solve_small
from ..rom.base import Reductor
from ..rom.pod import orth
from ..utils import dump_pickle, read_pickle


def basis_vector(size, index):
    """Canonical basis column e_index (reference: deim/deim.py:18-22)."""
    ej = np.zeros((size, 1))
    ej[index, 0] = 1.0
    return ej


def greedy_interpolation_points(Vf, forbidden=None):
    """Greedy DEIM point selection (reference: deim/deim.py:517-561).

    Selects, per basis vector, the dof maximizing the residual of the
    current interpolant. Positions in ``forbidden`` (Dirichlet-convention
    entries whose local assembly is overridden, so their basis value is
    zero by construction) are masked out of the argmax — selecting one
    would make PᵀU singular; the reference avoids this only by chance in
    its noise modes.
    """
    Vf = np.asarray(Vf)
    Nh, Ns = Vf.shape

    # Native host kernel (csrc/romtime_native.cpp) — the recursion is
    # sequential with data-dependent shapes, a poor fit for XLA; falls back
    # to numpy when the toolchain is unavailable.
    from .. import native

    dofs = native.deim_greedy(Vf, forbidden or ())
    if dofs is not None:
        P = np.zeros((Nh, Ns))
        P[dofs, np.arange(Ns)] = 1.0
        return dofs, P

    mask = np.zeros((Nh, 1))
    if forbidden is not None and len(forbidden):
        mask[np.asarray(forbidden, dtype=int)] = np.inf

    def masked_argmax(v):
        return int(np.argmax(np.where(np.isinf(mask), -np.inf, np.abs(v))))

    U = Vf[:, [0]]
    dof_1 = masked_argmax(U)
    P = basis_vector(size=Nh, index=dof_1)
    interpolation_dofs = [dof_1]

    for idx in range(1, Ns):
        uj = Vf[:, [idx]]

        matrix = P.T @ U
        b = P.T @ uj
        coeff = np.linalg.solve(matrix, b)

        residual = uj - U @ coeff
        dof_idx = masked_argmax(residual)

        P = np.hstack((P, basis_vector(size=Nh, index=dof_idx)))
        U = np.hstack((U, uj))
        interpolation_dofs.append(dof_idx)

    return interpolation_dofs, P


class DiscreteEmpiricalInterpolation(Reductor):

    TYPE = EmpiricalInterpolation.DEIM

    def __init__(
        self,
        assemble,
        grid=None,
        tree_walk_params=None,
        name=None,
    ) -> None:
        """Parameters mirror the reference (deim/deim.py:29-75):
        ``assemble`` is an ``OneDimensionalSolver.assemble_*``-like bound
        method; its owning solver provides the mesh/topology."""
        super().__init__(grid=grid)

        self.name = name
        self.assemble = assemble
        self.tree_walk_params = tree_walk_params
        # Weighted hierarchical POD (RomParameters.WEIGHTED_POD): when
        # set, the sigma-weighted per-branch bases are combined WITHOUT
        # re-normalization, so branches with more operator energy keep
        # proportionally more modes. Default False = reference semantics
        # (unit-normalized columns at every stage).
        self.weighted = bool(
            (tree_walk_params or {}).get(RomParameters.WEIGHTED_POD, False)
        )

        self.N_V = None  # projection basis size
        self.PT_U = None  # interpolation matrix
        self.PT_U_inv = None  # precomputed inverse (f32 serving path)
        self.sigmas = None
        self.dofs = None

        self.basis_fom = None
        self.basis_rom = None
        self.snapshots = None

        self.basis_pickle_name = self.__define_basis_name__()

        self._batch_snapshots_fn = None
        self._batch_interpolate_fn = None
        self._evaluate_batch_fn = None

    def __define_basis_name__(self):
        name = "_".join(self.name.lower().split())
        type_ = self.TYPE.lower()
        return f"basis_fom_{type_}_{name}.pkl"

    def __str__(self) -> str:
        return f"{self.TYPE} - {self.name}"

    def __repr__(self) -> str:
        return self.__str__()

    # ------------------------------------------------------------------
    # Introspection into the owning solver
    # ------------------------------------------------------------------
    @property
    def solver(self):
        return self.assemble.__self__

    @property
    def Nh(self):
        return self.basis_fom.shape[0]

    @property
    def N(self):
        return self.basis_fom.shape[1]

    def copy(self):
        """Shallow-config copy carrying over trained data
        (reference: deim/deim.py:110-131)."""
        new = self.__class__(
            assemble=self.assemble,
            grid=self.grid,
            tree_walk_params=self.tree_walk_params,
            name=self.name,
        )
        if self.basis_fom is not None:
            new.basis_fom = deepcopy(self.basis_fom)
        if self.basis_rom is not None:
            new.basis_rom = deepcopy(self.basis_rom)
        if self.PT_U is not None:
            new.PT_U = deepcopy(self.PT_U)
        if getattr(self, "PT_U_inv", None) is not None:
            new.PT_U_inv = deepcopy(self.PT_U_inv)
        if self.dofs is not None:
            new.dofs = deepcopy(self.dofs)
        if self.errors_rom is not None:
            new.errors_rom = deepcopy(self.errors_rom)
        return new

    # ------------------------------------------------------------------
    # Persistence
    # ------------------------------------------------------------------
    def dump_fom_basis(self, path=None):
        """Pickle the collateral basis (reference: deim/deim.py:166-173)."""
        if self.basis_fom is None:
            raise RuntimeError(
                f"Trying to dump basis for {self.name} without building it!"
            )
        dump_pickle(path or self.basis_pickle_name, obj=self.basis_fom)

    def load_fom_basis(self, keep=None, basis=None):
        """Load a collateral basis and rebuild the interpolation mesh
        (reference: deim/deim.py:133-164)."""
        if basis is None:
            basis = read_pickle(self.basis_pickle_name)
        if keep:
            basis = basis[:, :keep]

        self.basis_fom = np.asarray(basis)
        self._finalize_basis()

    # ------------------------------------------------------------------
    # Offline phase
    # ------------------------------------------------------------------
    def run(self, normalize=True, mu_space=None):
        """Tree walk + greedy point selection (reference:
        deim/deim.py:175-215)."""
        params = self.tree_walk_params
        ts = params[RomParameters.TS]
        # Optional when an explicit mu_space is handed in (tree_walk only
        # samples when no space is given) — mirrors build_reduced_basis.
        num_snapshots = params.get(RomParameters.NUM_SNAPSHOTS)

        num_mu = params.get(RomParameters.NUM_MU, None)
        num_t = params.get(RomParameters.NUM_TIME, None)
        tol_mu = params.get(RomParameters.TOL_MU, None)
        tol_t = params.get(RomParameters.TOL_TIME, None)

        Vfh, sigmas = self.tree_walk(
            ts=ts,
            num_snapshots=num_snapshots,
            num_mu=num_mu,
            num_t=num_t,
            tol_mu=tol_mu,
            tol_t=tol_t,
            normalize=normalize,
            mu_space=mu_space,
        )

        self.basis_fom = Vfh
        self.sigmas = sigmas
        self._finalize_basis()

    def _finalize_basis(self):
        dofs, P = self.build_interpolation_mesh()
        self.store_dofs(dofs)
        self.PT_U = np.matmul(P.T, self.basis_fom)
        # Precomputed inverse for float32 serving: the in-scan theta-solve
        # becomes ONE matmul instead of an unrolled elimination whose op
        # count grows with the collateral basis size (TPU compile cost).
        # float64 certification paths keep the exact solve.
        try:
            self.PT_U_inv = np.linalg.inv(self.PT_U)
        except np.linalg.LinAlgError:
            self.PT_U_inv = None
        self._batch_interpolate_fn = None
        self._evaluate_batch_fn = None
        self._combine_cache = {}

    def build_interpolation_mesh(self):
        return greedy_interpolation_points(
            self.basis_fom, forbidden=self._forbidden_greedy_positions()
        )

    def _forbidden_greedy_positions(self):
        """Dirichlet dof positions: their local assembly is the override
        value, never μ-dependent information."""
        return [int(d) for d in self.solver.dirichlet_dofs]

    def store_dofs(self, dofs):
        """Vector entries (reference: deim/deim.py:217-224)."""
        self.dofs = [(dof,) for dof in dofs]

    def tree_walk(
        self,
        ts,
        normalize=True,
        num_mu=None,
        num_t=None,
        tol_mu=None,
        tol_t=None,
        num_snapshots=None,
        mu_space=None,
    ):
        """POD-in-time per μ, then POD across μ (reference:
        deim/deim.py:279-355)."""
        if mu_space:
            space = mu_space
        elif num_snapshots:
            space = self.build_sampling_space(num=num_snapshots,
                                              rnd=self.random_state)
        else:
            raise ValueError(
                "DEIM tree walk needs either an explicit mu_space or "
                "num_snapshots in tree_walk_params."
            )

        basis_time = []
        for mu in space:
            mu_idx, mu = self.add_mu(step=Stage.OFFLINE, mu=mu)

            _basis, sigmas_time, energy_time = self.walk_time(
                mu=mu, ts=ts, num=num_t, tol=tol_t, normalize=normalize
            )

            offline = self.report[Stage.OFFLINE]
            offline["spectrum-time"][mu_idx] = sigmas_time
            offline["energy-time"][mu_idx] = energy_time
            offline["basis-shape-time"][mu_idx] = _basis.shape[1]

            basis_time.append(_basis)

        basis = np.hstack(basis_time)
        self.report[Stage.OFFLINE]["basis-shape-after-tree-walk"] = basis.shape[1]

        # The stacked per-mu bases carry hierarchical sigma-weights; with
        # WEIGHTED_POD the combination stage must not re-normalize them
        # (normalize=True would neutralize the weighting — each column
        # returns to unit norm regardless of its branch energy).
        basis, sigmas_mu, energy_mu = orth(
            snapshots=basis, num=num_mu, tol=tol_mu,
            normalize=normalize and not self.weighted,
        )

        offline = self.report[Stage.OFFLINE]
        offline["spectrum-mu"] = sigmas_mu
        offline["energy-mu"] = energy_mu
        offline["basis-shape-final"] = basis.shape[1]

        return basis, sigmas_mu

    def walk_time(self, mu, ts, normalize=True, num=None, tol=None):
        """Time branch: batched snapshot assembly + POD (reference:
        deim/deim.py:357-397)."""
        snapshots = self.assemble_snapshots_batch(mu, ts)  # (dim, nt)
        snapshots = self._mask_boundary_snapshots(snapshots)
        basis, sigmas, energy = orth(
            snapshots=snapshots, num=num, tol=tol, normalize=False
        )
        # Hierarchical-POD weighting: carry the singular values into the
        # μ-stage so the final POD is energy-ordered (see
        # rom/rom.py build_reduced_basis).
        basis = basis * sigmas[: basis.shape[1]]
        return basis, sigmas, energy

    def _mask_boundary_snapshots(self, snapshots):
        """Hook: MDEIM zeroes the Dirichlet-diagonal entries so boundary
        rows don't pollute the basis (reference: deim/deim.py:387-389)."""
        return snapshots

    # ------------------------------------------------------------------
    # Snapshot assembly (batched, jitted)
    # ------------------------------------------------------------------
    @staticmethod
    def _mu_jnp(mu):
        return {k: _dtype_scalar(v) for k, v in mu.items()}

    def _assemble_snapshot_traced(self, mu, t):
        """One snapshot in vector form under tracing (DEIM: the assembled
        functional itself)."""
        return jnp.asarray(self.assemble(mu=mu, t=t))

    def assemble_snapshot(self, mu, t):
        """Single snapshot, eager (reference: deim/deim.py:399-414)."""
        return np.asarray(self._assemble_snapshot_traced(mu, t))

    def assemble_snapshots_batch(self, mu, ts):
        """All time snapshots for one μ in a single jitted vmap call.

        Returns (dim, nt) — the reference's loop over ``fenics.assemble``
        collapsed into one device launch.
        """
        if not isinstance(self._batch_snapshots_fn, dict):
            self._batch_snapshots_fn = {}
        key = compute_dtype()
        if key not in self._batch_snapshots_fn:
            fn = lambda mu, t: self._assemble_snapshot_traced(mu, t)
            self._batch_snapshots_fn[key] = jax.jit(jax.vmap(fn, in_axes=(None, 0)))
        out = self._batch_snapshots_fn[key](self._mu_jnp(mu), _dtype_asarray(ts))
        return np.asarray(out).T

    # ------------------------------------------------------------------
    # Online interpolation
    # ------------------------------------------------------------------
    def compute_thetas(self, rhs):
        """Solve PᵀU θ = f|dofs (reference: deim/deim.py:477-493)."""
        return np.linalg.solve(self.PT_U, rhs)

    def _folded_serving(self):
        """f32 serving folds V·(PᵀU)⁻¹ into one float64-precomputed combine
        matrix: the explicit θ-solve (or inverse apply) in f32 loses
        eps·κ(PᵀU) digits, while the folded product applied to the gathered
        entries only pays the (much smaller) conditioning of the end-to-end
        interpolation map. Under this mode ``_thetas_traced`` returns the
        raw gathered entries and ``_combine_traced`` applies the folded
        matrix — both keyed off this single predicate so every engine pairs
        them consistently."""
        from ..dtypes import compute_dtype as _cd

        return (_cd() == jnp.float32
                and getattr(self, "PT_U_inv", None) is not None)

    def _combine_matrix(self, which=None):
        """Vf · (PᵀU)⁻¹ in float64, cached per basis ('fom'/'rom')."""
        key = self.FOM if (which is None or which == self.FOM) else self.ROM
        cache = getattr(self, "_combine_cache", None)
        if cache is None:
            cache = self._combine_cache = {}
        M = cache.get(key)
        if M is None:
            Vf = self.basis_fom if key == self.FOM else self.basis_rom
            M = np.asarray(Vf, np.float64) @ np.asarray(
                self.PT_U_inv, np.float64
            )
            cache[key] = M
        return M

    def _serving_combine(self, which=None):
        """The matrix that pairs with ``_thetas_traced``'s output: the
        folded combine under f32 serving, else the plain collateral basis
        (consumed by the table-building online engines)."""
        if self._folded_serving():
            return self._combine_matrix(which)
        return (self.basis_fom
                if (which is None or which == self.FOM)
                else self.basis_rom)

    def _entries_traced(self, mu, t):
        """Gathered local assembly at the interpolation dofs only — the
        quantity the folded combine matrices act on (windowed serving
        consumes these directly)."""
        return jnp.asarray(self.assemble(mu=mu, t=t, entries=self.dofs))

    def _thetas_traced(self, mu, t):
        """Interpolation coefficients θ(μ, t): gathered local assembly at
        the interpolation dofs + the small PᵀU solve (raw entries when the
        folded f32 serving path is active — see _folded_serving).
        Time-independent of state, so the online scan hoists these out of
        the loop (vmapped over the full time grid in one launch)."""
        fh_local = self._entries_traced(mu, t)
        if self._folded_serving():
            return fh_local
        return self._solve_thetas(fh_local)

    def _solve_thetas(self, fh_local):
        if self._folded_serving():
            return fh_local
        return solve_small(_dtype_asarray(self.PT_U), fh_local)

    def _combine_traced(self, thetas, which=None):
        """Σθᵢ·Vf[:, i] in the requested basis."""
        approximation = _dtype_asarray(self._serving_combine(which)) @ thetas
        if which is None or which == self.FOM:
            approximation = self._fix_boundary(approximation)
        return approximation

    def _interpolate_traced(self, mu, t, which=None):
        return self._combine_traced(self._thetas_traced(mu, t), which)

    def _fix_boundary(self, approximation):
        """Hook: MDEIM restores Dirichlet diagonals after interpolation
        (reference: deim/deim.py:447-451)."""
        return approximation

    def _interpolate(self, mu, t, which=None):
        """Interpolate the operator in vector form (reference:
        deim/deim.py:416-452)."""
        return np.asarray(self._interpolate_traced(self._mu_jnp(mu), t, which))

    def interpolate(self, mu, t, which=None):
        return self._interpolate(mu=mu, t=t, which=which)

    def interpolate_batch(self, mu, ts, which=None):
        """Interpolate over a full time grid in one jitted call."""
        if self._batch_interpolate_fn is None:
            self._batch_interpolate_fn = {}
        key = (which, compute_dtype())
        if key not in self._batch_interpolate_fn:
            fn = lambda mu, t: self._interpolate_traced(mu, t, which)
            self._batch_interpolate_fn[key] = jax.jit(
                jax.vmap(fn, in_axes=(None, 0))
            )
        out = self._batch_interpolate_fn[key](self._mu_jnp(mu), _dtype_asarray(ts))
        return np.asarray(out).T

    # ------------------------------------------------------------------
    # Projection onto the solution reduced basis
    # ------------------------------------------------------------------
    def project_basis(self, V):
        """VfN = Vᵀ Vfh (reference: deim/deim.py:495-515)."""
        self.basis_rom = np.matmul(np.asarray(V).T, self.basis_fom)
        self.N_V = np.asarray(V).shape[1]
        self._combine_cache = {}

    # ------------------------------------------------------------------
    # Online evaluation sweep
    # ------------------------------------------------------------------
    def evaluate(self, ts, num=None, mu_space=None):
        """Measure online interpolation errors over a μ-sample in ONE
        jitted (μ × t) launch per operator — the reference loops μ
        serially around per-t ``fenics.assemble`` calls
        (reference: deim/deim.py:226-261)."""
        if mu_space:
            space = mu_space
        else:
            assert num, "Provide number of samples to test"
            space = self.build_sampling_space(num=num)

        registered = [self.add_mu(step=Stage.ONLINE, mu=mu) for mu in space]
        if not registered:
            return
        names = sorted(registered[0][1].keys())
        batch = {
            k: _dtype_asarray(np.array([float(m[k]) for _i, m in registered]))
            for k in names
        }
        errors = self._evaluate_errors_batch(batch, _dtype_asarray(ts))
        for (mu_idx, _mu), err in zip(registered, np.asarray(errors)):
            self.errors_rom[mu_idx] = np.array(err)

    def _evaluate_errors_batch(self, mu_batch, ts):
        """(n_mu, nt) RMS interpolation errors, fully on device. Overrides
        of `_mask_evaluation_truth` / `_fix_boundary` must stay traceable."""
        if not isinstance(self._evaluate_batch_fn, dict):
            self._evaluate_batch_fn = {}
        key = compute_dtype()
        if key not in self._evaluate_batch_fn:

            def err_one(mu, t):
                truth = self._mask_evaluation_truth(
                    self._assemble_snapshot_traced(mu, t)
                )
                approx = self._interpolate_traced(mu, t, which=self.FOM)
                d = truth - approx
                return jnp.linalg.norm(d) / jnp.sqrt(float(d.shape[0]))

            over_t = jax.vmap(err_one, in_axes=(None, 0))
            self._evaluate_batch_fn[key] = jax.jit(
                jax.vmap(over_t, in_axes=(0, None))
            )
        return self._evaluate_batch_fn[key](mu_batch, ts)

    def _mask_evaluation_truth(self, truth):
        """Hook: MDEIM compares against the Dirichlet-consistent operator."""
        return truth

    # ------------------------------------------------------------------
    # Plots (reference: deim/deim.py:563-613)
    # ------------------------------------------------------------------
    def plot_errors(self, new=True, save=None, show=False):
        from ..utils.plotting import plot_deim_errors

        plot_deim_errors(self, save=save, show=show)

    def plot_spectrum(self, which="sigmas", save=None):
        from ..conventions import Stage
        from ..utils.plotting import plot_spectrum

        report = self.report[Stage.OFFLINE]
        plot_spectrum(
            report[self.SPECTRUM_MU],
            energy=report[self.ENERGY_MU] if which == "energy" else None,
            save=save,
            title=f"(M)DEIM {str(self.name).title()} spectrum decay",
        )
