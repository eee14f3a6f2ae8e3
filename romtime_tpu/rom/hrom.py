"""Hyper-reduced pipeline drivers: end-to-end orchestration + persistence +
reporting + S-ROM error certification.

Rebuild of the reference drivers (reference: src/romtime/rom/hrom.py:45-1182):
``HyperReducedOrderModelFixed`` (heat, fixed domain),
``HyperReducedOrderModelMoving`` (adds MDEIM convection) and
``HyperReducedPiston`` (full nonlinear pipeline with N-MDEIM trilinear).

Contract:
  setup() → setup_hyperreduction() → run_offline_rom() →
  run_offline_hyperreduction() → project_reductors() →
  evaluate_validation()/evaluate_online() → generate_summary()
with checkpoint/resume via ``start_from_existing_basis()``.
"""

import os
from collections import defaultdict
from functools import partial
from pathlib import Path

import numpy as np
import pandas as pd

from ..conventions import (
    Errors,
    OperatorType,
    ProbeLocations,
    ProblemType,
    RomParameters,
    Stage,
    StorageNames,
    Treewalk,
    TreewalkNonlinear,
)
from ..deim import (
    DiscreteEmpiricalInterpolation,
    MatrixDiscreteEmpiricalInterpolation,
)
from ..deim.nonlinear import MatrixDiscreteEmpiricalInterpolationNonlinear
from ..fom import (
    HeatEquationMovingSolver,
    HeatEquationSolver,
    OneDimensionalBurgers,
)
from ..utils import (
    compute_rom_difference,
    dump_csv,
    dump_json,
    dump_pickle,
    read_json,
    read_pickle,
    time_average,
)
from .rom import RomConstructor, RomConstructorMoving, RomConstructorNonlinear


class HyperReducedOrderModelFixed:
    """Heat, fixed domain (reference: rom/hrom.py:45-877)."""

    def __init__(
        self,
        grid: dict,
        fom_params: dict,
        rom_params: dict,
        deim_params: dict,
        mdeim_params: dict,
        models: dict,
        rnd=None,
    ) -> None:

        self.grid = grid
        self.fom_params = fom_params
        self.rom_params = rom_params
        self.deim_params = deim_params
        self.mdeim_params = mdeim_params
        self.models = models
        self.online_params = None
        self.rnd = rnd

        self.fom = None
        self.rom = None
        self.srom = None
        self.deim_rhs = None
        self.mdeim_mass = None
        self.mdeim_stiffness = None
        self.mdeim_convection = None
        self.mdeim_nonlinear = None
        self.mdeim_trilinear = None
        self.mdeim_trilinear_lifting = None

        self.deim_runned = False
        self.rom_runned = False

        self.errors = dict()
        self.summary_basis = defaultdict(dict)
        self._summary_basis = defaultdict(dict)
        self.summary_errors = defaultdict(dict)
        self.summary_errors_deim = defaultdict(dict)
        self.mu_space_deim = dict()
        self.summary_sigmas = defaultdict(dict)
        self.summary_energy = defaultdict(dict)

        self.validation_solutions = None
        # Sacrificial windowed serving configuration (the windowed analog
        # of the S-ROM — build_windowed_serving(srom_extra=...)).
        self.windows_srom = None

    # ------------------------------------------------------------------
    # Accessors
    # ------------------------------------------------------------------
    @property
    def mu_space(self):
        return self.rom.mu_space

    @property
    def basis(self):
        """Reduced Order Basis V."""
        return self.rom.basis

    # ------------------------------------------------------------------
    # Persistence (reference: rom/hrom.py:137-227)
    # ------------------------------------------------------------------
    def dump_mu_space(self, path=None):
        dump_json(path or StorageNames.MU_SPACE, self.mu_space)

    def dump_mu_space_deim(self, path=None):
        dump_json(path or StorageNames.MU_SPACE_DEIM, self.mu_space_deim)

    def dump_reduced_basis(self, path=None):
        dump_pickle(StorageNames.ROM, self.basis)
        if self.srom is not None and self.srom.basis is not None:
            dump_pickle(StorageNames.SROM, self.srom.basis)

    def dump_offline_snapshots(self, path=None):
        """Persist the retained per-μ FOM snapshot matrices (the input of
        ``build_windowed_serving`` — lets a resumed run re-search the
        (W, N) windowed operating point without repaying the FOM sweep)."""
        snaps = self.srom.offline_snapshots
        build = getattr(self.srom, "offline_snapshots_build", None)
        payload = {f"s{i}": np.asarray(s) for i, s in enumerate(snaps)}
        if build is not None:
            # Precision tag: resumed runs rebuild serving bases from
            # these, and an f32-swept stack must be distinguishable from
            # a certification-grade f64 one (docs/tpu_notes.md incident).
            payload["__build__"] = np.asarray(build)
        np.savez(path or StorageNames.SNAPSHOTS, **payload)

    def load_offline_snapshots(self, path=None):
        path = path or StorageNames.SNAPSHOTS
        if not os.path.exists(path):
            return False
        with np.load(path) as data:
            build = (str(data["__build__"]) if "__build__" in data
                     else None)
            n = len([k for k in data.files if k.startswith("s")])
            snaps = [data[f"s{i}"] for i in range(n)]
        self.srom.offline_snapshots = snaps
        self.srom.offline_snapshots_build = build
        return True

    def dump_nonlinear_basis(self, path=None):
        dump_pickle(
            f"basis_fom_n-mdeim_{OperatorType.TRILINEAR}.pkl",
            self.srom.basis_nonlinear,
        )

    def dump_validation_fom(self, path=None):
        dump_pickle(path or StorageNames.VALIDATION_SOLUTIONS,
                    self.validation_solutions)

    def dump_errors(self, which, path=None):
        path = Path(path or ".")
        if which in self.errors:
            pd.DataFrame(self.errors[which]).to_csv(path / f"errors_{which}.csv")
        else:
            raise Warning(f"These errors ({which}) have not been computed yet.")

    def dump_errors_deim(self, path=None):
        path = Path(path or ".")
        for operator, errors in self.summary_errors_deim.items():
            df = pd.DataFrame(errors)
            if not df.empty:
                df.to_csv(path / f"errors_deim_{operator.lower()}.csv")

    def dump_setup(self, path):
        out = dict()
        out["fom_params"] = self.fom_params.get("domain")
        out["mu_space"] = self.fom_params.get("grid_params")
        out["rom_params"] = self.rom_params
        out["deim_params"] = {
            k: v for k, v in self.deim_params.items() if k != RomParameters.TS
        }
        out["mdeim_params"] = {
            k: v for k, v in self.mdeim_params.items() if k != RomParameters.TS
        }
        out["online_params"] = self.online_params
        dump_json(path or StorageNames.SETUP, out)

    def load_validation_fom(self, path=None):
        try:
            self.validation_solutions = read_pickle(
                path or StorageNames.VALIDATION_SOLUTIONS
            )
        except FileNotFoundError:
            print("Validation solutions are not defined.")

    # ------------------------------------------------------------------
    # Setup (reference: rom/hrom.py:229-306)
    # ------------------------------------------------------------------
    def _create_fom(self):
        fom_params = self.fom_params
        return HeatEquationSolver(
            domain=fom_params.get("domain"),
            dirichlet=fom_params.get("dirichlet"),
            parameters=fom_params.get("parameters", None),
            forcing_term=fom_params.get("forcing_term"),
            u0=fom_params.get("u0"),
            exact_solution=fom_params.get("exact_solution", None),
        )

    def _create_rom(self, fom, name="ROM"):
        return RomConstructor(fom=fom, grid=self.grid, name=name)

    def setup(self):
        """Create FOM + ROM + S-ROM structures."""
        fom = self._create_fom()
        fom.setup()

        rnd = self.rnd
        rom = self._create_rom(fom, name="ROM")
        rom.setup(rnd=rnd)

        srom = self._create_rom(fom, name="S-ROM")
        srom.setup(rnd=rnd)

        self.rom = rom
        self.srom = srom
        self.fom = fom

    def setup_hyperreduction(self):
        """Instantiate the (M)DEIM objects (reference: rom/hrom.py:266-306)."""
        fom = self.fom
        grid = self.grid
        rnd = self.rnd

        deim_rhs = DiscreteEmpiricalInterpolation(
            name="RHS",
            assemble=fom.assemble_rhs,
            grid=grid,
            tree_walk_params=self.deim_params,
        )
        mdeim_mass = MatrixDiscreteEmpiricalInterpolation(
            name="Mass",
            assemble=fom.assemble_mass,
            grid=grid,
            tree_walk_params=self.mdeim_params,
        )
        mdeim_stiffness = MatrixDiscreteEmpiricalInterpolation(
            name="Stiffness",
            assemble=fom.assemble_stiffness,
            grid=grid,
            tree_walk_params=self.mdeim_params,
        )

        deim_rhs.setup(rnd=rnd)
        mdeim_mass.setup(rnd=rnd)
        mdeim_stiffness.setup(rnd=rnd)

        self.deim_rhs = deim_rhs
        self.mdeim_mass = mdeim_mass
        self.mdeim_stiffness = mdeim_stiffness

    # ------------------------------------------------------------------
    # Offline phases (reference: rom/hrom.py:308-448)
    # ------------------------------------------------------------------
    def run_offline_rom(self, mu_space=None, device_sweep=False, mesh=None):
        """Build the S-ROM basis, then truncate into the ROM.

        device_sweep runs the FOM μ-sweep as one batched (and, with a
        multi-device ``mesh``, sharded) device launch instead of the
        reference's serial loop — see RomConstructor.build_reduced_basis."""
        num_snapshots = self.rom_params[RomParameters.NUM_SNAPSHOTS]
        num_basis = self.rom_params.get(RomParameters.NUM_MU, None)

        tolerances = {
            RomParameters.TOL_TIME: self.rom_params.get(RomParameters.TOL_TIME,
                                                        None),
            RomParameters.TOL_MU: self.rom_params.get(RomParameters.TOL_MU, None),
        }

        srom = self.srom
        fom_solutions = srom.build_reduced_basis(
            num_snapshots=num_snapshots,
            mu_space=mu_space,
            num_basis=num_basis,
            tolerances=tolerances,
            device_sweep=device_sweep,
            mesh=mesh,
        )

        n = self.rom_params[RomParameters.SROM_TRUNCATE]
        rom = srom.truncate(n=n)
        rom.name = "ROM"
        self.rom = rom

        self.validation_solutions = fom_solutions
        self.rom_runned = True

    def run_offline_hyperreduction(self, mu_space=None, evaluate=True):
        """Collateral bases for the linear operators."""
        if self.models.get(OperatorType.STIFFNESS):
            self._run_mdeim(
                object=self.mdeim_stiffness,
                which=OperatorType.STIFFNESS,
                evaluate=evaluate,
                mu_space=mu_space,
            )
        if self.models.get(OperatorType.MASS):
            self._run_mdeim(
                object=self.mdeim_mass,
                which=OperatorType.MASS,
                evaluate=evaluate,
                mu_space=mu_space,
            )
        if self.models.get(OperatorType.RHS):
            self._run_deim(
                object=self.deim_rhs,
                which=OperatorType.RHS,
                evaluate=evaluate,
                mu_space=mu_space,
            )
        self.deim_runned = True

    def project_reductors(self):
        self.rom.project_reductors()
        self.srom.project_reductors()

    def build_windowed_serving(self, n_windows, num_basis, snapshots=None,
                               overlap=2, dump=True, srom_extra=None):
        """Driver-level windowed-serving build: per-window local bases +
        serving tensors on the ROM, persisted next to the basis pickles so
        ``start_from_existing_basis`` restores a serving-ready windowed
        configuration without repaying the offline phase (TPU-era
        extension; resume semantics follow reference rom/hrom.py:344-417).

        ``srom_extra``: also keep a SACRIFICIAL windowed configuration
        with ``num_basis + srom_extra`` modes per window (stored as
        ``self.windows_srom``). Per-window POD bases nest — the first
        ``num_basis`` columns of the enriched basis ARE the serving
        basis — so ONE (N+Δ)-mode projection loop yields both
        (WindowedServing.truncate), and the reference's S-ROM online
        estimator (reference rom/hrom.py:563-574, utils.py:173-212)
        carries over to the windowed engine verbatim: see
        ``estimate_batch``.
        """
        if snapshots is None:
            snapshots = self.srom.offline_snapshots
        if srom_extra:
            enriched = self.rom.build_windowed_serving(
                n_windows=n_windows, num_basis=num_basis + srom_extra,
                snapshots=snapshots, overlap=overlap,
            )
            self.windows_srom = enriched
            windows = enriched.truncate(num_basis)
            self.rom._set_serving_windows(windows)
            self.rom._online_fns = {}
            if dump:
                enriched.dump(StorageNames.WINDOWS_SROM)
        else:
            windows = self.rom.build_windowed_serving(
                n_windows=n_windows, num_basis=num_basis,
                snapshots=snapshots, overlap=overlap,
            )
        if dump:
            windows.dump(StorageNames.WINDOWS)
        return windows

    def auto_cell_wn(self, candidates, target_floor, overlap=2,
                     margin=1.0, path=None, expect_n_cells=None,
                     expect_edges=None):
        """Pick per-cell (W, N) serving shapes from the persisted μ-local
        training-trajectory cache (``StorageNames.MULOCAL_SNAPSHOTS``,
        written by ``build_mulocal_serving``).

        Computes each cell's predicted projection floor per candidate
        shape (windowed σ-tails of the cached trajectories — seconds,
        host-side) and returns ``(cell_wn, floors)`` ready for
        ``build_mulocal_serving(cell_wn=...)``. Turns the measured
        mixed-fleet design (three lower-Mach cells at W=50/N=32, the
        N-bound high-Mach cell at W=30/N=40 — docs/campaign_r03.jsonl)
        into a data-driven decision instead of a hand-set knob. No
        reference analog.
        """
        from .windowed import select_fleet_shapes

        path = path or StorageNames.MULOCAL_SNAPSHOTS
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"no μ-local snapshot cache at {path} — run "
                "build_mulocal_serving(snapshot_cache=True) first"
            )
        cell_snapshots = []
        with np.load(path) as d:
            n_cells = len(d["per_cell"])
            # Guard against a stale cache from a different cell
            # partition: selecting fleet shapes from the wrong cells
            # either crashes later (cell_wn length mismatch in
            # build_mulocal_serving) or silently serves shapes chosen
            # for other μ-bands.
            if expect_n_cells is not None and n_cells != int(expect_n_cells):
                raise ValueError(
                    f"μ-local snapshot cache at {path} holds {n_cells} "
                    f"cells but the current build wants "
                    f"{int(expect_n_cells)} — delete the cache (it is "
                    "from a different BENCH_MULOCAL partition) and "
                    "rebuild"
                )
            if expect_edges is not None:
                cached = np.asarray(d["edges"], np.float64)
                want = np.asarray(expect_edges, np.float64)
                if cached.shape != want.shape or not np.allclose(cached,
                                                                 want):
                    raise ValueError(
                        f"μ-local snapshot cache at {path} was built "
                        f"for cell edges {cached.tolist()} but the "
                        f"current build wants {want.tolist()} — delete "
                        "the stale cache and rebuild"
                    )
            for c in range(n_cells):
                snaps = [np.asarray(d[f"snap_{c}_{j}"], np.float64)
                         for j in range(int(d["per_cell"][c]))]
                cell_snapshots.append(snaps)
        return select_fleet_shapes(
            cell_snapshots, candidates, target_floor,
            overlap=overlap, margin=margin,
        )

    def build_mulocal_serving(self, n_cells, n_windows, num_basis,
                              snapshots_per_cell=10, overlap=2, dump=True,
                              rnd=None, local_nmdeim=True,
                              augment_global=False, augment_weight=1.0,
                              srom_extra=None, edges=None,
                              device_sweep=False, mesh=None,
                              cell_wn=None, snapshot_cache=None,
                              register=None):
        """μ-local windowed serving: K piston-Mach cells, each a full
        per-window local-basis configuration (rom/windowed.py
        ``MuLocalWindowed``), routed online by
        ``RomConstructorNonlinear.solve_batch_mulocal``.

        Rationale (measured, scripts/multimu_diag.py): a single box-wide
        windowed basis trades capacity against μ-diversity — 3 training
        trajectories serve a center μ at 8.8e-7 but corner μ at 2.9e-2;
        8 trajectories level the 16-μ max at 1.6e-3 but raise the
        projection floor to ~1.5e-4 everywhere. Mach-local cells give
        every served μ a basis trained on NEARBY trajectories —
        restoring ≤1e-6-class local accuracy at unchanged online cost
        (all cells share (W, N) and the compiled kernels).

        ``snapshots_per_cell`` must be large enough that every per-window
        POD mode is meaningful: 4 near-parallel in-cell trajectories
        drive the projection floor to ~1e-8 but the Galerkin in-span
        error STALLS at ~1e-5 (the σ-tail modes of a near-degenerate
        stack carry hyper-reduced dynamics noise), while 10 in-cell
        trajectories restore floor-tracking — measured center-μ 5.2e-7,
        low/mid-Mach rows 1.5e-7…4e-6 at W=30/N=40 (K=3-4 Mach cells).
        ``augment_global`` (appending the retained box-wide trajectories
        to every cell stack) is the legacy mitigation for under-trained
        cells — it dilutes the N=40 capacity (center-μ regresses to
        4.2e-5) and is off by default.

        Each cell trains ``snapshots_per_cell`` fresh f64 FOM solves at μ
        sampled inside the cell (with nonlinear-operator snapshot
        capture). Linear (M)DEIM collateral bases stay box-wide — those
        operator manifolds are μ-smooth (reference anchors reconstruct
        at 1e-11…1e-18, BASELINE.md) — but the TRILINEAR N-MDEIM is
        retrained per cell from the cell's captured nonlinear snapshots
        (``local_nmdeim``). The cell N-MDEIM exists only during the
        build — it is fully folded into the per-window T0 serving table,
        so routing swaps tables, never reductors.

        ``cell_wn``: optional per-cell ``[(W, N), ...]`` overriding the
        uniform ``n_windows``/``num_basis`` — a MIXED fleet. Measured
        rationale: the high-Mach corner's projection floor is a
        per-window CAPACITY limit (N=40 → ~5e-4, N=32 → ~1.1e-3 — even
        training AT the corner does not move it), while low/mid-Mach
        cells track 1e-7…1e-5 floors already at N=32, which serves
        ~1.4× faster (4 vs 5 LU panels, ×0.64 θ-dots). Keeping N=40
        only in the top Mach cell recovers the 15-μ certification tail
        at near-N=32 fleet throughput. Each distinct (W, N) group
        compiles its own kernel (tables are runtime jit arguments);
        routing is unchanged.

        ``srom_extra``: build each cell at ``num_basis + srom_extra``
        modes and derive the serving cell by nested truncation
        (WindowedServing.truncate — per-window POD bases nest, so the
        slice IS the N-mode build at no extra projection cost). The
        enriched builds are kept as per-cell SACRIFICIAL estimator
        references (``MuLocalWindowed.cells_srom``) for
        ``estimate_batch_mulocal`` — the reference's S-ROM online
        certification (rom/hrom.py:563-574) applied per cell. No
        reference analog for the routing itself (the reference serves
        one global basis, rom/rom.py:430-555).

        ``snapshot_cache``: persist the per-cell training trajectories
        (the dominant fleet-build cost — K×per_cell serial f64 FOM
        solves, ~20 min at the flagship config) to
        ``StorageNames.MULOCAL_SNAPSHOTS`` and reuse them when edges +
        per-cell counts match — so re-building the fleet at a DIFFERENT
        (W, N) (e.g. scanning cell_wn operating points) repays only the
        per-window POD/projection stage (seconds). Defaults to the
        ``dump`` flag.

        ``register``: phase-align (time-register) the listed cells
        (iterable of cell indices, or "all") — rom/registration.py. The
        cell's projection floor collapses when it is transport-bound
        (measured on the flagship high-Mach corner: W=100/N=40
        1.06e-4 → 4.2e-6): a scalar per-μ time dilation d(μ) (linear
        law, fitted from the cell's standard-clock trajectories) aligns
        the wave phases; the cell's training set is re-solved at
        dt·d(μ_j) (native f64 loop — seconds) and window-POD'd on the
        step-index-aligned clock, and lanes serve on their own dilated
        grids (certification resamples back, registration.
        resample_to_standard). Registered cells reject
        ``augment_global`` (box-wide trajectories live on the standard
        clock — mixing clocks breaks alignment).
        """
        from .pod import orth
        from .windowed import MuLocalWindowed
        from .rom import RomConstructorNonlinear as RCN
        from ..parameters import ParameterSampler

        rom = self.rom
        rnd = rnd if rnd is not None else np.random.RandomState(0)
        if edges is not None:
            # Custom Mach bin boundaries (e.g. finer cells at high Mach
            # where the Kolmogorov width decays slowly); must cover the
            # grid's admissible Mach range.
            edges = np.asarray(edges, np.float64)
            n_cells = len(edges) - 1
        else:
            edges = RCN.compute_piston_mach_number_space(
                self.grid, n_cells,
                mach_min=getattr(rom, "PISTON_MACH_MIN", None),
                mach_max=getattr(rom, "PISTON_MACH_MAX", None),
            )

        def cell_of(m):
            mach = RCN.compute_piston_mach_number(m)
            return int(np.clip(
                np.searchsorted(edges, mach, side="right") - 1,
                0, n_cells - 1,
            ))

        fom = self.fom
        # Retrain the SERVING N-MDEIM object: rom.mdeim_Nh is a COPY of
        # self.mdeim_trilinear (add_hyper_reductor copies, reference
        # rom/rom.py:213-251) — mutating the hrom-level original would be
        # a silent no-op for the serving tables (measured: the round-3
        # "local N-MDEIM" builds were bit-identical with k=48 and k=96
        # because of exactly that).
        tri = rom.mdeim_Nh
        local_tri = bool(local_nmdeim) and tri is not None \
            and getattr(self, "mdeim_trilinear", None) is not None
        register_soft = register == "auto"
        if register in ("all", "auto"):
            register = set(range(n_cells))
        elif register:
            register = {int(c) for c in register}
        else:
            register = set()
        if register and augment_global:
            raise ValueError(
                "register + augment_global: box-wide augmentation "
                "trajectories live on the standard clock and cannot "
                "join a phase-aligned window stack"
            )
        cell_snaps = {c: [] for c in range(n_cells)}
        cell_nl = {c: [] for c in range(n_cells)}
        cell_mus = {c: [] for c in range(n_cells)}
        per_cell = (list(snapshots_per_cell)
                    if np.ndim(snapshots_per_cell) else
                    [snapshots_per_cell] * n_cells)
        if len(per_cell) != n_cells:
            raise ValueError(
                f"snapshots_per_cell list ({len(per_cell)}) must match "
                f"n_cells ({n_cells})"
            )
        wanted = {c: int(per_cell[c]) for c in range(n_cells)}
        if snapshot_cache is None:
            snapshot_cache = bool(dump)
        cache_hit = False
        if snapshot_cache and os.path.exists(StorageNames.MULOCAL_SNAPSHOTS):
            try:
                with np.load(StorageNames.MULOCAL_SNAPSHOTS) as d:
                    # Trajectories carry their build precision: a cache
                    # written by an accelerator f32 sweep must never
                    # satisfy an f64 (certification-grade) build. Legacy
                    # caches without the field are treated as unknown
                    # and rebuilt (the 2026-08-18 incident: a TPU-f32
                    # cache silently fed an "f64" rebuild).
                    cached_build = str(d["build"]) if "build" in d else None
                    want_build = "device-f32" if device_sweep else "f64"
                    build_ok = cached_build == "f64" or \
                        cached_build == want_build
                    if (build_ok
                            and d["edges"].shape == edges.shape
                            and np.allclose(d["edges"], edges)
                            and [int(x) for x in d["per_cell"]]
                            == [wanted[c] for c in range(n_cells)]
                            and (not local_tri or bool(d["has_nl"]))
                            and (not register or "mu_keys" in d)
                            and "sampling" in d
                            and str(d["sampling"]) == "maximin"):
                        mu_keys = ([str(k) for k in d["mu_keys"]]
                                   if "mu_keys" in d else None)
                        for c in range(n_cells):
                            for j in range(wanted[c]):
                                cell_snaps[c].append(np.asarray(
                                    d[f"snap_{c}_{j}"], np.float64))
                                if local_tri:
                                    cell_nl[c].append(np.asarray(
                                        d[f"nl_{c}_{j}"], np.float64))
                            if mu_keys is not None and f"mus_{c}" in d:
                                cell_mus[c] = [
                                    dict(zip(mu_keys,
                                             (float(x) for x in row)))
                                    for row in d[f"mus_{c}"]
                                ]
                        cache_hit = True
                        wanted = {c: 0 for c in range(n_cells)}
            except Exception:
                cache_hit = False
        # Throttled progress over the per-cell FOM solves (the serial
        # host path only; the batched device sweep is one launch).
        import time as _time

        _total_solves = sum(wanted.values())
        _prog_state = {"done": 0, "start": _time.time(), "last": 0.0}

        def _report_cell_progress():
            _prog_state["done"] += 1
            now = _time.time()
            if (_prog_state["done"] == _total_solves
                    or now - _prog_state["last"] >= 5.0):
                _prog_state["last"] = now
                import os as _os
                import sys as _sys
                if _os.environ.get("ROMTIME_PROGRESS", "1") != "0":
                    print(
                        f"[mulocal FOM sweep] {_prog_state['done']}/"
                        f"{_total_solves} "
                        f"(+{now - _prog_state['start']:.1f}s)",
                        file=_sys.stderr, flush=True,
                    )

        # Narrow high-Mach cells have a tiny preimage under the uniform
        # μ sampler — grow the candidate pool geometrically rather than
        # fixing one budget.
        # Candidate collection: oversample each cell ~8×, then pick a
        # space-filling (greedy maximin) subset. A Mach cell is a thin
        # 2-D band in the 3-D (a0, ω, δ) box — first-come random picks
        # leave holes that the registration law then extrapolates into
        # (measured: a held-out μ in such a hole mispredicts its
        # dilation by 0.03 and serves at 1.5e-4 while its in-hull
        # neighbours serve at 2e-7).
        oversample = 8
        cand = {c: [] for c in range(n_cells)}
        need = {c: n for c, n in wanted.items()}
        pool_size, attempts = int(2e4), 0
        pool = iter(ParameterSampler(self.grid, n_iter=pool_size,
                                     random_state=rnd))
        while any(len(cand[c]) < oversample * need[c]
                  for c in range(n_cells) if need[c]):
            try:
                m = dict(next(pool))
            except StopIteration:
                if all(len(cand[c]) >= need[c] for c in range(n_cells)):
                    break  # enough to select from, if not to oversample
                attempts += 1
                if attempts > 4:
                    empty = [c for c in range(n_cells)
                             if len(cand[c]) < need[c]]
                    raise ValueError(
                        f"could not fill Mach cells {empty} (edges "
                        f"{np.round(edges, 4).tolist()}) from the μ grid "
                        f"— cells too narrow for the admissible range?"
                    )
                # Fresh draws (attempt-derived seed), larger pool — a
                # restart from the SAME state would re-offer already-used
                # candidates as duplicates.
                pool_size *= 10
                pool = iter(ParameterSampler(
                    self.grid, n_iter=pool_size,
                    random_state=np.random.RandomState(
                        rnd.randint(2**31 - 1)
                    ),
                ))
                continue
            c = cell_of(m)
            if need.get(c, 0) and len(cand[c]) < oversample * need[c]:
                cand[c].append(m)

        spans = {}
        for k, dist in self.grid.items():
            sup = dist.support()
            span = float(max(sup)) - float(min(sup))
            # Degenerate (point-mass) uniform dists report NaN support
            # — a NaN span poisons every maximin distance (argmax of
            # all-NaN picks index 0 forever: the 2026-08-19 incident
            # trained a cell on 12 copies of ONE μ).
            spans[k] = span if np.isfinite(span) and span > 0 else 1.0

        def maximin_subset(pool_c, k):
            """Greedy maximin in range-normalized μ-space, seeded at the
            point nearest the candidate centroid (deterministic)."""
            X = np.array([[float(m[key]) / spans[key]
                           for key in sorted(spans)] for m in pool_c])
            X = np.where(np.isfinite(X), X, 0.0)
            picked = [int(np.argmin(np.linalg.norm(
                X - X.mean(axis=0), axis=1)))]
            dists = np.linalg.norm(X - X[picked[0]], axis=1)
            while len(picked) < min(k, len(pool_c)):
                dists[picked] = -1.0  # never re-pick
                nxt = int(np.argmax(dists))
                picked.append(nxt)
                dists = np.minimum(dists,
                                   np.linalg.norm(X - X[nxt], axis=1))
            while len(picked) < k:  # pool smaller than k: cycle
                picked.append(picked[len(picked) % len(pool_c)])
            return [pool_c[i] for i in picked]

        for c in range(n_cells):
            if not need[c]:
                continue
            chosen = maximin_subset(cand[c], need[c])
            if (len(cand[c]) >= need[c]
                    and len({tuple(sorted(m.items()))
                             for m in chosen}) < len(chosen)):
                raise AssertionError(
                    f"cell {c}: duplicate training μ selected from "
                    f"{len(cand[c])} distinct candidates — maximin "
                    "selection degenerated"
                )
            for m in chosen:
                cell_mus[c].append(dict(m))
                if device_sweep:
                    # Defer: collect the cell's μ, solve the whole fleet
                    # in ONE vmapped/sharded launch below
                    # (parallel/sweep.py — the same path as
                    # build_reduced_basis(device_sweep=True); cells are
                    # embarrassingly parallel over the mesh's μ axis).
                    cell_snaps[c].append(dict(m))
                else:
                    fom.setup()
                    fom.update_parametrization(m)
                    fom.solve()
                    cell_snaps[c].append(
                        np.asarray(fom.solutions.snapshots, np.float64)
                    )
                    if local_tri:
                        cell_nl[c].append(list(fom.nonlinear_snapshots))
                    _report_cell_progress()
                wanted[c] -= 1

        if device_sweep and not cache_hit:
            import jax
            import jax.numpy as jnp

            from ..dtypes import compute_dtype_scope
            from ..parallel.sweep import solve_fom_batch, solve_fom_sharded

            order = [(c, j) for c in range(n_cells)
                     for j in range(len(cell_snaps[c]))]
            mus_flat = [cell_snaps[c][j] for c, j in order]
            if fom.is_setup is False:
                fom.setup()
            # Only the SWEEP runs on the accelerator in f32 — the
            # per-window POD/projection stages below must stay host f64
            # (certification precision; f64 on TPU is emulated).
            accel = jax.devices()[0]
            sweep_dtype = (jnp.float32 if accel.platform != "cpu"
                           else None)
            build_label = "device-f32" if sweep_dtype is not None else "f64"
            with jax.default_device(accel), compute_dtype_scope(
                    sweep_dtype):
                if mesh is not None and mesh.devices.size > 1:
                    outs = solve_fom_sharded(fom, mus_flat, mesh=mesh)
                else:
                    outs = solve_fom_batch(fom, mus_flat)
            for b, (c, j) in enumerate(order):
                uh = np.asarray(outs["uh"][b], np.float64).T
                if "uh_lo" in outs:
                    uh = uh + np.asarray(outs["uh_lo"][b], np.float64).T
                cell_snaps[c][j] = uh
                if local_tri:
                    cell_nl[c].append(
                        np.asarray(outs["nonlinear_data"][b], np.float64)
                    )

        if snapshot_cache and not cache_hit:
            payload = {
                "edges": np.asarray(edges),
                "per_cell": np.asarray([int(per_cell[c])
                                        for c in range(n_cells)]),
                "has_nl": np.asarray(bool(local_tri)),
                "build": np.asarray(
                    build_label if device_sweep else "f64"
                ),
                "sampling": np.asarray("maximin"),
            }
            mu_keys = sorted(cell_mus[0][0]) if cell_mus[0] else None
            if mu_keys is not None:
                # Training μ's ride the cache so a warm rebuild can fit
                # registration (dilation) laws without re-solving.
                payload["mu_keys"] = np.array(mu_keys)
                for c in range(n_cells):
                    payload[f"mus_{c}"] = np.array(
                        [[float(m[k]) for k in mu_keys]
                         for m in cell_mus[c]], np.float64
                    )
            for c in range(n_cells):
                for j, snap in enumerate(cell_snaps[c]):
                    payload[f"snap_{c}_{j}"] = np.asarray(snap, np.float64)
                if local_tri:
                    for j, rows in enumerate(cell_nl[c]):
                        payload[f"nl_{c}_{j}"] = np.asarray(rows,
                                                            np.float64)
            np.savez(StorageNames.MULOCAL_SNAPSHOTS, **payload)

        # Diversity augmentation: append the retained box-wide offline
        # trajectories to every cell's window-POD stack. Measured
        # (scripts/multimu_diag.py): cell-only training drives the
        # projection floor to ~1e-8 but the Galerkin in-span error
        # stalls at ~1e-5 — the narrow band lacks the closure-relevant
        # mode diversity a box-wide stack provides (box-wide-3 training
        # reaches 8.8e-7 in-span at the box center with a 10× WORSE
        # floor). Mixing both recovers the diversity while the local
        # trajectories keep the floor low.
        aug = []
        if augment_global:
            pool_snaps = self.srom.offline_snapshots
            m = len(pool_snaps) if augment_global is True \
                else min(int(augment_global), len(pool_snaps))
            # Mach-spread subset: the retained trajectories are
            # Mach-stratified (build_sampling_space sorts by Mach), so an
            # even index stride keeps the spread.
            idx = np.unique(np.linspace(0, len(pool_snaps) - 1, m)
                            .round().astype(int)) if m else []
            aug = [augment_weight * np.asarray(pool_snaps[i], np.float64)
                   for i in idx]

        keep_tri = self.rom_params.get(RomParameters.NMDEIM_SIZE)
        prev = rom.windows
        cells = []
        cells_srom = [] if srom_extra else None
        wn = (list(cell_wn) if cell_wn is not None
              else [(n_windows, num_basis)] * n_cells)
        if len(wn) != n_cells:
            raise ValueError(
                f"cell_wn ({len(wn)}) must match n_cells ({n_cells})"
            )
        try:
            for c in range(n_cells):
                w_c, n_c = int(wn[c][0]), int(wn[c][1])
                n_build = n_c + (srom_extra or 0)
                snaps_c, nl_c, law = cell_snaps[c], cell_nl[c], None
                if c in register:
                    # Phase alignment (rom/registration.py): fit the
                    # dilation law on the standard-clock trajectories,
                    # then RE-SOLVE the cell's training set on per-μ
                    # dilated grids (exact step-index alignment, no
                    # snapshot interpolation) — the native f64 loop
                    # makes this seconds per cell.
                    from .registration import fit_dilation_law

                    if len(cell_mus[c]) != len(snaps_c):
                        raise ValueError(
                            f"register cell {c}: training μ's are "
                            "unavailable (stale snapshot cache without "
                            "mu payload?) — delete "
                            f"{StorageNames.MULOCAL_SNAPSHOTS} and "
                            "rebuild"
                        )
                    try:
                        law, dils = fit_dilation_law(snaps_c, cell_mus[c])
                    except ValueError:
                        # register="auto": a cell whose phase spread
                        # exceeds the scalar-dilation search (measured:
                        # the lowest-Mach cell's 1/a0 spread) builds
                        # unregistered — its floors are already
                        # 1e-7-class without alignment.
                        if not register_soft:
                            raise
                        import sys as _sys

                        print(f"[register] cell {c}: no scalar "
                              "phase alignment — building unregistered",
                              file=_sys.stderr, flush=True)
                        law = None
                    if law is not None:
                        snaps_c, nl_c = self._solve_registered_cell(
                            cell_mus[c], dils, local_tri
                        )
                if local_tri:
                    # Hierarchical POD of the cell's nonlinear-operator
                    # rows (same recipe as build_reduced_basis: per-μ
                    # σ-weighted time stage, then the μ stage).
                    stages = []
                    for nl_rows in nl_c:
                        nl = np.array(nl_rows[1:], np.float64).T
                        b, s, _e = orth(nl)
                        stages.append(b * s[: b.shape[1]])
                    basis_nl, _s, _e = orth(np.hstack(stages),
                                            normalize=False)
                    tri.load_fom_basis(basis=basis_nl, keep=keep_tri)
                    if hasattr(rom, "_trilinear_table_cache"):
                        rom._trilinear_table_cache = None
                win = rom.build_windowed_serving(
                    n_windows=w_c, num_basis=n_build,
                    snapshots=snaps_c + aug, overlap=overlap,
                )
                win.dilation = law
                if srom_extra:
                    cells_srom.append(win)
                    win = win.truncate(n_c)
                cells.append(win)
        finally:
            rom._set_serving_windows(prev)
            if local_tri:
                # Restore the box-wide trilinear collateral basis (its
                # dump is authoritative — _run_mdeim_nonlinear persists
                # it) and its projection onto the global basis.
                tri.load_fom_basis(keep=keep_tri)
                if rom.basis is not None:
                    tri.project_basis(V=rom.basis)
                if hasattr(rom, "_trilinear_table_cache"):
                    rom._trilinear_table_cache = None

        ml = MuLocalWindowed(edges=np.asarray(edges), cells=cells,
                             cells_srom=cells_srom)
        rom.mulocal = ml
        if dump:
            ml.dump(StorageNames.WINDOWS_MULOCAL)
        return ml

    def _solve_registered_cell(self, mus, dils, want_nl):
        """Re-solve a registered cell's training set on per-μ dilated
        time grids (dt_j = d_j·dt over the same nt steps — the serving
        clock, rom/registration.py). Always the certification-grade f64
        host path (the native C++ loop when eligible — seconds per
        cell); per-μ dt does not fit the shared-dt batched device sweep.
        """
        fom = self.fom
        t_orig = fom.domain[fom.T]
        snaps, nls = [], []
        try:
            for m, d in zip(mus, dils):
                fom.domain[fom.T] = float(t_orig) * float(d)
                # dt is a trace-time constant of the jitted fallback
                # loop — drop compiled entries so each dilation traces
                # fresh (the native path reads dt per call).
                fom._solve_jit = {}
                fom.setup()
                fom.update_parametrization(m)
                fom.solve()
                snaps.append(
                    np.asarray(fom.solutions.snapshots, np.float64)
                )
                if want_nl:
                    nls.append(list(fom.nonlinear_snapshots))
        finally:
            fom.domain[fom.T] = t_orig
            fom._solve_jit = {}
        return snaps, nls

    def build_windowed_srom(self, n_windows, num_basis, snapshots=None,
                            overlap=2, dump=True):
        """Build ONLY the sacrificial windowed configuration (estimator
        reference), preserving the ROM's serving configuration — used to
        retrofit certification onto a warm-resumed serving directory."""
        if snapshots is None:
            snapshots = self.srom.offline_snapshots
        current = self.rom.windows
        self.windows_srom = self.rom.build_windowed_serving(
            n_windows=n_windows, num_basis=num_basis,
            snapshots=snapshots, overlap=overlap,
        )
        self.rom.windows = current
        self.rom._online_fns = {}
        self.rom._windowed_lanes_tbl = {}
        self.rom._windowed_pallas_tbl = None
        if dump:
            self.windows_srom.dump(StorageNames.WINDOWS_SROM)
        return self.windows_srom

    # ------------------------------------------------------------------
    # Resume from disk (reference: rom/hrom.py:344-417)
    # ------------------------------------------------------------------
    def start_from_existing_basis(self):
        self.load_validation_fom()

        try:
            mu_space = read_json(StorageNames.MU_SPACE)
        except FileNotFoundError:
            mu_space = {
                Stage.OFFLINE: list(),
                Stage.ONLINE: list(),
                Stage.VALIDATION: list(),
            }

        srom = self.srom
        basis_srom = read_pickle(StorageNames.SROM)
        N_srom = self.rom_params.get(RomParameters.SROM_KEEP)
        if N_srom is not None:
            basis_srom = basis_srom[:, :N_srom]

        srom.load_from_basis(basis=basis_srom, mu_space=mu_space)
        self.rom = srom.truncate(self.rom_params[RomParameters.SROM_TRUNCATE])

        deims, operators = self._resume_reductors()
        for reductor, which in zip(deims, operators):
            if reductor is None:
                continue
            for _rom in (self.rom, self.srom):
                _rom.add_hyper_reductor(reductor=reductor, which=which)

        # Windowed serving configuration, when one was persisted: restore
        # it bit-compatibly so the flagship serving path needs no offline
        # rebuild (the W×operators projection loop) after a restart.
        if os.path.exists(StorageNames.WINDOWS):
            self.rom.load_windowed_serving(StorageNames.WINDOWS)
        if os.path.exists(StorageNames.WINDOWS_SROM):
            from .windowed import WindowedServing

            self.windows_srom = WindowedServing.load(
                StorageNames.WINDOWS_SROM
            )
        if os.path.exists(StorageNames.WINDOWS_MULOCAL):
            from .windowed import MuLocalWindowed

            self.rom.mulocal = MuLocalWindowed.load(
                StorageNames.WINDOWS_MULOCAL
            )
        # Retained FOM snapshots (for re-building windowed bases at a
        # different (W, N) without the FOM sweep).
        self.load_offline_snapshots()

    def _resume_reductors(self):
        self.deim_rhs.load_fom_basis()
        self.mdeim_mass.load_fom_basis()
        self.mdeim_stiffness.load_fom_basis()
        operators = [OperatorType.RHS, OperatorType.MASS, OperatorType.STIFFNESS]
        deims = [self.deim_rhs, self.mdeim_mass, self.mdeim_stiffness]
        return deims, operators

    # ------------------------------------------------------------------
    # Evaluation (reference: rom/hrom.py:450-626)
    # ------------------------------------------------------------------
    def solve(self, mu, step):
        self.rom.solve(mu, step)

    def evaluate_validation(self):
        """(H)ROM evaluation on the training parameter set."""
        space = self.rom.mu_space[Stage.OFFLINE]
        self._evaluate(which=Stage.VALIDATION, mu_space=space)

    def evaluate_online(self, params, rnd=None):
        """(H)ROM evaluation on a fresh random parameter set."""
        self.online_params = params
        num = params["num"]
        space = self.rom.build_sampling_space(num=num, rnd=rnd)
        self._evaluate(which=Stage.ONLINE, mu_space=space)

    def _evaluate(self, which, mu_space=None):
        fom = self.fom
        rom = self.rom
        srom = self.srom

        rom_fom_errors = dict()
        mu_space = list(mu_space)

        compute_error = rom._compute_error
        for mu in mu_space:
            idx_mu = rom.solve(mu=mu, step=which)
            srom.solve(mu=mu, step=which)

            rom.solutions.to_pickle(f"solutions_rom_{rom.N}_{which}_{idx_mu}")
            srom.solutions.to_pickle(f"solutions_srom_{srom.N}_{which}_{idx_mu}")

            # ----------------------------------------------------------
            # FOM truth
            if which == Stage.VALIDATION:
                uh_fom = self.validation_solutions[idx_mu]
            else:
                fom.setup()
                fom.update_parametrization(mu)
                fom.solve()
                uh_fom = fom.solutions.fom

            uh_rom = rom.solutions.fom
            uh_srom = srom.solutions.fom

            nt = uh_fom.shape[1]
            errors_rom = np.array(
                [compute_error(uh_fom[:, i], uh_rom[:, i]) for i in range(nt)]
            )
            errors_srom = np.array(
                [compute_error(uh_fom[:, i], uh_srom[:, i]) for i in range(nt)]
            )

            # ----------------------------------------------------------
            # S-ROM estimator (reference: rom/hrom.py:563-574)
            uNs = rom.solutions.rom
            uNs_srom = srom.solutions.rom
            V_srom = srom.basis

            estimator = np.array(
                [
                    compute_rom_difference(
                        uN=uNs[:, i], uN_srom=uNs_srom[:, i], V_srom=V_srom
                    )
                    for i in range(uNs.shape[1])
                ]
            )

            rom_fom_errors[idx_mu] = {
                Errors.ESTIMATOR: estimator,
                Errors.ROM: errors_rom,
                Errors.SACRIFICIAL: errors_srom,
            }

            self._postprocess_mu(which, idx_mu, mu, uh_fom)

        # With a manufactured solution available, also keep the per-μ
        # exact-solution error series the ROM collected (the reference
        # points at the never-populated errors_rom here — drift,
        # rom/hrom.py:623-626).
        if fom.exact_solution is None:
            self.errors[which] = rom_fom_errors
        else:
            self.errors[which] = dict(rom.errors)
        self.errors[f"{which}-vs-fom"] = rom_fom_errors

    def _postprocess_mu(self, which, idx_mu, mu, uh_fom):
        """Hook: probe/mass-conservation dumps for the piston driver."""
        pass

    def estimate_batch(self, mus, step=Stage.ONLINE, engine=None):
        """Batched S-ROM error certification: one lane-batched online sweep
        per ROM, estimator computed entirely in reduced space.

        The reference certifies online solves one μ at a time
        (rom/hrom.py:563-574) by reconstructing
        ``V_srom @ (uN_srom - pad(uN))`` in R^Nh and taking its RMS norm
        (utils.py:173-212). POD bases have orthonormal columns, so that
        reconstruction norm equals the coefficient-difference norm — the
        batched estimator therefore never materializes an Nh-sized array:
        per (μ, t) it is ``‖uN_srom - pad(uN)‖₂ / √Nh``, an O(N_hat) lane
        op over the whole batch.

        ``engine="windowed"`` certifies the time-windowed local-basis
        serving configuration (the flagship operating point): the second
        sweep runs through the sacrificial windowed configuration built by
        ``build_windowed_serving(srom_extra=...)``. Per-window POD bases
        nest, so the same coefficient-difference norm applies per window.

        Returns a dict with ``estimator`` (B, nt) per-step series,
        ``average`` (B,) trapezoid time-averages, plus both sweeps' raw
        outputs (reduced coefficients + end-point probes). Also records the
        per-μ series under ``self.errors[f"{step}-estimator"]``.
        """
        rom, srom = self.rom, self.srom
        if engine == "windowed":
            if rom.windows is None or self.windows_srom is None:
                raise ValueError(
                    "windowed estimation needs build_windowed_serving("
                    "..., srom_extra=N) first"
                )
            out_rom = rom.solve_batch(mus, step=step, mode="reduced",
                                      engine="windowed")
            serving = rom.windows
            rom.windows = self.windows_srom
            rom._online_fns = {}
            rom._windowed_lanes_tbl = {}
            rom._windowed_pallas_tbl = None
            try:
                out_srom = rom.solve_batch(mus, step=step, mode="reduced",
                                           engine="windowed")
            finally:
                rom.windows = serving
                rom._online_fns = {}
                rom._windowed_lanes_tbl = {}
                rom._windowed_pallas_tbl = None
            Nh = serving.Vs.shape[1]
        else:
            out_rom = rom.solve_batch(mus, step=step, mode="reduced")
            out_srom = srom.solve_batch(mus, step=step, mode="reduced")
            Nh = srom.basis.shape[0]

        uN = out_rom["uN"]  # (B, nt, N)
        diff = out_srom["uN"].copy()  # (B, nt, N_hat)
        diff[..., : uN.shape[-1]] -= uN
        estimator = np.linalg.norm(diff, axis=-1) / np.sqrt(Nh)  # (B, nt)

        ts = np.asarray(out_rom["t"])
        average = np.array([time_average(ts, e) for e in estimator])

        self.errors[f"{step}-estimator"] = {
            idx: estimator[idx] for idx in range(len(mus))
        }
        return {
            Errors.ESTIMATOR: estimator,
            Errors.AVERAGE_ESTIMATOR: average,
            "rom": out_rom,
            "srom": out_srom,
        }

    def estimate_batch_mulocal(self, mus, step=Stage.ONLINE):
        """S-ROM certification of the μ-local windowed serving: each μ is
        routed to its Mach cell and estimated against that CELL's nested
        sacrificial configuration (``MuLocalWindowed.cells_srom``, built
        by ``build_mulocal_serving(srom_extra=...)``). Reference online
        certification semantics (rom/hrom.py:563-574) applied per cell —
        a box-wide sacrificial reference would dominate the estimate with
        basis mismatch rather than ROM error once serving is cell-local.

        Returns the ``estimate_batch`` payload with per-μ rows merged
        back in input order."""
        rom = self.rom
        ml = rom.mulocal
        if ml is None or ml.cells_srom is None:
            raise ValueError(
                "μ-local estimation needs build_mulocal_serving("
                "..., srom_extra=N) first"
            )
        n = len(mus)
        prev_srom = self.windows_srom

        def run_cell(c, sub):
            self.windows_srom = ml.cells_srom[c]
            out = self.estimate_batch(sub, step=step, engine="windowed")
            return {
                Errors.ESTIMATOR: out[Errors.ESTIMATOR],
                Errors.AVERAGE_ESTIMATOR: out[Errors.AVERAGE_ESTIMATOR],
            }

        try:
            merged = rom.route_mulocal(mus, run_cell)
        finally:
            self.windows_srom = prev_srom
            rom._online_fns = {}
        self.errors[f"{step}-estimator"] = {
            idx: merged[Errors.ESTIMATOR][idx] for idx in range(n)
        }
        return merged

    # ------------------------------------------------------------------
    # DEIM evaluation
    # ------------------------------------------------------------------
    def evaluate_deim(self):
        mu_space = self.mu_space[Stage.OFFLINE]
        for obj in (self.deim_rhs, self.mdeim_mass, self.mdeim_stiffness,
                    self.mdeim_convection, self.mdeim_trilinear_lifting,
                    self.mdeim_trilinear):
            if obj is not None:
                self.evaluate_deim_model(object=obj, mu_space=mu_space)

    def evaluate_deim_model(self, object, mu_space):
        params = object.tree_walk_params
        n_online = params.get(RomParameters.NUM_ONLINE, None)
        timesteps = params[RomParameters.TS]
        object.evaluate(ts=timesteps, num=n_online, mu_space=mu_space)

    # ------------------------------------------------------------------
    # DEIM runners (reference: rom/hrom.py:811-876)
    # ------------------------------------------------------------------
    def _run_deim(self, object, which, mu_space, is_mdeim=False, evaluate=False):
        object.run(mu_space=mu_space)
        object.dump_fom_basis()

        if evaluate:
            self.evaluate_deim_model(object=object, mu_space=mu_space)

        for rom in (self.rom, self.srom):
            rom.add_hyper_reductor(reductor=object, which=which)

    def _run_mdeim(self, object, which, mu_space, evaluate=False):
        self._run_deim(
            object=object, which=which, mu_space=mu_space,
            evaluate=evaluate, is_mdeim=True,
        )

    # ------------------------------------------------------------------
    # Summaries (reference: rom/hrom.py:683-809)
    # ------------------------------------------------------------------
    def generate_summary(self):
        summary_basis = self._summary_basis
        summary_sig = self.summary_sigmas
        summary_energy = self.summary_energy
        summary_errors_deim = self.summary_errors_deim
        mu_space_deim = self.mu_space_deim

        OFFLINE = Stage.OFFLINE
        rom = self.rom
        report = rom.report[OFFLINE]

        BASIS_WALK = Treewalk.BASIS_AFTER_WALK
        BASIS_FINAL = Treewalk.BASIS_FINAL
        SPECTRUM_MU = Treewalk.SPECTRUM_MU
        ENERGY_MU = Treewalk.ENERGY_MU

        RB = OperatorType.REDUCED_BASIS
        summary_basis[RB][BASIS_WALK] = report[BASIS_WALK]
        summary_basis[RB][BASIS_FINAL] = report[BASIS_FINAL]
        summary_sig[RB][SPECTRUM_MU] = report[SPECTRUM_MU]
        summary_energy[RB][ENERGY_MU] = report[ENERGY_MU]

        TRI = OperatorType.TRILINEAR
        summary_basis[TRI][BASIS_WALK] = report[TreewalkNonlinear.BASIS_AFTER_WALK]
        summary_basis[TRI][BASIS_FINAL] = report[TreewalkNonlinear.BASIS_FINAL]
        summary_sig[TRI][SPECTRUM_MU] = report[TreewalkNonlinear.SPECTRUM_MU]
        summary_energy[TRI][ENERGY_MU] = report[TreewalkNonlinear.ENERGY_MU]

        generate_operator_summary = partial(
            self.generate_operator_summary,
            basis=summary_basis,
            sigma=summary_sig,
            energy=summary_energy,
            errors_deim=summary_errors_deim,
            mu_space_deim=mu_space_deim,
        )

        for operator in (self.deim_rhs, self.mdeim_mass, self.mdeim_stiffness,
                         self.mdeim_convection, self.mdeim_trilinear_lifting):
            if operator is not None:
                generate_operator_summary(operator)

        self.summary_basis = pd.DataFrame(summary_basis).T

        summary_errors = defaultdict(dict)
        for idx, error in rom.errors.items():
            summary_errors[idx]["mean"] = np.mean(error)
            summary_errors[idx]["median"] = np.median(error)
            summary_errors[idx]["max"] = np.max(error)
            summary_errors[idx]["min"] = np.min(error)

        self.summary_errors = pd.DataFrame(summary_errors).T

    @staticmethod
    def generate_operator_summary(operator, basis, sigma, energy, errors_deim,
                                  mu_space_deim):
        BASIS_WALK = Treewalk.BASIS_AFTER_WALK
        BASIS_FINAL = Treewalk.BASIS_FINAL
        SPECTRUM_MU = Treewalk.SPECTRUM_MU
        ENERGY_MU = Treewalk.ENERGY_MU
        NAME = operator.name
        report = operator.report[Stage.OFFLINE]

        basis[NAME][BASIS_WALK] = report[BASIS_WALK]
        basis[NAME][BASIS_FINAL] = report[BASIS_FINAL]
        sigma[NAME][SPECTRUM_MU] = report[SPECTRUM_MU]
        energy[NAME][ENERGY_MU] = report[ENERGY_MU]

        errors_deim[NAME] = dict(operator.errors_rom)
        mu_space_deim[NAME] = operator.mu_space


class HyperReducedOrderModelMoving(HyperReducedOrderModelFixed):
    """Adds MDEIM convection for the ALE heat path
    (reference: rom/hrom.py:879-976)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.deim_moving_runned = False

    def _create_fom(self):
        fom_params = self.fom_params
        return HeatEquationMovingSolver(
            domain=fom_params.get("domain"),
            dirichlet=fom_params.get("dirichlet"),
            parameters=fom_params.get("parameters", None),
            forcing_term=fom_params.get("forcing_term"),
            u0=fom_params.get("u0"),
            exact_solution=fom_params.get("exact_solution", None),
            Lt=fom_params.get("Lt"),
            dLt_dt=fom_params.get("dLt_dt"),
        )

    def _create_rom(self, fom, name="ROM"):
        return RomConstructorMoving(fom=fom, grid=self.grid, name=name)

    def setup_hyperreduction(self):
        super().setup_hyperreduction()

        mdeim_convection = MatrixDiscreteEmpiricalInterpolation(
            name=OperatorType.CONVECTION,
            assemble=self.fom.assemble_convection,
            grid=self.grid,
            tree_walk_params=self.mdeim_params,
        )
        mdeim_convection.setup(rnd=self.rnd)
        self.mdeim_convection = mdeim_convection

    def run_offline_hyperreduction(self, mu_space=None, evaluate=True):
        super().run_offline_hyperreduction(mu_space=mu_space, evaluate=evaluate)

        if self.models.get(OperatorType.CONVECTION):
            self._run_mdeim(
                object=self.mdeim_convection,
                mu_space=mu_space,
                evaluate=evaluate,
                which=OperatorType.CONVECTION,
            )
        self.deim_moving_runned = True

    def _resume_reductors(self):
        deims, operators = super()._resume_reductors()
        self.mdeim_convection.load_fom_basis()
        deims.append(self.mdeim_convection)
        operators.append(OperatorType.CONVECTION)
        return deims, operators


class HyperReducedPiston(HyperReducedOrderModelFixed):
    """Full nonlinear pipeline: ROM + S-ROM pair, 4 MDEIMs + DEIM-RHS +
    N-MDEIM trilinear (reference: rom/hrom.py:979-1182)."""

    def __init__(
        self,
        grid: dict,
        fom_params: dict,
        rom_params: dict,
        deim_params: dict,
        mdeim_params: dict,
        mdeim_nonlinear_params: dict,
        models: dict,
        rnd=None,
    ) -> None:
        super().__init__(
            grid=grid,
            fom_params=fom_params,
            rom_params=rom_params,
            deim_params=deim_params,
            mdeim_params=mdeim_params,
            models=models,
            rnd=rnd,
        )
        self.mdeim_nonlinear_params = dict(mdeim_nonlinear_params)
        self.deim_moving_runned = False

    def _create_fom(self):
        fom_params = self.fom_params
        return OneDimensionalBurgers(
            domain=fom_params.get("domain"),
            dirichlet=fom_params.get("dirichlet"),
            parameters=fom_params.get("parameters", None),
            forcing_term=fom_params.get("forcing_term"),
            u0=fom_params.get("u0"),
            exact_solution=fom_params.get("exact_solution", None),
            Lt=fom_params.get("Lt"),
            dLt_dt=fom_params.get("dLt_dt"),
        )

    def _create_rom(self, fom, name="ROM"):
        return RomConstructorNonlinear(fom=fom, grid=self.grid, name=name)

    def setup_hyperreduction(self):
        """RHS-DEIM + mass/stiffness/convection/nonlinear-lifting MDEIM +
        trilinear/nonlinear N-MDEIM (reference: rom/hrom.py:1042-1090)."""
        super().setup_hyperreduction()

        fom = self.fom
        grid = self.grid
        rnd = self.rnd

        mdeim_convection = MatrixDiscreteEmpiricalInterpolation(
            name=OperatorType.CONVECTION,
            assemble=fom.assemble_convection,
            grid=grid,
            tree_walk_params=self.mdeim_params,
        )
        mdeim_trilinear_lifting = MatrixDiscreteEmpiricalInterpolation(
            name=OperatorType.NONLINEAR_LIFTING,
            assemble=fom.assemble_nonlinear_lifting,
            grid=grid,
            tree_walk_params=self.mdeim_params,
        )
        mdeim_trilinear = MatrixDiscreteEmpiricalInterpolationNonlinear(
            name=OperatorType.TRILINEAR,
            assemble=fom.assemble_trilinear,
            grid=grid,
            tree_walk_params=self.mdeim_nonlinear_params,
        )
        mdeim_nonlinear = MatrixDiscreteEmpiricalInterpolationNonlinear(
            name=OperatorType.NONLINEAR,
            assemble=fom.assemble_nonlinear,
            grid=grid,
            tree_walk_params=self.mdeim_nonlinear_params,
        )

        mdeim_convection.setup(rnd=rnd)
        mdeim_trilinear_lifting.setup(rnd=rnd)
        mdeim_trilinear.setup(rnd=rnd)
        mdeim_nonlinear.setup(rnd=rnd)

        self.mdeim_convection = mdeim_convection
        self.mdeim_trilinear_lifting = mdeim_trilinear_lifting
        self.mdeim_trilinear = mdeim_trilinear
        self.mdeim_nonlinear = mdeim_nonlinear

    def run_offline_hyperreduction(self, mu_space=None, u_n=None, evaluate=True):
        """Linear operators + convection + nonlinear lifting + trilinear
        N-MDEIM (basis from the FOM-captured nonlinear snapshots)."""
        super().run_offline_hyperreduction(mu_space=mu_space, evaluate=evaluate)

        if self.models.get(OperatorType.CONVECTION):
            self._run_mdeim(
                object=self.mdeim_convection,
                mu_space=mu_space,
                evaluate=evaluate,
                which=OperatorType.CONVECTION,
            )

        if self.models.get(OperatorType.NONLINEAR_LIFTING):
            self._run_mdeim(
                object=self.mdeim_trilinear_lifting,
                mu_space=mu_space,
                evaluate=evaluate,
                which=OperatorType.NONLINEAR_LIFTING,
            )

        if self.models.get(OperatorType.TRILINEAR):
            basis_mdeim = self.srom.basis_nonlinear
            if u_n is None:
                u_n = self.basis
            self._run_mdeim_nonlinear(
                object=self.mdeim_trilinear,
                mu_space=mu_space,
                evaluate=evaluate,
                which=OperatorType.TRILINEAR,
                u_n=u_n,
                basis=basis_mdeim,
            )

        self.deim_moving_runned = True

    def _run_mdeim_nonlinear(self, object, u_n, which, mu_space, evaluate=False,
                             basis=None):
        """Train N-MDEIM from scratch, or adopt the FOM-captured nonlinear
        basis (reference: rom/hrom.py:1148-1182)."""
        if basis is None:
            object.run(u_n=u_n, mu_space=mu_space)
            object.dump_fom_basis()
            if evaluate:
                self.evaluate_deim_model(object=object, mu_space=mu_space)
        else:
            object.u_n = np.asarray(u_n) if u_n is not None else None
            if object.u_n is not None and object.u_n.ndim == 1:
                object.u_n = object.u_n.reshape((-1, 1))
            keep = self.rom_params.get(RomParameters.NMDEIM_SIZE)
            object.load_fom_basis(basis=basis, keep=keep)
            # Persist the adopted basis too: _resume_reductors reloads it
            # from disk, so resume must not depend on re-running the FOM
            # sweep that captured the nonlinear snapshots.
            object.dump_fom_basis()

        for rom in (self.rom, self.srom):
            rom.add_hyper_reductor(reductor=object, which=which)

    def _resume_reductors(self):
        deims, operators = super()._resume_reductors()

        self.mdeim_convection.load_fom_basis()
        self.mdeim_trilinear_lifting.load_fom_basis()
        N_tri = self.rom_params.get(RomParameters.NMDEIM_SIZE)
        self.mdeim_trilinear.load_fom_basis(keep=N_tri)

        deims += [self.mdeim_convection, self.mdeim_trilinear_lifting,
                  self.mdeim_trilinear]
        operators += [OperatorType.CONVECTION, OperatorType.NONLINEAR_LIFTING,
                      OperatorType.TRILINEAR]
        return deims, operators

    # ------------------------------------------------------------------
    # Piston-specific postprocessing (reference: rom/hrom.py:586-681)
    # ------------------------------------------------------------------
    def _postprocess_mu(self, which, idx_mu, mu, uh_fom):
        fom = self.fom
        rom = self.rom
        srom = self.srom

        if fom.RUNTIME_PROCESS and (which == Stage.ONLINE):
            name_probes = f"probes_{which}_fom_{idx_mu}.csv"
            probes = fom.save_probes(name=name_probes)

            piston = probes["L"].squeeze()
            piston.name = ProbeLocations.PISTON
            name = (
                f"probes_comparison_rom_{rom.N}_srom_{srom.N}_trilinear_"
                f"{self.mdeim_trilinear.N}_{which}_{idx_mu}.csv"
            )
            self.save_fom_rom_probes(
                name=name, piston=piston, fom=fom, rom=rom, srom=srom
            )

        # Mass conservation for ROM and FOM
        timesteps = rom.timesteps
        output_rom = fom.compute_mass_conservation(
            mu=mu, ts=timesteps, solutions=rom.solutions.fom.T,
            which=ProblemType.ROM,
        )
        name_rom = (
            f"mass_conservation_rom_{rom.N}_srom_{srom.N}_mdeim_"
            f"{self.mdeim_trilinear.N}_{which}_rom_{idx_mu}.csv"
        )
        dump_csv(name_rom, obj=output_rom)

        output_fom = fom.compute_mass_conservation(
            mu=mu, ts=timesteps, solutions=np.asarray(uh_fom).T,
            which=ProblemType.FOM,
        )
        dump_csv(f"mass_conservation_{which}_fom_{idx_mu}.csv", obj=output_fom)

    @staticmethod
    def compare_models(x, piston, ts, fom, rom, srom):
        """FOM/ROM/S-ROM physical probes at a location
        (reference: rom/hrom.py:628-642)."""
        x_fom = fom.solutions.compute_at(x=x)
        x_rom = rom.solutions.compute_at(x=x)
        x_srom = srom.solutions.compute_at(x=x)

        data = np.vstack([x_fom, x_rom, x_srom]).T
        columns = [ProblemType.FOM, ProblemType.ROM, ProblemType.SROM]
        df = pd.DataFrame(data=data, index=ts, columns=columns)
        df[ProbeLocations.PISTON] = np.asarray(piston)
        return df

    def save_fom_rom_probes(self, name, piston, fom, rom, srom):
        """Outflow + halfway comparisons (reference: rom/hrom.py:644-681)."""
        ts = rom.solutions.ts
        compare = partial(self.compare_models, fom=fom, rom=rom, srom=srom,
                          piston=piston, ts=ts)

        outflow = compare(x=0.0)
        half = compare(x=0.5)

        outflow.to_csv("_".join([ProbeLocations.OUTFLOW, name]))
        half.to_csv("_".join([ProbeLocations.MIDDLE, name]))
        return outflow, half
