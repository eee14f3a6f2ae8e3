"""Time-windowed local reduced bases for the online sweep.

A single global basis spends most of its modes covering the whole
trajectory: at the piston headline configuration (nx=1000, nt=1500) the
held-out-μ projection floor is 1.7e-7 at N=88, while 15–16 time windows
reach 1.2e-8 with N=48 *per window* (scripts/window_study.py) — and the
online solve cost scales with the *per-window* N. This module implements
the offline side:

- partition [0, nt) into W equal windows;
- per window: POD-in-time per training μ (hierarchically weighted, same
  convention as ``build_reduced_basis``) over the window's snapshot columns
  (± a small overlap so the boundary states are representable in both
  neighbouring bases), then POD across μ, truncated to a common N;
- boundary transfer matrices T_w = V_{w+1}ᵀ V_w (float64) that re-express
  the BDF carry when serving crosses a window boundary;
- per-window *serving combine* tensors for every hyper-reduced operator:
  C_w = (VᵀB V)-projected collateral basis folded with (PᵀU)⁻¹ in float64
  (see deim.DiscreteEmpiricalInterpolation._combine_matrix), so the online
  engines apply gathered entries → reduced operator in one matmul.

Serving (rom.py ``_online_sweep_windowed`` and the fused kernel) chains W
scans/kernel launches — one per window, each closed over its own constant
tensors — transferring the double-f32 carry in float64 at the boundaries.
This keeps every traced shape static and needs no in-scan basis gathers.

The reference (KikeM/romtime) has no analogous machinery; this is a
TPU-era extension of its single-basis online loop (reference:
rom/rom.py:430-555).
"""

from dataclasses import dataclass, field

import numpy as np

from .pod import orth


def _load_dilation(data, prefix):
    """Rebuild a DilationLaw from npz keys ``{prefix}dilation_*`` or
    return None when the dump predates / lacks registration."""
    if f"{prefix}dilation_coef" not in data.files:
        return None
    from .registration import DilationLaw

    guard = {
        k: data[f"{prefix}dilation_{k}"]
        for k in ("guard_feats", "guard_inv_span", "guard_dref")
        if f"{prefix}dilation_{k}" in data.files
    }
    return DilationLaw.from_payload(
        names=data[f"{prefix}dilation_names"],
        coef=data[f"{prefix}dilation_coef"],
        floor=data[f"{prefix}dilation_floor"],
        **guard,
    )


@dataclass
class WindowedServing:
    """Per-window serving artifacts (all host-side numpy, float64)."""

    bounds: np.ndarray          # (W+1,) step indices; bounds[0]=0, [-1]=nt
    Vs: np.ndarray              # (W, nh, N) per-window bases
    transfers: np.ndarray       # (W-1, N, N) T_w = Vs[w+1]ᵀ Vs[w]
    combines: dict = field(default_factory=dict)  # name → (W, n_out, k)
    trilinear: np.ndarray = None   # (W, N², N) fast-path tensors or None
    dilation: object = None        # registration.DilationLaw — the
    #                                bases were built from trajectories
    #                                solved at dt·d(μ) per training μ
    #                                (phase-aligned serving), and lanes
    #                                must serve at their own dt·d(μ_b)

    @property
    def n_windows(self):
        return len(self.Vs)

    @property
    def N(self):
        return self.Vs.shape[2]

    # ------------------------------------------------------------------
    # Persistence (analog of the reference's basis pickles,
    # reference: rom/hrom.py:344-417 — resume restores the full online
    # configuration from disk)
    # ------------------------------------------------------------------
    def dump(self, path):
        """Write every serving artifact to one ``.npz`` container."""
        payload = {
            "bounds": np.asarray(self.bounds),
            "Vs": np.asarray(self.Vs),
            "transfers": np.asarray(self.transfers),
        }
        for name, C in self.combines.items():
            payload[f"combine_{name}"] = np.asarray(C)
        if self.trilinear is not None:
            payload["trilinear"] = np.asarray(self.trilinear)
        if self.dilation is not None:
            for k, v in self.dilation.to_payload().items():
                payload[f"dilation_{k}"] = v
        np.savez(path, **payload)

    def truncate(self, N):
        """Derive the nested N-mode serving configuration from an
        (N+Δ)-mode build by pure slicing — per-window POD bases nest, so
        the first N columns of every artifact ARE the N-mode build:
        V[:, :N] is the same SVD prefix, (V̂ᵀBV̂)[:N,:N] = VᵀBV, and the
        trilinear/transfer tensors slice likewise. This makes one
        (N+Δ)-mode projection loop yield BOTH the serving configuration
        and its sacrificial estimator reference (reference S-ROM
        semantics: rom/hrom.py:563-574) at no extra projection cost."""
        Nh = self.N
        if N > Nh:
            raise ValueError(f"cannot truncate N={Nh} to {N}")
        if N == Nh:
            return self
        combines = {}
        for name, C in self.combines.items():
            C = np.asarray(C)
            W, n_out, k = C.shape
            if n_out == Nh * Nh:
                combines[name] = np.ascontiguousarray(
                    C.reshape(W, Nh, Nh, k)[:, :N, :N].reshape(
                        W, N * N, k)
                )
            else:
                combines[name] = np.ascontiguousarray(C[:, :N])
        tri = None
        if self.trilinear is not None:
            T = np.asarray(self.trilinear)
            W = T.shape[0]
            tri = np.ascontiguousarray(
                T.reshape(W, Nh, Nh, Nh)[:, :N, :N, :N].reshape(
                    W, N * N, N)
            )
        return WindowedServing(
            bounds=np.asarray(self.bounds),
            Vs=np.ascontiguousarray(np.asarray(self.Vs)[:, :, :N]),
            transfers=np.ascontiguousarray(
                np.asarray(self.transfers)[:, :N, :N]),
            combines=combines,
            trilinear=tri,
            dilation=self.dilation,
        )

    @classmethod
    def load(cls, path):
        """Rebuild a serving-ready instance from :meth:`dump` output."""
        with np.load(path) as data:
            combines = {
                k[len("combine_"):]: data[k]
                for k in data.files
                if k.startswith("combine_")
            }
            return cls(
                bounds=data["bounds"],
                Vs=data["Vs"],
                transfers=data["transfers"],
                combines=combines,
                trilinear=(data["trilinear"]
                           if "trilinear" in data.files else None),
                dilation=_load_dilation(data, ""),
            )


def build_windowed_basis(
    snapshots, n_windows, num_basis, overlap=2, tol_t=None
):
    """Per-window POD bases from per-μ homogeneous snapshot matrices.

    Parameters
    ----------
    snapshots : list of (nh, nt) arrays — one per training μ
    n_windows : int
    num_basis : int — common N per window (windows are rank-checked)
    overlap : int — snapshot columns borrowed from each neighbour so the
        boundary states are representable in both bases
    tol_t : optional energy tolerance for the per-μ time-stage POD

    Returns (bounds, Vs, transfers); Vs float64, transfers float64.
    """
    snapshots = [np.asarray(s, np.float64) for s in snapshots]
    nt = snapshots[0].shape[1]
    bounds = np.linspace(0, nt, n_windows + 1).astype(int)

    Vs = []
    for w in range(n_windows):
        a = max(0, int(bounds[w]) - overlap)
        b = min(nt, int(bounds[w + 1]) + overlap)
        # Direct SVD of the raw stacked window snapshots — NOT the two-stage
        # tree walk: a per-μ time-POD at the usual drop tolerance discards
        # the σ/σ₁ ≈ 1e-7…1e-9 directions of the local solution manifold,
        # and those are exactly what pushes the windowed projection floor
        # from ~1e-5 to ~1e-8 (scripts/window_study.py).
        stacked = np.hstack([s[:, a:b] for s in snapshots])
        if min(stacked.shape) < num_basis:
            raise ValueError(
                f"window {w}: snapshot matrix {stacked.shape} has rank "
                f"< num_basis={num_basis} — add training μ or snapshots"
            )
        V, _sig, _en = orth(stacked, num=num_basis, normalize=False)
        Vs.append(V)

    Vs = np.stack(Vs)  # (W, nh, N)
    transfers = np.stack(
        [Vs[w + 1].T @ Vs[w] for w in range(n_windows - 1)]
    ) if n_windows > 1 else np.zeros((0, num_basis, num_basis))
    return bounds, Vs, transfers


def predict_window_floor(snapshots, n_windows, num_basis, overlap=2):
    """Predicted projection floor of a (W, N) shape on a snapshot stack.

    For each window, the relative σ-tail of the stacked window snapshots
    beyond ``num_basis`` modes — the best-possible (Galerkin-independent)
    relative L2 projection residual the window basis can reach. Returns
    the max over windows: the floor that binds the served trajectory.

    This is exactly the quantity the round-3 measurement campaign used
    to locate per-cell capacity limits (the high-Mach corner's floor is
    N-bound; low/mid-Mach cells track 1e-7 floors already at N=32) —
    computable host-side in seconds from cached training trajectories,
    no serving build required. No reference analog (the reference serves
    one global basis, rom/rom.py:430-555).

    Prediction bias: the floor is computed from the *cell-only* cached
    trajectories, but ``build_mulocal_serving`` PODs an augmented stack
    (cell snapshots + weighted box-wide trajectories when
    ``augment_global`` is set) and builds at N+srom_extra before
    truncating — so the achieved per-cell floor can sit above this
    prediction beyond the documented Galerkin margin. Pass the same
    augmented stack here when that bias matters.
    """
    snapshots = [np.asarray(s, np.float64) for s in snapshots]
    nt = snapshots[0].shape[1]
    bounds = np.linspace(0, nt, n_windows + 1).astype(int)
    worst = 0.0
    for w in range(n_windows):
        a = max(0, int(bounds[w]) - overlap)
        b = min(nt, int(bounds[w + 1]) + overlap)
        stacked = np.hstack([s[:, a:b] for s in snapshots])
        if min(stacked.shape) <= num_basis:
            # Rank-deficient window stack: build_windowed_basis would
            # refuse this shape outright — report an unusable (infinite)
            # floor so shape selection never prefers it over a shape the
            # stack can actually support.
            return np.inf
        sig = np.linalg.svd(stacked, compute_uv=False)
        total = float(np.sum(sig**2))
        tail = float(np.sum(sig[num_basis:] ** 2))
        worst = max(worst, np.sqrt(tail / total) if total > 0 else 0.0)
    return worst


def select_fleet_shapes(cell_snapshots, candidates, target_floor,
                        overlap=2, margin=1.0):
    """Pick the cheapest (W, N) per μ-cell meeting a target floor.

    Parameters
    ----------
    cell_snapshots : list over cells of lists of (nh, nt) trajectories
        (e.g. the ``StorageNames.MULOCAL_SNAPSHOTS`` cache contents)
    candidates : list of (W, N) shapes, e.g. ``[(50, 32), (30, 40)]``
    target_floor : float — required predicted projection floor per cell
    margin : floors are compared against ``target_floor / margin``
        (margin > 1 leaves headroom for the Galerkin/in-span gap above
        the pure projection floor)

    Candidates are ranked by online cost ∝ N² (the measured scaling of
    the fused kernel's θ-dots + solve: W=50/N=32 serves ~1.5× faster
    than W=30/N=40 ≈ (40/32)², docs/campaign_r03.jsonl), ties broken by
    fewer windows (fewer boundary transfers). Every cell falls back to
    the most accurate candidate (smallest predicted floor) when none
    meets the target — mirroring the measured reality that the extreme
    high-Mach corner is N-bound at any tested shape.

    Returns ``(cell_wn, floors)``: the per-cell shape list (feed to
    ``build_mulocal_serving(cell_wn=...)``) and the per-cell predicted
    floor of the chosen shape.
    """
    by_cost = sorted(candidates, key=lambda wn: (wn[1] * wn[1], wn[0]))
    cell_wn, floors = [], []
    for snaps in cell_snapshots:
        preds = {wn: predict_window_floor(snaps, wn[0], wn[1], overlap)
                 for wn in by_cost}
        chosen = None
        for wn in by_cost:
            if preds[wn] <= target_floor / margin:
                chosen = wn
                break
        if chosen is None:
            chosen = min(by_cost, key=lambda wn: preds[wn])
        cell_wn.append(chosen)
        floors.append(preds[chosen])
    return cell_wn, floors


@dataclass
class MuLocalWindowed:
    """μ-local windowed serving: K Mach-band cells, each a full
    :class:`WindowedServing` built from that cell's training trajectories.

    The piston solution manifold is locally low-rank in μ but its global
    Kolmogorov width decays slowly at high Mach (measured:
    scripts/multimu_diag.py — a single box-wide basis at W=30/N=40 caps
    the 16-μ certification max at ~1e-3 regardless of training size).
    Routing each served μ to a Mach-local basis restores the fast local
    decay without raising the per-window N the online kernels pay for.

    ``edges`` are piston-Mach bin boundaries (K+1,); a served μ with Mach
    m goes to cell ``searchsorted(edges, m) - 1`` (clipped — out-of-range
    μ use the nearest cell). Cells normally share (W, N) so every cell
    serves through the SAME compiled kernel with its own tables passed
    as jit arguments; cells MAY differ in (W, N) — e.g. a wider top
    Mach cell where the Kolmogorov width decays slowly — in which case
    each distinct shape group compiles its own kernel once (tables are
    runtime jit arguments, so jax retraces per table shape
    automatically). No reference analog (KikeM/romtime serves one
    global basis: rom/rom.py:430-555).
    """

    edges: np.ndarray              # (K+1,) Mach bin edges
    cells: list                    # K × WindowedServing
    cells_srom: list = None        # K × WindowedServing at N+Δ (nested
    #                                sacrificial estimator references) or
    #                                None when built without srom_extra

    @property
    def n_cells(self):
        return len(self.cells)

    @property
    def n_windows(self):
        return self.cells[0].n_windows

    @property
    def N(self):
        return self.cells[0].N

    @property
    def cell_wn(self):
        """Per-cell (n_windows, N) pairs — equal for a uniform fleet."""
        return [(w.n_windows, w.N) for w in self.cells]

    @property
    def is_uniform(self):
        return len(set(self.cell_wn)) == 1

    def cell_of(self, mach):
        """Cell index (scalar or array) for piston Mach number(s)."""
        idx = np.searchsorted(np.asarray(self.edges), np.asarray(mach),
                              side="right") - 1
        return np.clip(idx, 0, self.n_cells - 1)

    def dump(self, path):
        payload = {"edges": np.asarray(self.edges)}
        if self.cells_srom is not None:
            # Nested: persist only the (N+Δ) builds + the per-cell
            # serving N; the serving cells reconstruct by slicing
            # (truncate) on load. Per-cell Ns support mixed-(W, N)
            # fleets (a scalar "serving_n" is the legacy uniform form).
            payload["serving_ns"] = np.asarray(
                [w.N for w in self.cells]
            )
            store = self.cells_srom
        else:
            store = self.cells
        for c, win in enumerate(store):
            payload[f"c{c}_bounds"] = np.asarray(win.bounds)
            payload[f"c{c}_Vs"] = np.asarray(win.Vs)
            payload[f"c{c}_transfers"] = np.asarray(win.transfers)
            for name, C in win.combines.items():
                payload[f"c{c}_combine_{name}"] = np.asarray(C)
            if win.trilinear is not None:
                payload[f"c{c}_trilinear"] = np.asarray(win.trilinear)
            if win.dilation is not None:
                for k, v in win.dilation.to_payload().items():
                    payload[f"c{c}_dilation_{k}"] = v
        np.savez(path, **payload)

    @classmethod
    def load(cls, path):
        with np.load(path) as data:
            edges = data["edges"]
            cells = []
            for c in range(len(edges) - 1):
                pre = f"c{c}_"
                combines = {
                    k[len(pre) + len("combine_"):]: data[k]
                    for k in data.files
                    if k.startswith(pre + "combine_")
                }
                cells.append(WindowedServing(
                    bounds=data[pre + "bounds"],
                    Vs=data[pre + "Vs"],
                    transfers=data[pre + "transfers"],
                    combines=combines,
                    trilinear=(data[pre + "trilinear"]
                               if pre + "trilinear" in data.files
                               else None),
                    dilation=_load_dilation(data, pre),
                ))
            if "serving_ns" in data.files:
                ns = [int(n) for n in data["serving_ns"]]
                return cls(edges=edges,
                           cells=[w.truncate(n)
                                  for w, n in zip(cells, ns)],
                           cells_srom=cells)
            if "serving_n" in data.files:  # legacy uniform dumps
                n = int(data["serving_n"])
                return cls(edges=edges,
                           cells=[w.truncate(n) for w in cells],
                           cells_srom=cells)
            return cls(edges=edges, cells=cells)
