"""Phase alignment (time registration) for μ-local windowed serving.

The high-Mach piston cell's projection floor is transport-bound: the
wave field's PHASE varies with μ (acoustic crossing ∝ 1/a0, piston
forcing ∝ ω), so nearby-μ trajectories are near-translates in time and
no small linear subspace spans them (slowly decaying Kolmogorov width —
the round-3 dead end: capacity and cell-narrowing both measured
exhausted at a ~3.7e-4 floor). Aligning the trajectories by a scalar
per-μ time dilation before the window POD collapses the floor
(measured on the flagship corner-cell cache: W=100/N=40 1.06e-4 →
4.2e-6, N=48 → 7.3e-7), and the dilation is an almost exact LINEAR
function of μ (leave-one-out rms 2e-4 over a [0.965, 1] range), so it
is predictable for held-out parameters.

TPU-native serving formulation — the aligned clock is the STEP INDEX:

- offline: re-solve each training trajectory with its own dilated step
  dt_j = d(μ_j)·dt (d ≥ 1 by normalization, so nt steps cover [0, tf]);
  window-POD the per-step-aligned stacks. No snapshot interpolation —
  alignment is exact by construction.
- online: each lane integrates with its own dt_b = d(μ_b)·dt. The
  dilation enters ONLY through per-lane quantities the batched engines
  already carry: θ entries are evaluated at the lane's dilated times,
  the dt-scaled θ streams (stiffness-side, rhs) and the trilinear
  coefficient b0 are scaled by d_b. Window schedules stay batch-uniform
  (same step-index windows), the compiled kernels are UNCHANGED.
- certification: served trajectories live on per-lane dilated grids;
  :func:`resample_to_standard` maps them back to the standard grid with
  cubic (O(dt³)) interpolation, below the BDF-2 floor.

No reference analog: the reference serves one global basis on one clock
(reference: rom/rom.py:430-555). The method is the classical
shifted/registered-POD idea specialized to time-periodic transport,
where it becomes a pure re-parametrization of the serving time grid.
"""

from dataclasses import dataclass, field

import numpy as np


def _feature_value(mu, name):
    """Evaluate one feature of the law grammar on a μ dict (scalars or
    (B,) arrays; jax-traceable — integer powers and products only).

    Grammar: ``"*"``-joined factors, each ``key`` or ``key^int`` —
    e.g. ``"a0"``, ``"a0^2"``, ``"delta*omega*a0^-1"`` (the piston Mach
    number). Kept string-serializable so laws round-trip through npz.
    """
    val = None
    for part in name.split("*"):
        if "^" in part:
            key, exp = part.split("^")
            exp = int(exp)
        else:
            key, exp = part, 1
        v = mu[key]
        f = v ** exp if exp >= 0 else 1.0 / (v ** (-exp))
        val = f if val is None else val * f
    return val


#: Serve-time guard default: a lane is flagged as extrapolating when its
#: nearest-training-μ distance (range-normalized feature space) exceeds
#: GUARD_FACTOR × the training set's own fill distance. 1.5 keeps every
#: leave-one-out training point unflagged (its distance IS ≤ the fill
#: distance) while catching the measured sampling-hole incident
#: (rom/hrom.py: a held-out μ in a first-come-sampling hole mispredicted
#: its dilation by 0.03 and served at 1.5e-4 vs 2e-7 in-hull).
GUARD_FACTOR = 1.5


@dataclass
class DilationLaw:
    """Per-cell dilation law d(μ) = c₀ + Σᵢ cᵢ·fᵢ(μ), clamped below at
    ``floor`` (coverage of [0, tf] needs d ≥ 1). Features fᵢ follow the
    power-product grammar of :func:`_feature_value`.

    Fitted laws also carry a serve-time extrapolation guard: the
    range-normalized training feature cloud (``guard_feats``, rows =
    training μ's) and its fill distance (``guard_dref`` = max over
    training points of the nearest-other-training distance). A serve μ
    whose nearest-training distance exceeds ``GUARD_FACTOR · guard_dref``
    sits in a training hole (interior or exterior) where the affine law
    is unvalidated — the serving engines surface it as a per-lane
    ``dil_oor`` flag rather than silently serving the extrapolated
    dilation."""

    names: tuple                 # feature strings entering the law
    coef: np.ndarray             # (1 + len(names),) float64
    floor: float = 1.0
    guard_feats: np.ndarray = None   # (n_train, p) NORMALIZED features
    guard_inv_span: np.ndarray = None  # (p,) 1/span normalizers
    guard_dref: float = None     # training fill distance (normalized)

    def predict(self, mu):
        """Dilation for a μ dict of scalars or (B,) arrays; jax-traceable
        (plain arithmetic on the dict values)."""
        d = self.coef[0]
        for c, n in zip(self.coef[1:], self.names):
            d = d + c * _feature_value(mu, n)
        if hasattr(d, "clip"):
            return d.clip(self.floor)
        return max(float(d), self.floor)

    @property
    def has_guard(self):
        return (self.guard_feats is not None
                and self.guard_dref is not None
                and np.isfinite(self.guard_dref))

    def guard_distance(self, mu):
        """Nearest-training-μ distance in normalized feature space for a
        μ dict of scalars or (B,) arrays — jax-traceable (stacks and
        reductions only). ``None`` when the law carries no guard."""
        if not self.has_guard:
            return None
        feats = [_feature_value(mu, n) * s
                 for n, s in zip(self.names, self.guard_inv_span)]
        # (B?, p) serve cloud vs (n_train, p) training cloud; jnp
        # handles host scalars and traced lanes alike.
        import jax.numpy as xp

        x = xp.stack([xp.asarray(f) for f in feats], axis=-1)
        G = xp.asarray(self.guard_feats)
        d2 = ((x[..., None, :] - G) ** 2).sum(axis=-1)  # (B?, n_train)
        return xp.sqrt(d2.min(axis=-1))

    def extrapolation_flag(self, mu, factor=GUARD_FACTOR):
        """Boolean (per-lane) serve-time extrapolation flag; ``None``
        when the law carries no guard."""
        dist = self.guard_distance(mu)
        if dist is None:
            return None
        return dist > factor * self.guard_dref

    def to_payload(self):
        payload = {
            "names": np.array(list(self.names)),
            "coef": np.asarray(self.coef, np.float64),
            "floor": np.float64(self.floor),
        }
        if self.has_guard:
            payload["guard_feats"] = np.asarray(self.guard_feats,
                                                np.float64)
            payload["guard_inv_span"] = np.asarray(self.guard_inv_span,
                                                   np.float64)
            payload["guard_dref"] = np.float64(self.guard_dref)
        return payload

    @classmethod
    def from_payload(cls, names, coef, floor, guard_feats=None,
                     guard_inv_span=None, guard_dref=None):
        return cls(names=tuple(str(n) for n in np.asarray(names)),
                   coef=np.asarray(coef, np.float64),
                   floor=float(floor),
                   guard_feats=(None if guard_feats is None
                                else np.asarray(guard_feats, np.float64)),
                   guard_inv_span=(None if guard_inv_span is None
                                   else np.asarray(guard_inv_span,
                                                   np.float64)),
                   guard_dref=(None if guard_dref is None
                               else float(guard_dref)))


def resample_time(u, d, nt=None):
    """Linearly resample a trajectory ``u`` (..., nt) at dilated steps:
    out[..., k] = u(d·k) (0-based column clock). Floor-prediction helper;
    the production build re-SOLVES on the dilated grid instead."""
    u = np.asarray(u)
    nt_src = u.shape[-1]
    nt = nt_src if nt is None else int(nt)
    tau = np.clip(d * np.arange(nt), 0, nt_src - 1)
    i0 = np.floor(tau).astype(int)
    fr = tau - i0
    i1 = np.minimum(i0 + 1, nt_src - 1)
    return u[..., i0] * (1 - fr) + u[..., i1] * fr


def optimal_dilation(u, anchor, lo=0.9, hi=1.1, coarse=161, refine=33,
                     stride=8):
    """Scalar d minimizing ‖u(:, d·t) − anchor‖_F (Frobenius over the
    linearly resampled trajectory). Grid search + one refinement — the
    objective is smooth and single-dipped over phase-neighbour
    trajectories (measured on the flagship corner cell).

    ``stride`` decimates the SPATIAL axis for the search (phase lives in
    the time axis; every-8th-row objectives locate the same optimum to
    the search resolution while cutting the fit cost 8× — the flagship
    6-cell fit is minutes at full resolution)."""
    u = np.asarray(u, np.float64)[::max(int(stride), 1)]
    anchor = np.asarray(anchor, np.float64)[::max(int(stride), 1)]

    def err(d):
        return float(np.linalg.norm(resample_time(u, d) - anchor))

    grid = np.linspace(lo, hi, coarse)
    errs = [err(d) for d in grid]
    best = int(np.argmin(errs))
    d0 = grid[best]
    step = grid[1] - grid[0]
    fine = np.linspace(d0 - step, d0 + step, refine)
    errs = [err(d) for d in fine]
    return float(fine[int(np.argmin(errs))])


#: Candidate feature sets for ``fit_dilation_law(features="auto")``,
#: ranked by leave-one-out rms on the measured dilations. The quadratic
#: set wins on WIDE Mach cells (measured: the flagship cell-2 span of
#: 14% drops LOO rms 2.4e-3 → 2.9e-4), the Mach-augmented linear set on
#: narrow ones (cell 3: 2.7e-4 → 1.5e-4); plain linear is the fallback
#: for small training counts.
FEATURE_CANDIDATES = (
    ("a0", "omega", "delta"),
    ("a0", "omega", "delta", "delta*omega*a0^-1"),
    ("a0", "omega", "delta", "a0^2", "omega^2", "a0*omega"),
)


def _design_matrix(mus, names):
    return np.stack(
        [np.ones(len(mus))]
        + [np.array([float(_feature_value(m, n)) for m in mus])
           for n in names],
        axis=1,
    )


def _loo_rms(X, y):
    """Leave-one-out rms of the LS fit (small n — direct refits)."""
    errs = []
    for j in range(len(y)):
        m = np.ones(len(y), bool)
        m[j] = False
        cj, *_ = np.linalg.lstsq(X[m], y[m], rcond=None)
        errs.append(X[j] @ cj - y[j])
    return float(np.sqrt(np.mean(np.square(errs))))


def fit_dilation_law(snapshots, mus, features="auto",
                     anchor=0, margin=0.01, search=(0.82, 1.22)):
    """Fit a cell's dilation law from its training trajectories.

    Parameters
    ----------
    snapshots : list of (nh, nt) trajectories on the STANDARD grid
    mus : matching list of μ dicts
    features : "auto" (pick the :data:`FEATURE_CANDIDATES` set with the
        best leave-one-out rms — sets needing ≥2 points per coefficient
        are skipped at small n) or an explicit tuple of feature strings
        (see :func:`_feature_value` for the grammar)
    anchor : index of the alignment anchor trajectory
    margin : the law is normalized so its minimum over the training μ's
        is ``1 + margin`` — headroom for held-out μ's predicting below
        the training minimum (LOO spread measured 1e-4-class on narrow
        cells; 1e-2 default costs ≤1% extra dt coarsening).

    Returns ``(law, dils)``: the normalized :class:`DilationLaw` and the
    normalized per-training-trajectory dilations (all ≥ 1 + margin) to
    re-solve the training set at. Raises when an alignment search lands
    on the search boundary (no interior optimum — the cell is not
    phase-alignable by a scalar dilation; widen ``search`` or skip
    registration for it).
    """
    anchor_traj = np.asarray(snapshots[anchor], np.float64)
    lo, hi = search
    dils = []
    for j, s in enumerate(snapshots):
        if j == anchor:
            dils.append(1.0)
            continue
        d = optimal_dilation(s, anchor_traj, lo=lo, hi=hi)
        if d <= lo + 1e-9 or d >= hi - 1e-9:
            raise ValueError(
                f"dilation search for trajectory {j} hit the boundary "
                f"({d:.4f} of [{lo}, {hi}]) — the cell does not "
                "phase-align under a scalar time dilation"
            )
        dils.append(d)
    dils = np.asarray(dils, np.float64)

    if features == "auto":
        best = None
        for cand in FEATURE_CANDIDATES:
            if len(dils) < 2 * (len(cand) + 1):
                continue
            rms = _loo_rms(_design_matrix(mus, cand), dils)
            if best is None or rms < best[0]:
                best = (rms, cand)
        if best is None:
            best = (np.inf, FEATURE_CANDIDATES[0])
        names = best[1]
    else:
        names = tuple(features)

    X = _design_matrix(mus, names)
    coef, *_ = np.linalg.lstsq(X, dils, rcond=None)
    pred = X @ coef
    # Normalize: training predictions ≥ 1 + margin, so nt serving steps
    # at d·dt always cover [0, tf] with the same margin for held-out μ.
    scale = (1.0 + margin) / float(pred.min())
    coef = coef * scale
    # Serve-time extrapolation guard: normalized training feature cloud
    # + its fill distance (see DilationLaw docstring). Needs ≥3 points
    # for a meaningful fill distance.
    feats = X[:, 1:]
    guard = {}
    if len(mus) >= 3 and feats.shape[1]:
        span = feats.max(axis=0) - feats.min(axis=0)
        inv_span = np.where(span > 0, 1.0 / np.where(span > 0, span, 1.0),
                            1.0)
        G = feats * inv_span
        d2 = ((G[:, None, :] - G[None, :, :]) ** 2).sum(axis=-1)
        np.fill_diagonal(d2, np.inf)
        dref = float(np.sqrt(d2.min(axis=1)).max())
        if np.isfinite(dref) and dref > 0:
            guard = dict(guard_feats=G, guard_inv_span=inv_span,
                         guard_dref=dref)
    law = DilationLaw(names=tuple(names), coef=coef, floor=1.0, **guard)
    return law, pred * scale


def resample_to_standard(traj, d, axis=0):
    """Map a served trajectory from its dilated grid back to the
    standard grid.

    ``traj`` holds samples at t = (k+1)·d·dt for k = 0..nt−1 along
    ``axis``; returns samples at t = (m+1)·dt (same count). Cubic
    Lagrange on the uniform source grid. d ≥ 1 guarantees the standard
    grid is interior except the first fraction of a step, where the
    clamped stencil extrapolates by < (1−1/d) of one step.

    Fidelity (measured at flagship scale, tests/test_registration.py
    ::test_resampler_fidelity_at_flagship_scale): O((Ω·dt)⁴) per
    frequency Ω — ≤1e-7-class for the smooth forcing/acoustic content
    (Ω ≤ ~30 rad/s at nt=1500), but the steepened high-Mach corner
    trajectory carries near-grid-frequency content for which raw-field
    resampling fidelity is dt-resolution-limited (~6e-4 Frobenius —
    the same content no discretization at this dt resolves; it is part
    of the cross-grid ``fom_dt_gap`` bench reports). Certification
    comparisons are unaffected: the map is LINEAR, so resampling both
    the served lane and its matched-grid FOM reference measures the
    pure reduction error R(u_rom − u_fom) on the standard clock.
    """
    if abs(float(d) - 1.0) < 1e-12:
        return np.asarray(traj)
    traj = np.moveaxis(np.asarray(traj), axis, 0)
    nt = traj.shape[0]
    # 1-based clocks: source sample j at t = j·d·dt, target m at m·dt.
    s = np.arange(1, nt + 1) / float(d)
    j0 = np.clip(np.floor(s).astype(int), 2, nt - 2)
    r = s - j0
    w = np.stack([
        -r * (r - 1) * (r - 2) / 6.0,
        (r + 1) * (r - 1) * (r - 2) / 2.0,
        -(r + 1) * r * (r - 2) / 2.0,
        (r + 1) * r * (r - 1) / 6.0,
    ])  # stencil offsets -1, 0, 1, 2 around j0
    w = w.reshape((4, nt) + (1,) * (traj.ndim - 1))
    i = j0 - 1  # 0-based index of the j0 sample
    out = (w[0] * traj[i - 1] + w[1] * traj[i]
           + w[2] * traj[i + 1] + w[3] * traj[i + 2])
    return np.moveaxis(out, 0, axis)
