"""Phase-aligned (time-registered) windowed serving — rom/registration.py
+ the per-lane dilated serving clocks in the windowed engines.

No reference analog (KikeM/romtime serves one global basis on one clock,
reference rom/rom.py:430-555); the method targets the transport-bound
high-Mach corner the round-3 capacity scans proved unreachable by basis
size alone (ROADMAP round-3 ledger).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from romtime_tpu.conventions import Stage
from romtime_tpu.dtypes import compute_dtype_scope
from romtime_tpu.rom.registration import (
    DilationLaw,
    fit_dilation_law,
    optimal_dilation,
    resample_time,
    resample_to_standard,
)

# the module-scoped piston_windowed fixture is provided by conftest.py


# ---------------------------------------------------------------------------
# Unit: the registration primitives (pure host numpy)
# ---------------------------------------------------------------------------
def _wave(nh, nt, speed, k=3.0):
    """Synthetic traveling wave u(x, t) = sin(k(x − c·t)) + decay."""
    x = np.linspace(0, 1, nh)[:, None]
    t = np.linspace(0, 1, nt)[None, :]
    return np.sin(2 * np.pi * k * (x - speed * t)) * np.exp(-0.3 * t)


def test_optimal_dilation_recovers_known_phase():
    anchor = _wave(120, 400, speed=1.0)
    for d_true in (0.95, 1.03):
        u = _wave(120, 400, speed=1.0 / d_true)  # u(x, d·t) == anchor
        d = optimal_dilation(u, anchor, lo=0.9, hi=1.1)
        assert abs(d - d_true) < 2e-3, (d_true, d)


def test_fit_dilation_law_linear_recovery():
    rng = np.random.default_rng(0)
    mus = [dict(a0=float(a), omega=float(w), delta=0.12)
           for a, w in zip(rng.uniform(8, 10, 8), rng.uniform(15, 20, 8))]
    # ground-truth dilation linear in (a0, omega)
    d_true = np.array([1.0 + 0.01 * (m["a0"] - 9) - 0.004 * (m["omega"] - 17)
                       for m in mus])
    snaps = [_wave(100, 500, speed=1.0 / d) for d in d_true]
    law, dils = fit_dilation_law(snaps, mus, anchor=0, margin=0.01)
    # normalization: every training dilation ≥ 1 + margin (coverage)
    assert np.all(dils >= 1.0 + 0.01 - 1e-9)
    # the law reproduces the (normalized) truth to the search resolution
    scale = dils[0] / d_true[0]
    np.testing.assert_allclose(dils, d_true * scale, rtol=4e-3)
    pred = np.array([law.predict(m) for m in mus])
    np.testing.assert_allclose(pred, dils, rtol=2e-3)


def test_fit_dilation_law_boundary_raises():
    anchor = _wave(80, 300, speed=1.0)
    runaway = _wave(80, 300, speed=1.0 / 1.3)  # outside the search range
    with pytest.raises(ValueError, match="boundary"):
        fit_dilation_law([anchor, runaway],
                         [dict(a0=9.0), dict(a0=8.0)], features=("a0",),
                         search=(0.9, 1.1))


def test_resample_to_standard_inverts_dilation():
    nt = 600
    d = 1.03
    t_dil = np.arange(1, nt + 1) * d / nt   # dilated sample times
    t_std = np.arange(1, nt + 1) / nt
    traj = np.stack([np.sin(7.0 * t_dil), np.cos(11.0 * t_dil)], axis=1)
    out = resample_to_standard(traj, d, axis=0)
    ref = np.stack([np.sin(7.0 * t_std), np.cos(11.0 * t_std)], axis=1)
    # cubic: O(dt³) ≈ (1/600)³·f⁗-scale — far below the serving band
    assert np.max(np.abs(out - ref)) < 1e-8
    # identity at d=1
    np.testing.assert_array_equal(resample_to_standard(traj, 1.0), traj)


def test_dilation_law_payload_roundtrip():
    law = DilationLaw(names=("a0", "omega"),
                      coef=np.array([1.2, -0.01, 0.002]), floor=1.0)
    p = law.to_payload()
    back = DilationLaw.from_payload(p["names"], p["coef"], p["floor"])
    assert back.names == law.names
    np.testing.assert_array_equal(back.coef, law.coef)
    assert back.floor == law.floor
    assert abs(back.predict(dict(a0=9.0, omega=17.0))
               - law.predict(dict(a0=9.0, omega=17.0))) == 0.0


def test_feature_grammar():
    from romtime_tpu.rom.registration import _feature_value

    mu = dict(a0=8.0, omega=20.0, delta=0.15)
    assert _feature_value(mu, "a0") == 8.0
    assert _feature_value(mu, "a0^2") == 64.0
    assert np.isclose(_feature_value(mu, "delta*omega*a0^-1"),
                      0.15 * 20.0 / 8.0)
    assert np.isclose(_feature_value(mu, "a0*omega"), 160.0)


def test_fit_auto_selects_quadratic_when_needed():
    """Auto feature selection picks the quadratic set when the dilation
    is genuinely quadratic in μ (the wide-Mach-cell regime)."""
    rng = np.random.default_rng(3)
    mus = [dict(a0=float(a), omega=float(w), delta=0.12)
           for a, w in zip(rng.uniform(8, 10, 14), rng.uniform(15, 20, 14))]
    d_true = np.array([1.0 + 0.02 * (m["a0"] - 9) ** 2
                       - 0.004 * (m["omega"] - 17) for m in mus])
    snaps = [_wave(100, 500, speed=1.0 / d) for d in d_true]
    law, dils = fit_dilation_law(snaps, mus, features="auto",
                                 search=(0.9, 1.15))
    assert any("^2" in n or "*" in n for n in law.names), law.names
    pred = np.array([law.predict(m) for m in mus])
    np.testing.assert_allclose(pred, dils, rtol=3e-3)


def test_resample_time_known_shift():
    u = _wave(50, 300, speed=1.0)
    np.testing.assert_allclose(resample_time(u, 1.0), u, atol=0)
    r = resample_time(u, 1.05)
    assert r.shape == u.shape


@pytest.mark.slow
def test_resampler_fidelity_at_flagship_scale():
    """Cubic-resampler fidelity certified at FLAGSHIP scale (VERDICT r4
    item 2): nx=1000, nt=1500, corner μ (a0=8, ω=20, δ=0.148 — the
    steepest, highest-Mach trajectory the registered fleet serves),
    dilation 1.19 (the fleet's measured dil_max).

    What is actually true (and what this test pins):
    (a) SMOOTH content (forcing ω=20, acoustic crossing ~π·a0): the
        implementation interpolates at ≤1e-7 at flagship resolution —
        the O((Ω·dt)⁴) claim, including the clamped boundary stencil.
    (b) The REAL corner trajectory additionally carries near-grid-
        frequency content (steepened waves crossing fixed nodes):
        its measured raw-field cubic fidelity is dt-resolution-limited
        at the 1e-3-class — measured here by the 4th-difference bound
        and the cubic-vs-linear disagreement proxy, and spelled out in
        bench.py's ``fom_dt_gap``. Any claim of 1e-7-class RAW-field
        resampling at this μ would be dishonest; this test fails if
        someone reintroduces it (bound asserted to stay in its
        measured band, not below it).
    (c) The map is LINEAR — resampling the served lane and its
        matched-grid FOM through the same map measures the pure
        reduction error R(u_rom − u_fom) on the standard clock, which
        is what bench.py's ``rel_l2_multi_mu_std`` certifies.
    """
    from romtime_tpu.fom.nonlinear import OneDimensionalBurgers
    from romtime_tpu.problems import define_piston_problem

    nx, nt, tf, d = 1000, 1500, 1.0, 1.19
    mu = dict(a0=8.0, omega=20.0, delta=0.148, alpha=1e-6, gamma=1.4)

    # (a) smooth-content claim at flagship resolution
    h = d * tf / nt
    t_dil = np.arange(1, nt + 1) * h
    t_std = np.arange(1, nt + 1) * (tf / nt)
    w1, w2 = mu["omega"], np.pi * mu["a0"]  # forcing + acoustic crossing
    sig = np.stack([np.sin(w1 * t_dil), np.cos(w2 * t_dil)], axis=0)
    ref = np.stack([np.sin(w1 * t_std), np.cos(w2 * t_std)], axis=0)
    got = resample_to_standard(sig, d, axis=1)
    err_smooth = np.abs(got - ref).max()
    sig_bound = (9.0 / 384.0) * max(w1, w2) ** 4 * h ** 4
    # interior bound + the first-step clamped-stencil extrapolation
    assert err_smooth < 10 * sig_bound, (err_smooth, sig_bound)
    assert err_smooth < 1e-7, err_smooth

    # (b)+(c) on the real flagship corner trajectory
    domain, bcs, forcing, u0, Lt, dLt_dt = define_piston_problem(
        L=1.0, nx=nx, tf=tf * d, nt=nt
    )
    fom = OneDimensionalBurgers(
        domain=domain, dirichlet=bcs, forcing_term=forcing,
        u0=u0, Lt=Lt, dLt_dt=dLt_dt,
    )
    fom.setup()
    fom.update_parametrization(mu)
    fom.solve()
    u = np.asarray(fom.solutions.fom, np.float64)  # (nh, nt), dilated

    # 4th central difference → ‖u⁗‖·h⁴ per step (the cubic error term)
    d4 = u[:, 4:] - 4 * u[:, 3:-1] + 6 * u[:, 2:-2] - 4 * u[:, 1:-3] \
        + u[:, :-4]
    bound_fro = (9.0 / 384.0) * np.linalg.norm(d4) / np.linalg.norm(u)
    # measured band (2026-08-20): 5.97e-4 — dt-resolution-limited, far
    # above the smooth-content 1e-7; assert it stays in its band so the
    # docstring's honest number can't silently rot in either direction
    assert 5e-5 < bound_fro < 5e-3, bound_fro

    # cubic-vs-linear disagreement: an implementation-level proxy for
    # the raw-field interpolation uncertainty (measured 1.3e-3)
    cub = resample_to_standard(u, d, axis=1)
    s = np.arange(1, nt + 1) / d
    i0 = np.clip(np.floor(s).astype(int) - 1, 0, nt - 2)
    fr = s - (i0 + 1)
    lin = u[:, i0] * (1 - fr) + u[:, i0 + 1] * fr
    proxy = np.linalg.norm(cub - lin) / np.linalg.norm(u)
    assert 1e-4 < proxy < 1e-2, proxy

    # (c) exact linearity: the certification comparison resamples the
    # DIFFERENCE field, so reduction-error measurements survive the map
    e = np.sin(50.0 * t_dil)[None, :] * u * 1e-6
    lhs = resample_to_standard(u + e, d, axis=1) - cub
    rhs = resample_to_standard(e, d, axis=1)
    # rtol=0: R(u+e)−R(u) cancels at the f64 eps·‖u‖ absolute scale,
    # which swamps the relative tolerance on near-zero rhs entries
    np.testing.assert_allclose(lhs, rhs, rtol=0, atol=1e-12)


# ---------------------------------------------------------------------------
# Serve-time extrapolation guard (VERDICT r4 item 4: the affine law was
# served with no hull/leverage check — a μ in a training-sampling hole
# mispredicted its dilation by 0.03 and served at 1.5e-4 vs 2e-7 in-hull)
# ---------------------------------------------------------------------------
def test_fitted_law_carries_guard_and_flags_holes():
    """Reproduces the measured incident shape: clustered (first-come)
    training sampling leaves a hole; a held-out μ in the hole must be
    flagged while training-adjacent μ's are not."""
    rng = np.random.default_rng(7)
    # two tight clusters in a0 with an empty middle band — the incident's
    # sampling-hole geometry
    a_lo = rng.uniform(8.0, 8.3, 5)
    a_hi = rng.uniform(9.7, 10.0, 5)
    mus = [dict(a0=float(a), omega=float(w), delta=0.12)
           for a, w in zip(np.concatenate([a_lo, a_hi]),
                           rng.uniform(16.9, 17.1, 10))]
    d_true = np.array([1.0 + 0.01 * (m["a0"] - 9) for m in mus])
    snaps = [_wave(100, 500, speed=1.0 / d) for d in d_true]
    law, _dils = fit_dilation_law(snaps, mus, features=("a0", "omega"),
                                  search=(0.9, 1.15))
    assert law.has_guard

    # every training μ is (by construction) within its own fill distance
    for m in mus:
        assert not bool(law.extrapolation_flag(m)), m
    # a μ adjacent to a cluster is fine
    assert not bool(law.extrapolation_flag(
        dict(a0=float(a_lo.mean()), omega=17.0, delta=0.12)))
    # the hole center is flagged
    assert bool(law.extrapolation_flag(dict(a0=9.0, omega=17.0,
                                            delta=0.12)))
    # so is out-of-hull extrapolation
    assert bool(law.extrapolation_flag(dict(a0=11.0, omega=17.0,
                                            delta=0.12)))


def test_guard_payload_roundtrip():
    law = DilationLaw(
        names=("a0",), coef=np.array([1.1, 0.01]),
        guard_feats=np.array([[0.0], [0.5], [1.0]]),
        guard_inv_span=np.array([2.5]), guard_dref=0.5,
    )
    p = law.to_payload()
    back = DilationLaw.from_payload(**{k: p[k] for k in p})
    assert back.has_guard
    np.testing.assert_array_equal(back.guard_feats, law.guard_feats)
    np.testing.assert_array_equal(back.guard_inv_span, law.guard_inv_span)
    assert back.guard_dref == law.guard_dref
    # guardless laws still roundtrip (backwards compatibility)
    bare = DilationLaw(names=("a0",), coef=np.array([1.1, 0.01]))
    p = bare.to_payload()
    assert "guard_feats" not in p
    back = DilationLaw.from_payload(**{k: p[k] for k in p})
    assert not back.has_guard
    assert back.guard_distance(dict(a0=9.0)) is None
    assert back.extrapolation_flag(dict(a0=9.0)) is None


def test_dilation_guard_flag_in_serving_output(piston_windowed):  # noqa: F811
    """The windowed engines surface the per-lane ``dil_oor`` flag: a lane
    whose μ sits beyond the law's training cloud is marked 1.0, in-cloud
    lanes 0.0 — the serve-time contract for the measured accuracy-cliff
    incident (flag, not silence)."""
    hrom, mu_val, _uh, _dir = piston_windowed
    rom = hrom.rom
    win = rom.windows

    # synthetic guarded law: trained a0 cluster {9.0, 9.2, 9.4}
    # (span 0.4 → guard_feats = a0/0.4, fill distance 0.5, flag
    # threshold 1.5·0.5 = 0.75; guard_feats carry the RAW·inv_span
    # convention of fit_dilation_law — no centering)
    law = DilationLaw(
        names=("a0",), coef=np.array([1.0 - 0.004 * 9.3, 0.004]),
        guard_feats=np.array([[9.0], [9.2], [9.4]]) / 0.4,
        guard_inv_span=np.array([1.0 / 0.4]), guard_dref=0.5,
    )
    mu_in = dict(mu_val, a0=9.1)    # normalized dist 0.25 → in
    mu_out = dict(mu_val, a0=8.0)   # normalized dist 2.50 → flagged
    try:
        win.dilation = law
        _clear_serving_caches(rom)
        outs = rom.solve_batch([mu_in, mu_out], step=Stage.ONLINE,
                               mode="probes", engine="windowed")
    finally:
        win.dilation = None
        _clear_serving_caches(rom)
    np.testing.assert_array_equal(
        np.asarray(outs["dil_oor"], np.float64), [0.0, 1.0]
    )
    # both lanes still served (flag, not refusal)
    assert np.all(np.isfinite(np.asarray(outs["probes"])))


# ---------------------------------------------------------------------------
# Serving identities on the small piston pipeline
# ---------------------------------------------------------------------------
def _clear_serving_caches(rom):
    rom._online_fns = {}
    rom._windowed_lanes_tbl = {}
    rom._windowed_pallas_tbl = None


def test_identity_law_serves_identically(piston_windowed):  # noqa: F811
    """A registration law with d ≡ 1 must reproduce the unregistered
    sweep EXACTLY (×1.0 is exact in every float format) — pinning that
    the dilation plumbing touches nothing else."""
    hrom, mu_val, _uh, _dir = piston_windowed
    rom = hrom.rom
    win = rom.windows

    base = rom.solve_batch([dict(mu_val)], step=Stage.VALIDATION,
                           mode="full", engine="windowed")
    try:
        win.dilation = DilationLaw(names=(), coef=np.array([1.0]))
        _clear_serving_caches(rom)
        reg = rom.solve_batch([dict(mu_val)], step=Stage.VALIDATION,
                              mode="full", engine="windowed")
    finally:
        win.dilation = None
        _clear_serving_caches(rom)

    # ulp-level only: the per-lane clock makes t a (B,) vector where the
    # unregistered trace broadcasts a scalar — XLA reassociates the
    # assembly reductions, so exact bit equality is not achievable.
    np.testing.assert_allclose(reg["uc"][0], base["uc"][0],
                               rtol=1e-11, atol=1e-15)
    np.testing.assert_array_equal(reg["dil"][0], 1.0)
    # per-lane time grid at d=1 equals the standard grid
    np.testing.assert_allclose(reg["t"][0], base["t"], rtol=0, atol=0)


def test_constant_law_equals_rescaled_problem(piston_windowed):  # noqa: F811
    """Serving with d ≡ c must equal the UNREGISTERED sweep of the same
    tables on the time-rescaled problem (tf → c·tf): the dilation enters
    only as dt_b = c·dt and t_k = c·k·dt, which is exactly what the
    rescaled problem's standard clock computes."""
    c = 1.04
    hrom, mu_val, _uh, _dir = piston_windowed
    rom = hrom.rom
    fom = rom.fom
    win = rom.windows

    try:
        win.dilation = DilationLaw(names=(), coef=np.array([c]))
        _clear_serving_caches(rom)
        reg = rom.solve_batch([dict(mu_val)], step=Stage.VALIDATION,
                              mode="full", engine="windowed")
    finally:
        win.dilation = None
        _clear_serving_caches(rom)

    t_orig = fom.domain[fom.T]
    try:
        fom.domain[fom.T] = float(t_orig) * c
        _clear_serving_caches(rom)
        ref = rom.solve_batch([dict(mu_val)], step=Stage.VALIDATION,
                              mode="full", engine="windowed")
    finally:
        fom.domain[fom.T] = t_orig
        _clear_serving_caches(rom)

    np.testing.assert_allclose(reg["t"][0], ref["t"], rtol=1e-14)
    np.testing.assert_allclose(reg["uc"][0], ref["uc"][0],
                               rtol=1e-11, atol=1e-13)


def test_registered_pallas_matches_lanes(piston_windowed):  # noqa: F811
    """The fused pallas path (interpret mode on CPU) applies the same
    dilation plumbing as the lanes engine: probes agree to f32."""
    hrom, mu_val, _uh, _dir = piston_windowed
    rom = hrom.rom
    win = rom.windows
    mus = [dict(mu_val)] * 128  # the pallas kernels serve B % 128 == 0

    try:
        win.dilation = DilationLaw(
            names=("a0",), coef=np.array([1.0 - 0.004 * 9.3, 0.004])
        )  # d(mu_val) ≈ 1.0372 — a real, μ-dependent dilation
        _clear_serving_caches(rom)
        with compute_dtype_scope(jnp.float32):
            lanes = rom.solve_batch(mus, step=Stage.ONLINE, mode="probes",
                                    engine="windowed")
            served = rom.solve_batch(mus, step=Stage.ONLINE, mode="probes",
                                     engine="windowed-pallas")
    finally:
        win.dilation = None
        _clear_serving_caches(rom)

    np.testing.assert_allclose(served["dil"], lanes["dil"], rtol=1e-6)
    scale = np.linalg.norm(lanes["probes"]) / np.sqrt(lanes["probes"].size)
    err = np.max(np.abs(served["probes"] - lanes["probes"])) / scale
    assert err < 5e-5, err
    np.testing.assert_allclose(served["t"], lanes["t"], rtol=1e-6)


# ---------------------------------------------------------------------------
# End-to-end: registered μ-local fleet build + routed serving
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def piston_registered(piston_windowed, tmp_path_factory):  # noqa: F811
    import os

    hrom, mu_val, uh_fom, workdir = piston_windowed
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        prev_ml = hrom.rom.mulocal
        ml = hrom.build_mulocal_serving(
            n_cells=2, n_windows=4, num_basis=12, snapshots_per_cell=3,
            rnd=np.random.RandomState(2), register=[1], dump=False,
            snapshot_cache=False,
        )
    finally:
        os.chdir(cwd)
    return hrom, ml, mu_val, uh_fom, prev_ml


def test_registered_fleet_build(piston_registered):
    hrom, ml, _mu, _uh, _prev = piston_registered
    assert ml.cells[0].dilation is None
    law = ml.cells[1].dilation
    assert law is not None
    assert set(law.names) <= {"a0", "omega", "delta", "alpha", "gamma"}
    # normalized law: ≥ 1 over the training cell
    assert float(law.coef[0]) == law.coef[0]  # finite


def test_registered_routing_and_accuracy(piston_registered):
    """Routed mixed fleet (cell 0 unregistered, cell 1 registered): each
    μ tracks its FOM reference at the MATCHED grid — the registered
    lane's reference is the FOM of the same dilated time grid (the same
    discrete BDF-2 system; the grid is part of the serving
    configuration, see rom/registration.py). The cross-grid
    (resampled-to-standard) comparison is additionally bounded by the
    FOM's own O(dt²) discretization spread."""
    hrom, ml, mu_val, uh_fom, _prev = piston_registered
    rom = hrom.rom
    from romtime_tpu.rom.rom import RomConstructorNonlinear as RCN

    mu_lo = dict(a0=9.8, omega=15.5, delta=0.10, alpha=1e-6, gamma=1.4)
    mu_hi = dict(a0=8.1, omega=19.5, delta=0.148, alpha=1e-6, gamma=1.4)
    cells = [int(ml.cell_of(RCN.compute_piston_mach_number(m)))
             for m in (mu_lo, mu_hi)]
    assert cells == [0, 1], cells

    outs = rom.solve_batch_mulocal([dict(mu_lo), dict(mu_hi)],
                                   step=Stage.VALIDATION, mode="full",
                                   engine="windowed")
    dils = np.asarray(outs["dil"], np.float64)
    assert dils[0] == 1.0 and dils[1] > 1.0

    fom = hrom.fom
    t_orig = fom.domain[fom.T]
    for i, m in enumerate((mu_lo, mu_hi)):
        d = float(dils[i])
        try:
            fom.domain[fom.T] = float(t_orig) * d
            fom._solve_jit = {}
            fom.setup()
            fom.update_parametrization(m)
            fom.solve()
            ref = np.asarray(fom.solutions.fom)  # matched (dilated) grid
        finally:
            fom.domain[fom.T] = t_orig
            fom._solve_jit = {}
        u = np.asarray(outs["uc"][i]).T
        rel = np.linalg.norm(u - ref) / np.linalg.norm(ref)
        # measured: 1.6e-4-class at cell 0, 2.7e-3 at the tiny high-Mach
        # cell (3 trajectories, N=12/W=4) — registered ≤ unregistered
        # (3.7e-3) on the same build
        assert rel < 4e-3, (i, rel)

    # cross-grid comparison stays bounded by the FOM dt-spread
    fom.setup()
    fom.update_parametrization(mu_hi)
    fom.solve()
    ref_std = np.asarray(fom.solutions.fom)
    u_std = resample_to_standard(np.asarray(outs["uc"][1]),
                                 float(dils[1]), axis=0).T
    rel_std = np.linalg.norm(u_std - ref_std) / np.linalg.norm(ref_std)
    assert rel_std < 2e-2, rel_std


def test_registered_mulocal_npz_roundtrip(piston_registered, tmp_path):
    hrom, ml, _mu, _uh, _prev = piston_registered
    from romtime_tpu.rom.windowed import MuLocalWindowed

    path = tmp_path / "ml_registered.npz"
    ml.dump(path)
    back = MuLocalWindowed.load(path)
    assert back.cells[0].dilation is None
    law, law0 = back.cells[1].dilation, ml.cells[1].dilation
    assert law.names == law0.names
    np.testing.assert_array_equal(law.coef, law0.coef)
    mu = dict(a0=8.1, omega=19.5, delta=0.148, alpha=1e-6, gamma=1.4)
    assert law.predict(mu) == law0.predict(mu)


def test_register_auto_skips_unalignable_cells(piston_registered,
                                               piston_windowed,  # noqa: F811
                                               monkeypatch):
    """register="auto" degrades gracefully: a cell whose phase spread
    defeats the scalar-dilation search builds UNREGISTERED instead of
    failing the whole fleet (the lowest-Mach cell's 1/a0 spread does
    this at the flagship box)."""
    import os

    hrom, _ml, _mu, _uh, _prev = piston_registered
    _h, _m, _u, workdir = piston_windowed  # builds need the basis pickles

    # the builder imports the symbol function-locally — patch the source
    import romtime_tpu.rom.registration as reg_mod

    def always_boundary(*a, **k):
        raise ValueError("dilation search ... hit the boundary")

    monkeypatch.setattr(reg_mod, "fit_dilation_law", always_boundary)

    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        ml = hrom.build_mulocal_serving(
            n_cells=2, n_windows=4, num_basis=12, snapshots_per_cell=2,
            rnd=np.random.RandomState(5), register="auto", dump=False,
            snapshot_cache=False,
        )
        assert all(w.dilation is None for w in ml.cells)

        # an explicit list still raises
        with pytest.raises(ValueError, match="boundary"):
            hrom.build_mulocal_serving(
                n_cells=2, n_windows=4, num_basis=12,
                snapshots_per_cell=2, rnd=np.random.RandomState(5),
                register=[0, 1], dump=False, snapshot_cache=False,
            )
    finally:
        os.chdir(cwd)


def test_dil_oor_rides_mulocal_routing(piston_registered):
    """Mixed fleet: the registered cell's per-lane dil_oor flag merges
    through route_mulocal; unregistered-cell rows fill with 0.0 (no law
    to extrapolate). The flag value equals the law's own host-side
    verdict for the same μ."""
    hrom, ml, mu_val, _uh, _prev = piston_registered
    rom = hrom.rom
    law = ml.cells[1].dilation
    if not law.has_guard:
        pytest.skip("fitted law carries no guard at this training count")

    mu_lo = dict(a0=9.8, omega=15.5, delta=0.10, alpha=1e-6, gamma=1.4)
    mu_hi = dict(a0=8.1, omega=19.5, delta=0.148, alpha=1e-6, gamma=1.4)
    prev_ml = rom.mulocal
    rom.mulocal = ml
    try:
        outs = rom.solve_batch_mulocal([dict(mu_lo), dict(mu_hi)],
                                       step=Stage.VALIDATION,
                                       mode="probes", engine="windowed")
    finally:
        rom.mulocal = prev_ml
    oor = np.asarray(outs["dil_oor"], np.float64)
    assert oor.shape == (2,)
    assert oor[0] == 0.0  # unregistered cell: filled
    expected = float(bool(law.extrapolation_flag(mu_hi)))
    assert oor[1] == expected, (oor[1], expected)


def test_registered_restores_mulocal(piston_registered):
    """The registered build replaced rom.mulocal — restore the previous
    fleet for downstream module-scoped tests."""
    hrom, _ml, _mu, _uh, prev = piston_registered
    hrom.rom.mulocal = prev
    assert hrom.rom.mulocal is prev
