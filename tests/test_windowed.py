"""Time-windowed local-basis serving (rom/windowed.py + the v2 pallas
kernels): builder invariants, engine consistency, and f32 drift."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from romtime_tpu.conventions import (
    OperatorType,
    PistonParameters,
    RomParameters,
    Stage,
)
from romtime_tpu.dtypes import compute_dtype_scope
from romtime_tpu.parameters import get_uniform_dist
from romtime_tpu.problems import define_piston_problem
from romtime_tpu.rom.hrom import HyperReducedPiston
from romtime_tpu.rom.windowed import build_windowed_basis


def test_build_windowed_basis_invariants():
    rng = np.random.default_rng(0)
    nh, nt = 60, 64
    snaps = [
        np.linalg.qr(rng.normal(size=(nh, 16)))[0]
        @ rng.normal(size=(16, nt))
        for _ in range(2)
    ]
    bounds, Vs, transfers = build_windowed_basis(
        snaps, n_windows=4, num_basis=8
    )
    assert bounds[0] == 0 and bounds[-1] == nt
    assert Vs.shape == (4, nh, 8)
    for V in Vs:
        np.testing.assert_allclose(V.T @ V, np.eye(8), atol=1e-12)
    assert transfers.shape == (3, 8, 8)
    np.testing.assert_allclose(transfers[0], Vs[1].T @ Vs[0], atol=1e-14)


# _piston_windowed_setup and the module-scoped piston_windowed fixture
# live in conftest.py (shared with tests/test_registration.py).
from conftest import _piston_windowed_setup  # noqa: E402


def test_windowed_tracks_fom(piston_windowed):
    hrom, mu_val, uh_fom, _dir = piston_windowed
    rom = hrom.rom
    outs = rom.solve_batch([dict(mu_val)], step=Stage.VALIDATION,
                           mode="full", engine="windowed")
    u = outs["uc"][0].T
    rel = np.linalg.norm(u - uh_fom) / np.linalg.norm(uh_fom)
    # N=12-per-window at W=4: the chained windowed solve must track the
    # FOM through all boundary transfers (measured ≈1.6e-4).
    assert rel < 1e-3, rel


def test_windowed_f32_drift(piston_windowed):
    hrom, mu_val, uh_fom, _dir = piston_windowed
    rom = hrom.rom
    outs = rom.solve_batch([dict(mu_val)], step=Stage.VALIDATION,
                           mode="full", engine="windowed")
    u64 = outs["uc"][0]
    with compute_dtype_scope(jnp.float32):
        rom._online_fns = {}
        outs32 = rom.solve_batch([dict(mu_val)], step=Stage.VALIDATION,
                                 mode="full", engine="windowed")
        rom._online_fns = {}
    u32 = outs32["uc"][0]
    drift = np.linalg.norm(u32 - u64) / np.linalg.norm(u64)
    assert drift < 5e-7, drift


@pytest.mark.slow
def test_windowed_pallas_matches_windowed_lanes(piston_windowed):
    hrom, mu_val, _, _dir = piston_windowed
    rom = hrom.rom
    mus = [dict(mu_val)] * 128

    with compute_dtype_scope(jnp.float32):
        try:
            lanes = rom.solve_batch(mus, step=Stage.ONLINE, mode="probes",
                                    engine="windowed")
            served = rom.solve_batch(mus, step=Stage.ONLINE, mode="probes",
                                     engine="windowed-pallas")
        finally:
            rom._online_fns = {}
    scale = max(np.abs(lanes["probes"]).max(), 1e-3)
    np.testing.assert_allclose(served["probes"], lanes["probes"],
                               atol=5e-6 * scale)
    np.testing.assert_allclose(served["uN_final"], lanes["uN_final"],
                               atol=5e-5)


@pytest.mark.parametrize("kernel", ["v2", "fused"])
def test_windowed_pallas_theta_scan_matches_lanes(piston_windowed,
                                                  monkeypatch, kernel):
    """The θ-streaming windowed path must match the lanes engine for BOTH
    kernel generations (v2 scan-of-launches and the v3 fused single
    launch). The materialized path is exercised by the test above; this
    one forces the serving-batch (θ) branch by zeroing the precompute
    budget."""
    hrom, mu_val, _, _dir = piston_windowed
    rom = hrom.rom
    mus = [dict(mu_val)] * 128
    monkeypatch.setenv("ROMTIME_WINDOWED_KERNEL", kernel)

    budget = type(rom).ONLINE_PRECOMPUTE_BUDGET
    with compute_dtype_scope(jnp.float32):
        try:
            type(rom).ONLINE_PRECOMPUTE_BUDGET = 0
            lanes = rom.solve_batch(mus, step=Stage.ONLINE, mode="probes",
                                    engine="windowed")
            served = rom.solve_batch(mus, step=Stage.ONLINE, mode="probes",
                                     engine="windowed-pallas")
        finally:
            type(rom).ONLINE_PRECOMPUTE_BUDGET = budget
            rom._online_fns = {}
    scale = max(np.abs(lanes["probes"]).max(), 1e-3)
    np.testing.assert_allclose(served["probes"], lanes["probes"],
                               atol=5e-6 * scale)
    np.testing.assert_allclose(served["uN_final"], lanes["uN_final"],
                               atol=5e-5)


def test_windowed_serving_npz_roundtrip(piston_windowed):
    """WindowedServing.dump/load must be bit-exact for every artifact."""
    from romtime_tpu.conventions import StorageNames
    from romtime_tpu.rom.windowed import WindowedServing

    hrom, _mu_val, _uh, workdir = piston_windowed
    win = hrom.rom.windows
    loaded = WindowedServing.load(workdir / StorageNames.WINDOWS)

    np.testing.assert_array_equal(loaded.bounds, win.bounds)
    np.testing.assert_array_equal(loaded.Vs, win.Vs)
    np.testing.assert_array_equal(loaded.transfers, win.transfers)
    assert set(loaded.combines) == set(win.combines)
    for name in win.combines:
        np.testing.assert_array_equal(loaded.combines[name],
                                      win.combines[name])
    np.testing.assert_array_equal(loaded.trilinear, win.trilinear)


def test_windowed_resume_from_existing_basis(piston_windowed, monkeypatch):
    """Driver-level resume restores a SERVING-READY windowed configuration
    (reference resume semantics: rom/hrom.py:344-417) — no offline phase,
    no rebuild of rom.windows — and serves identically to the original."""
    hrom, mu_val, _uh, workdir = piston_windowed
    monkeypatch.chdir(workdir)

    setup = _piston_windowed_setup()
    setup["rom_params"][RomParameters.SROM_KEEP] = hrom.srom.N
    fresh = HyperReducedPiston(**setup, rnd=np.random.RandomState(0))
    fresh.setup()
    fresh.setup_hyperreduction()
    fresh.start_from_existing_basis()
    fresh.project_reductors()

    assert fresh.rom.windows is not None
    assert fresh.rom.windows.n_windows == hrom.rom.windows.n_windows
    np.testing.assert_array_equal(fresh.rom.windows.Vs, hrom.rom.windows.Vs)

    outs_orig = hrom.rom.solve_batch(
        [dict(mu_val)], step=Stage.VALIDATION, mode="full", engine="windowed"
    )
    outs_res = fresh.rom.solve_batch(
        [dict(mu_val)], step=Stage.VALIDATION, mode="full", engine="windowed"
    )
    hrom.rom._online_fns = {}
    fresh.rom._online_fns = {}
    np.testing.assert_allclose(
        outs_res["uc"], outs_orig["uc"], rtol=0, atol=1e-12
    )


def test_windowed_estimator_tracks_error(piston_windowed):
    """estimate_batch(engine="windowed"): the sacrificial-windowed
    estimator must track the true per-step ROM-vs-FOM RMS error of the
    flagship windowed serving path within a measured band (reference
    online certification semantics: rom/hrom.py:563-574)."""
    from romtime_tpu.conventions import Errors

    hrom, mu_val, uh_fom, _dir = piston_windowed
    assert hrom.windows_srom is not None
    assert hrom.windows_srom.N == hrom.rom.windows.N + 4
    # POD nesting: the first N columns of the enriched per-window basis
    # ARE the serving basis (same SVD, longer truncation).
    np.testing.assert_allclose(
        hrom.windows_srom.Vs[:, :, : hrom.rom.windows.N],
        hrom.rom.windows.Vs, atol=1e-12,
    )

    out = hrom.estimate_batch([dict(mu_val)], step=Stage.VALIDATION,
                              engine="windowed")
    est = np.asarray(out[Errors.ESTIMATOR][0])  # (nt,)

    outs = hrom.rom.solve_batch([dict(mu_val)], step=Stage.VALIDATION,
                                mode="full", engine="windowed")
    hrom.rom._online_fns = {}
    uh_rom = np.asarray(outs["uc"][0]).T  # (nh, nt)
    nh = uh_fom.shape[0]
    true_rms = np.linalg.norm(uh_rom - uh_fom, axis=0) / np.sqrt(nh)

    ratio = est.mean() / true_rms.mean()
    assert 0.05 < ratio < 20.0, ratio


def test_windowed_chained_unequal_widths(piston_windowed):
    """Unequal window widths (nt=96, W=5 → widths 19/19/19/19/20) must
    dispatch to the per-window chained fallback
    (rom.py _online_sweep_windowed_chained) and still track the FOM."""
    hrom, mu_val, uh_fom, _dir = piston_windowed
    rom = hrom.rom
    saved = rom.windows
    try:
        rom.windows = None
        win = hrom.build_windowed_serving(n_windows=5, num_basis=12,
                                          dump=False)
        assert len(set(np.diff(win.bounds).tolist())) > 1, (
            "expected unequal widths for this config"
        )
        rom._online_fns = {}
        outs = rom.solve_batch([dict(mu_val)], step=Stage.VALIDATION,
                               mode="full", engine="windowed")
        u = outs["uc"][0].T
        rel = np.linalg.norm(u - uh_fom) / np.linalg.norm(uh_fom)
        assert rel < 1e-3, rel
    finally:
        rom.windows = saved
        rom._online_fns = {}


def test_windowed_heat():
    """build_windowed_serving is family-generic: the heat (fixed) pipeline
    serves through the windowed lanes engine and tracks the FOM (no
    trilinear fast path, affine operators only)."""
    import os
    import tempfile

    from romtime_tpu.problems import define_mfp1_problem
    from romtime_tpu.rom.hrom import HyperReducedOrderModelFixed

    L, nx, tf, nt = 2.0, 60, 10.0, 40
    domain, bcs, forcing, u0, ue, _Lt, _dLt = define_mfp1_problem(
        L, nx, tf, nt
    )
    grid = {
        "delta": get_uniform_dist(min=0.01, max=2.0),
        "beta": get_uniform_dist(min=1.0, max=10.0),
        "alpha_0": get_uniform_dist(min=0.01, max=2.0),
    }
    ts = np.linspace(tf / nt, tf, nt)
    hrom = HyperReducedOrderModelFixed(
        grid=grid,
        fom_params=dict(domain=domain, dirichlet=bcs, forcing_term=forcing,
                        u0=u0, exact_solution=ue,
                        grid_params={k: "uniform" for k in grid}),
        rom_params={RomParameters.NUM_SNAPSHOTS: 3,
                    RomParameters.SROM_TRUNCATE: 2,
                    RomParameters.TOL_TIME: None,
                    RomParameters.TOL_MU: None},
        deim_params={RomParameters.TS: ts, RomParameters.NUM_SNAPSHOTS: 3},
        mdeim_params={RomParameters.TS: ts, RomParameters.NUM_SNAPSHOTS: 3},
        models={OperatorType.MASS: True, OperatorType.STIFFNESS: True,
                OperatorType.RHS: True},
        rnd=np.random.RandomState(0),
    )
    cwd = os.getcwd()
    os.chdir(tempfile.mkdtemp())
    try:
        hrom.setup()
        hrom.setup_hyperreduction()
        hrom.run_offline_rom()
        hrom.run_offline_hyperreduction(
            mu_space=hrom.mu_space[Stage.OFFLINE], evaluate=False
        )
        hrom.project_reductors()
        rom = hrom.rom
        hrom.build_windowed_serving(n_windows=4, num_basis=8, dump=False)

        mu_val = dict(delta=0.9, beta=4.5, alpha_0=1.1)
        fom = hrom.fom
        fom.setup()
        fom.update_parametrization(mu_val)
        fom.solve()
        uh_fom = np.asarray(fom.solutions.fom)

        outs = rom.solve_batch([dict(mu_val)], step=Stage.VALIDATION,
                               mode="full", engine="windowed")
        rom._online_fns = {}
        u = outs["uc"][0].T
        rel = np.linalg.norm(u - uh_fom) / np.linalg.norm(uh_fom)
        assert rel < 1e-4, rel
    finally:
        os.chdir(cwd)


def test_piston_hrom_fast_smoke(piston_windowed):
    """Fast-tier piston HROM end-to-end: the global-basis serial solve and
    the global S-ROM estimate_batch run on the flagship (piston) pipeline
    without the slow tier (VERDICT r2 item 6)."""
    from romtime_tpu.conventions import Errors

    hrom, mu_val, uh_fom, _dir = piston_windowed
    rom = hrom.rom
    rom.solve(mu=dict(mu_val), step=Stage.VALIDATION)
    rel = (np.linalg.norm(rom.solutions.fom - uh_fom)
           / np.linalg.norm(uh_fom))
    assert rel < 1e-2, rel

    out = hrom.estimate_batch([dict(mu_val)], step=Stage.VALIDATION)
    est = np.asarray(out[Errors.ESTIMATOR][0])
    assert est.shape == (uh_fom.shape[1],)
    assert np.all(est >= 0) and np.all(np.isfinite(est))


# ---------------------------------------------------------------------------
# μ-local (Mach-cell) windowed serving — rom/windowed.py MuLocalWindowed,
# hrom.build_mulocal_serving, rom.solve_batch_mulocal. No reference analog
# (the reference serves one global basis, rom/rom.py:430-555).
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def piston_mulocal(piston_windowed):
    import os

    hrom, mu_val, uh_fom, workdir = piston_windowed
    cwd = os.getcwd()
    # Build in the pipeline's own artifact directory: the per-cell
    # N-MDEIM retrain restores the box-wide collateral basis from its
    # pickle there, and the mu-local npz persists next to the basis.
    os.chdir(workdir)
    try:
        ml = hrom.build_mulocal_serving(
            n_cells=2, n_windows=4, num_basis=12, snapshots_per_cell=2,
            rnd=np.random.RandomState(1),
        )
    finally:
        os.chdir(cwd)
    return hrom, ml, mu_val, uh_fom, workdir


def test_mulocal_build_invariants(piston_mulocal):
    hrom, ml, _mu, _uh, _dir = piston_mulocal
    assert ml.n_cells == 2
    assert len(ml.edges) == 3
    assert all(w.n_windows == 4 and w.N == 12 for w in ml.cells)
    # Routing covers the whole admissible range, clipped outside.
    assert ml.cell_of(0.0) == 0 and ml.cell_of(99.0) == 1
    assert hrom.rom.mulocal is ml


def test_mulocal_routing_matches_direct_cell_solve(piston_mulocal):
    """Routed sweep ≡ manually attaching each μ's cell tables: the same
    compiled engine, the same numbers."""
    hrom, ml, mu_val, _uh, _dir = piston_mulocal
    rom = hrom.rom
    from romtime_tpu.rom.rom import RomConstructorNonlinear as RCN

    # Two μ in different Mach cells.
    mu_lo = dict(a0=9.8, omega=15.5, delta=0.10, alpha=1e-6, gamma=1.4)
    mu_hi = dict(a0=8.1, omega=19.5, delta=0.148, alpha=1e-6, gamma=1.4)
    cells = [int(ml.cell_of(RCN.compute_piston_mach_number(m)))
             for m in (mu_lo, mu_hi)]
    assert cells == [0, 1], cells

    routed = rom.solve_batch_mulocal([dict(mu_lo), dict(mu_hi)],
                                     step=Stage.VALIDATION, mode="full",
                                     engine="windowed")
    prev = rom.windows
    try:
        direct = []
        for m, c in zip((mu_lo, mu_hi), cells):
            rom._set_serving_windows(ml.cells[c])
            outs = rom.solve_batch([dict(m), dict(m)],
                                   step=Stage.VALIDATION, mode="full",
                                   engine="windowed")
            direct.append(np.asarray(outs["uc"][0]))
    finally:
        rom._set_serving_windows(prev)

    for i in range(2):
        np.testing.assert_allclose(routed["uc"][i], direct[i],
                                   rtol=0, atol=0)
    # The pre-routing global configuration is restored.
    assert rom.windows is prev


def test_mulocal_tracks_fom(piston_mulocal):
    hrom, ml, mu_val, uh_fom, _dir = piston_mulocal
    outs = hrom.rom.solve_batch_mulocal([dict(mu_val)],
                                        step=Stage.VALIDATION,
                                        mode="full", engine="windowed")
    u = np.asarray(outs["uc"][0]).T
    rel = np.linalg.norm(u - uh_fom) / np.linalg.norm(uh_fom)
    assert rel < 1e-3, rel


def test_mulocal_npz_roundtrip_and_resume(piston_mulocal):
    import os

    from romtime_tpu.conventions import StorageNames
    from romtime_tpu.rom.windowed import MuLocalWindowed

    hrom, ml, _mu, _uh, workdir = piston_mulocal
    path = os.path.join(workdir, StorageNames.WINDOWS_MULOCAL)
    assert os.path.exists(path)
    loaded = MuLocalWindowed.load(path)
    np.testing.assert_array_equal(loaded.edges, ml.edges)
    assert loaded.n_cells == ml.n_cells
    for a, b in zip(loaded.cells, ml.cells):
        np.testing.assert_array_equal(a.Vs, b.Vs)
        np.testing.assert_array_equal(a.transfers, b.transfers)
        assert sorted(a.combines) == sorted(b.combines)
        for k in a.combines:
            np.testing.assert_array_equal(a.combines[k], b.combines[k])
        np.testing.assert_array_equal(a.trilinear, b.trilinear)


def test_mulocal_snapshot_cache_rebuild(piston_mulocal):
    """Re-building the fleet at a DIFFERENT (W, N) reuses the persisted
    per-cell training trajectories (mulocal_snapshots.npz) — the dominant
    fleet-build cost — paying only the per-window POD/projection stage.
    Verified by making fom.solve unreachable: a cache miss would raise."""
    import os

    from romtime_tpu.conventions import StorageNames

    hrom, ml, _mu, _uh, workdir = piston_mulocal
    rom = hrom.rom
    assert os.path.exists(
        os.path.join(workdir, StorageNames.MULOCAL_SNAPSHOTS)
    )
    fom = hrom.fom
    orig_solve = fom.solve

    def _boom(*a, **k):
        raise AssertionError("cache miss: fom.solve called during rebuild")

    cwd = os.getcwd()
    os.chdir(workdir)
    fom.solve = _boom
    try:
        # Same edges + per-cell counts (the cache key), new shapes.
        rebuilt = hrom.build_mulocal_serving(
            n_cells=2, n_windows=4, num_basis=12, snapshots_per_cell=2,
            rnd=np.random.RandomState(1), cell_wn=[(4, 12), (2, 14)],
            dump=False, snapshot_cache=True,
        )
    finally:
        fom.solve = orig_solve
        os.chdir(cwd)
        rom.mulocal = ml
        rom._online_fns = {}
    assert rebuilt.cell_wn == [(4, 12), (2, 14)]
    # The unchanged-(W, N) cell is built from the SAME cached snapshots:
    # identical per-window bases.
    np.testing.assert_array_equal(rebuilt.cells[0].Vs, ml.cells[0].Vs)


def test_mulocal_mixed_cell_wn(piston_windowed, tmp_path):
    """Mixed-(W, N) μ-local fleet: per-cell serving shapes (cell_wn) —
    the high-Mach cell can carry more per-window capacity (its projection
    floor is N-bound) while the rest of the box serves at a cheaper N.
    Routing, the per-cell S-ROM estimator, and the npz round-trip must
    all preserve the per-cell shapes. No reference analog (the reference
    serves one global basis, rom/rom.py:430-555)."""
    import os

    from romtime_tpu.conventions import Errors
    from romtime_tpu.rom.rom import RomConstructorNonlinear as RCN
    from romtime_tpu.rom.windowed import MuLocalWindowed

    hrom, mu_val, uh_fom, workdir = piston_windowed
    rom = hrom.rom
    prev_ml = rom.mulocal
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        ml = hrom.build_mulocal_serving(
            n_cells=2, n_windows=4, num_basis=12, snapshots_per_cell=2,
            rnd=np.random.RandomState(5), cell_wn=[(4, 12), (2, 16)],
            srom_extra=4, dump=False,
        )
    finally:
        os.chdir(cwd)
    try:
        assert ml.cell_wn == [(4, 12), (2, 16)]
        assert not ml.is_uniform
        assert [(w.n_windows, w.N) for w in ml.cells_srom] \
            == [(4, 16), (2, 20)]

        # Routed sweep ≡ manually attaching each μ's cell tables, at
        # per-cell shapes (each distinct (W, N) group retraces its own
        # engine — tables are runtime jit arguments).
        mu_lo = dict(a0=9.8, omega=15.5, delta=0.10, alpha=1e-6,
                     gamma=1.4)
        mu_hi = dict(a0=8.1, omega=19.5, delta=0.148, alpha=1e-6,
                     gamma=1.4)
        cells = [int(ml.cell_of(RCN.compute_piston_mach_number(m)))
                 for m in (mu_lo, mu_hi)]
        assert cells == [0, 1], cells
        routed = rom.solve_batch_mulocal(
            [dict(mu_lo), dict(mu_hi)], step=Stage.VALIDATION,
            mode="full", engine="windowed",
        )
        prev = rom.windows
        try:
            for i, (m, c) in enumerate(zip((mu_lo, mu_hi), cells)):
                rom._set_serving_windows(ml.cells[c])
                outs = rom.solve_batch([dict(m), dict(m)],
                                       step=Stage.VALIDATION,
                                       mode="full", engine="windowed")
                np.testing.assert_allclose(routed["uc"][i],
                                           outs["uc"][0], rtol=0, atol=0)
        finally:
            rom._set_serving_windows(prev)

        # Accuracy through the routed path at the held-out μ.
        outs = rom.solve_batch_mulocal([dict(mu_val)],
                                       step=Stage.VALIDATION,
                                       mode="full", engine="windowed")
        u = np.asarray(outs["uc"][0]).T
        rel = np.linalg.norm(u - uh_fom) / np.linalg.norm(uh_fom)
        assert rel < 1e-3, rel

        # Per-cell estimator at mixed sacrificial shapes.
        est = hrom.estimate_batch_mulocal([dict(mu_lo), dict(mu_hi)],
                                          step=Stage.VALIDATION)
        for i in range(2):
            e = np.asarray(est[Errors.ESTIMATOR][i])
            assert np.all(np.isfinite(e)) and np.all(e >= 0)

        # npz round-trip preserves the per-cell shapes (serving_ns).
        path = str(tmp_path / "mixed_mulocal.npz")
        ml.dump(path)
        loaded = MuLocalWindowed.load(path)
        assert loaded.cell_wn == ml.cell_wn
        for a, b in zip(loaded.cells, ml.cells):
            np.testing.assert_array_equal(a.Vs, b.Vs)
            for k in b.combines:
                np.testing.assert_array_equal(a.combines[k],
                                              b.combines[k])
    finally:
        rom.mulocal = prev_ml
        rom._online_fns = {}


def test_mulocal_snapshot_cache_precision_guard(piston_mulocal):
    """The trajectory cache records its build precision: a cache written
    by an accelerator f32 sweep (build='device-f32') or a legacy cache
    without the tag must NOT satisfy an f64 certification build — it is
    rebuilt from fresh FOM solves. Regression for the 2026-08-18 on-chip
    incident where a TPU-f32-swept cache silently fed an 'f64' fleet
    rebuild (center-μ rel-L2 degraded 2.5e-7 → 3.2e-5)."""
    import os

    from romtime_tpu.conventions import StorageNames

    hrom, ml, _mu, _uh, workdir = piston_mulocal
    rom = hrom.rom
    fom = hrom.fom
    path = os.path.join(workdir, StorageNames.MULOCAL_SNAPSHOTS)

    # The fixture's host build tagged its cache f64.
    with np.load(path) as d:
        assert "build" in d and str(d["build"]) == "f64"
        payload = {k: d[k] for k in d.files}

    calls = {"n": 0}
    orig_solve = fom.solve

    def counting_solve(*a, **k):
        calls["n"] += 1
        return orig_solve(*a, **k)

    cwd = os.getcwd()
    os.chdir(workdir)
    fom.solve = counting_solve
    try:
        for taint in ("device-f32", None):
            tainted = dict(payload)
            if taint is None:
                tainted.pop("build", None)  # legacy, untagged
            else:
                tainted["build"] = np.asarray(taint)
            np.savez(path, **tainted)
            calls["n"] = 0
            hrom.build_mulocal_serving(
                n_cells=2, n_windows=4, num_basis=12,
                snapshots_per_cell=2, rnd=np.random.RandomState(1),
                dump=False, snapshot_cache=True,
            )
            assert calls["n"] > 0, (
                f"tainted cache (build={taint!r}) satisfied an f64 build"
            )
            # The rebuild re-tags the refreshed cache as f64.
            with np.load(path) as d:
                assert str(d["build"]) == "f64"
    finally:
        fom.solve = orig_solve
        os.chdir(cwd)
        np.savez(path, **payload)
        rom.mulocal = ml
        rom._online_fns = {}


def test_windowed_truncate_nested(piston_windowed):
    """WindowedServing.truncate(N) of an (N+Δ)-mode build must equal the
    direct N-mode build: per-window POD bases nest, so every serving
    artifact is a pure slice (this is what lets one projection loop yield
    both the serving configuration and its sacrificial S-ROM reference)."""
    hrom, _mu, _uh, _dir = piston_windowed
    rom = hrom.rom
    enriched = hrom.windows_srom
    assert enriched is not None and enriched.N == 16
    sliced = enriched.truncate(12)

    prev = rom.windows
    try:
        direct = rom.build_windowed_serving(
            n_windows=4, num_basis=12,
            snapshots=hrom.srom.offline_snapshots,
        )
    finally:
        rom._set_serving_windows(prev)

    np.testing.assert_allclose(sliced.Vs, direct.Vs, atol=1e-12)
    np.testing.assert_allclose(sliced.transfers, direct.transfers,
                               atol=1e-12)
    for k in direct.combines:
        np.testing.assert_allclose(sliced.combines[k], direct.combines[k],
                                   atol=1e-10)
    np.testing.assert_allclose(sliced.trilinear, direct.trilinear,
                               atol=1e-10)


def test_mulocal_estimator_tracks_error(piston_windowed):
    """estimate_batch_mulocal: per-cell nested sacrificial references —
    the windowed S-ROM estimator routed like the serving itself. The
    estimator must land within two orders of the true error (reference
    certification semantics, rom/hrom.py:563-574)."""
    import os

    from romtime_tpu.conventions import Errors

    hrom, mu_val, uh_fom, workdir = piston_windowed
    rom = hrom.rom
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        ml = hrom.build_mulocal_serving(
            n_cells=2, n_windows=4, num_basis=12, snapshots_per_cell=2,
            rnd=np.random.RandomState(1), srom_extra=4, dump=False,
        )
    finally:
        os.chdir(cwd)
    assert ml.cells_srom is not None
    assert all(w.N == 16 for w in ml.cells_srom)
    assert all(w.N == 12 for w in ml.cells)

    mu_lo = dict(a0=9.8, omega=15.5, delta=0.10, alpha=1e-6, gamma=1.4)
    mus = [dict(mu_val), mu_lo]
    est = hrom.estimate_batch_mulocal(mus, step=Stage.VALIDATION)
    avg = np.asarray(est[Errors.AVERAGE_ESTIMATOR])
    assert avg.shape == (2,)
    assert np.all(np.isfinite(avg)) and np.all(avg > 0)

    # True error of the routed serving on the validation parameter.
    outs = rom.solve_batch_mulocal([dict(mu_val)], step=Stage.VALIDATION,
                                   mode="full", engine="windowed")
    u = np.asarray(outs["uc"][0]).T
    true_rms = np.linalg.norm(u - uh_fom) / np.sqrt(u.size)
    est_rms = float(np.sqrt(np.mean(
        np.asarray(est[Errors.ESTIMATOR][0]) ** 2)))
    ratio = est_rms / max(true_rms, 1e-300)
    assert 1e-2 < ratio < 1e2, (est_rms, true_rms)


def test_mulocal_device_sweep_matches_serial(piston_windowed):
    """build_mulocal_serving(device_sweep=True) — the cells' FOM fleet in
    ONE vmapped launch (parallel/sweep.py) — must reproduce the serial
    per-μ loop's cells (f64 on the CPU backend: same arithmetic path as
    the build_reduced_basis device-sweep equivalence, tests/test_parallel)."""
    import os

    hrom, _mu, _uh, workdir = piston_windowed
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        serial = hrom.build_mulocal_serving(
            n_cells=2, n_windows=4, num_basis=12, snapshots_per_cell=2,
            rnd=np.random.RandomState(5), dump=False,
        )
        batched = hrom.build_mulocal_serving(
            n_cells=2, n_windows=4, num_basis=12, snapshots_per_cell=2,
            rnd=np.random.RandomState(5), dump=False, device_sweep=True,
        )
    finally:
        os.chdir(cwd)
    for a, b in zip(serial.cells, batched.cells):
        scale = np.abs(a.Vs).max()
        np.testing.assert_allclose(b.Vs, a.Vs, atol=1e-8 * scale)
        np.testing.assert_allclose(b.trilinear, a.trilinear,
                                   atol=1e-6 * np.abs(a.trilinear).max())


def test_windowed_sharded_matches_single_device(piston_windowed):
    """solve_online_windowed_sharded (flagship serving sharded over the
    8-virtual-device mesh, parallel/sweep.py) must reproduce the
    single-device windowed engine bitwise-closely in f64 — same compiled
    window body, μ-batch split over the mesh (9 μ exercises padding)."""
    from romtime_tpu.parallel import device_mesh, solve_online_windowed_sharded

    hrom, mu_val, _uh, _dir = piston_windowed
    rom = hrom.rom
    mesh = device_mesh(8)

    mus = list(rom.build_sampling_space(num=11,
                                        rnd=np.random.RandomState(11)))
    for m in mus:
        m.pop(PistonParameters.MACH_PISTON, None)
    if len(mus) % 8 == 0:  # force padding (stratified sampler yields ≤num)
        mus = mus[:-1]
    n = len(mus)

    ref = rom.solve_batch([dict(m) for m in mus], step=Stage.ONLINE,
                          mode="probes", engine="windowed")
    rom._online_fns = {}
    outs = solve_online_windowed_sharded(rom, [dict(m) for m in mus],
                                         mesh=mesh, mode="probes")

    assert outs["probes"].shape == ref["probes"].shape == (n,) + ref["probes"].shape[1:]
    scale = np.abs(ref["probes"]).max()
    np.testing.assert_allclose(outs["probes"], ref["probes"],
                               atol=1e-12 * scale)
    np.testing.assert_allclose(outs["uN_final"], ref["uN_final"],
                               atol=1e-12 * np.abs(ref["uN_final"]).max())
    np.testing.assert_allclose(outs["t"], ref["t"], rtol=1e-12)


def test_mulocal_sharded_composition(piston_mulocal):
    """μ-local cell routing composed with the mesh-sharded windowed sweep
    (sweep_fn hook): identical numbers to the single-device routed sweep
    in f64 — per-cell table swaps reuse one compiled sharded executable."""
    from romtime_tpu.parallel import (
        device_mesh,
        solve_online_windowed_sharded,
    )

    hrom, ml, mu_val, _uh, _dir = piston_mulocal
    rom = hrom.rom
    mesh = device_mesh(8)

    mu_lo = dict(a0=9.8, omega=15.5, delta=0.10, alpha=1e-6, gamma=1.4)
    mu_hi = dict(a0=8.1, omega=19.5, delta=0.148, alpha=1e-6, gamma=1.4)
    mus = [dict(mu_lo), dict(mu_hi), dict(mu_val)]

    ref = rom.solve_batch_mulocal([dict(m) for m in mus],
                                  step=Stage.VALIDATION, mode="probes",
                                  engine="windowed")
    rom._online_fns = {}
    outs = rom.solve_batch_mulocal(
        [dict(m) for m in mus], step=Stage.VALIDATION,
        sweep_fn=lambda sub: solve_online_windowed_sharded(
            rom, sub, mesh=mesh, mode="probes"
        ),
    )
    # One executable serves both cells (values swapped, shapes shared).
    assert len(rom._sharded_windowed_fns) == 1

    scale = np.abs(ref["probes"]).max()
    np.testing.assert_allclose(outs["probes"], ref["probes"],
                               atol=1e-12 * scale)


def test_auto_solve_iters_worst_case_over_cells(piston_mulocal, monkeypatch):
    """With a μ-local fleet attached, the Richardson auto-iteration count
    must be the worst case over the active cell's (W, N) GROUP (LU if any
    cell in the group needs it): cells sharing a shape share one compiled
    kernel, and the count is baked at trace time — a per-active-cell
    estimate would silently under-iterate the other same-shape cells
    after a table swap. Cells at a different (W, N) (mixed fleets)
    retrace their own engine and decide independently."""
    hrom, ml, _mu, _uh, _dir = piston_mulocal
    rom = hrom.rom
    monkeypatch.delenv("ROMTIME_SOLVE_ITERS", raising=False)

    fake = {id(ml.cells[0]): 4, id(ml.cells[1]): 9}
    monkeypatch.setattr(type(rom), "_auto_iters_for",
                        lambda self, w: fake[id(w)])
    prev, prev_ml = rom.windows, rom.mulocal
    try:
        # Later build_mulocal_serving calls may have attached another
        # fleet; the aggregation keys on the ACTIVE fleet's cells.
        # (The fixture fleet is uniform: both cells share one group.)
        rom.mulocal = ml
        rom._auto_iters_cache_ml = None
        rom._set_serving_windows(ml.cells[0])
        assert rom._windowed_solve_iters() == 9  # not the active cell's 4

        rom._auto_iters_cache_ml = None
        fake[id(ml.cells[1])] = None  # one cell needs the LU
        assert rom._windowed_solve_iters() is None  # whole group → LU
    finally:
        rom._auto_iters_cache_ml = None
        rom.mulocal = prev_ml
        rom._set_serving_windows(prev)


def test_auto_solve_iters_per_shape_group(piston_mulocal, monkeypatch):
    """Mixed-(W, N) fleets: each shape group decides its own iteration
    count — a slow-converging cell at one shape must NOT force the LU
    onto cells at a different shape (they compile separate kernels)."""
    from types import SimpleNamespace

    hrom, _ml, _mu, _uh, _dir = piston_mulocal
    rom = hrom.rom
    monkeypatch.delenv("ROMTIME_SOLVE_ITERS", raising=False)

    a1 = SimpleNamespace(n_windows=4, N=12)
    a2 = SimpleNamespace(n_windows=4, N=12)
    b1 = SimpleNamespace(n_windows=2, N=16)
    fleet = SimpleNamespace(cells=[a1, a2, b1])
    fake = {id(a1): 3, id(a2): 5, id(b1): None}
    monkeypatch.setattr(type(rom), "_auto_iters_for",
                        lambda self, w: fake[id(w)])
    prev, prev_ml = rom.windows, rom.mulocal
    try:
        rom.mulocal = fleet
        rom._auto_iters_cache_ml = None
        rom._set_serving_windows(a1)
        # Group (4,12): worst case over {a1, a2}; b1's LU is irrelevant.
        assert rom._windowed_solve_iters() == 5
        rom._set_serving_windows(b1)
        assert rom._windowed_solve_iters() is None
        # Cached per shape on the same fleet.
        rom._set_serving_windows(a2)
        assert rom._windowed_solve_iters() == 5
    finally:
        rom._auto_iters_cache_ml = None
        rom.mulocal = prev_ml
        rom._set_serving_windows(prev)


def test_select_fleet_shapes():
    """predict_window_floor = exact sigma-tail of the window stacks;
    select_fleet_shapes picks the cheapest candidate meeting the target
    per cell and falls back to the most accurate shape when none does."""
    from romtime_tpu.rom.windowed import (
        predict_window_floor,
        select_fleet_shapes,
    )

    rng = np.random.default_rng(7)
    nh, nt = 120, 100

    def cell(rank, decay, n_traj=3):
        # One shared spatial basis per cell (nearby-μ trajectories live
        # in nearby subspaces); per-trajectory coefficient jitter.
        U = np.linalg.qr(rng.normal(size=(nh, rank)))[0]
        t = np.linspace(0.0, 1.0, nt)
        modes = np.stack([np.cos((k + 1) * np.pi * t) for k in range(rank)])
        sig = decay ** np.arange(rank)
        return [
            (U * (sig * (1.0 + 0.1 * rng.normal(size=rank)))) @ modes
            for _ in range(n_traj)
        ]

    # Cell A: fast spectral decay — a small N already sits on a deep floor.
    cell_a = cell(rank=30, decay=0.15)
    # Cell B: slow decay — no candidate reaches the target.
    cell_b = cell(rank=60, decay=0.85)

    candidates = [(10, 8), (5, 16)]
    target = 1e-6

    fa = {wn: predict_window_floor(cell_a, *wn) for wn in candidates}
    fb = {wn: predict_window_floor(cell_b, *wn) for wn in candidates}
    assert fa[(10, 8)] < target            # cheap shape suffices for A
    assert all(f > target for f in fb.values())   # nothing suffices for B

    cell_wn, floors = select_fleet_shapes(
        [cell_a, cell_b], candidates, target_floor=target
    )
    assert cell_wn[0] == (10, 8)           # cheapest adequate (N^2 rank)
    assert cell_wn[1] == min(candidates, key=lambda wn: fb[wn])
    assert floors[0] == fa[(10, 8)] and floors[1] == fb[cell_wn[1]]

    # The predicted floor is what a real windowed build achieves: project
    # cell A's first trajectory onto the built (10, 8) bases per window.
    bounds, Vs, _ = build_windowed_basis(cell_a, 10, 8)
    s = cell_a[0]
    res, tot = 0.0, 0.0
    for w in range(10):
        a, b = int(bounds[w]), int(bounds[w + 1])
        blk = s[:, a:b]
        proj = Vs[w] @ (Vs[w].T @ blk)
        res += np.sum((blk - proj) ** 2)
        tot += np.sum(blk**2)
    achieved = np.sqrt(res / tot)
    assert achieved <= 1.05 * fa[(10, 8)] + 1e-12


def test_auto_cell_wn_from_cache(tmp_path, monkeypatch):
    """Driver-level auto fleet selection reads the persisted μ-local
    trajectory cache and returns a build-ready cell_wn list."""
    from romtime_tpu.rom.hrom import HyperReducedOrderModelFixed
    from romtime_tpu.rom.windowed import predict_window_floor

    rng = np.random.default_rng(3)
    nh, nt = 80, 60

    def cell(rank, decay, n_traj):
        U = np.linalg.qr(rng.normal(size=(nh, rank)))[0]
        t = np.linspace(0.0, 1.0, nt)
        modes = np.stack([np.cos((k + 1) * np.pi * t) for k in range(rank)])
        sig = decay ** np.arange(rank)
        return [(U * (sig * (1.0 + 0.1 * rng.normal(size=rank)))) @ modes
                for _ in range(n_traj)]

    cells = [cell(20, 0.1, 2), cell(50, 0.9, 3)]
    payload = {
        "edges": np.array([0.0, 0.2, 0.4]),
        "per_cell": np.array([2, 3]),
        "has_nl": np.asarray(False),
        "build": np.asarray("f64"),
    }
    for c, snaps in enumerate(cells):
        for j, s in enumerate(snaps):
            payload[f"snap_{c}_{j}"] = s
    path = str(tmp_path / "mulocal_snapshots.npz")
    np.savez(path, **payload)

    candidates = [(6, 6), (3, 12)]
    # self is unused by auto_cell_wn beyond attribute-free logic
    cell_wn, floors = HyperReducedOrderModelFixed.auto_cell_wn(
        None, candidates, target_floor=1e-6, path=path
    )
    assert len(cell_wn) == 2 and len(floors) == 2
    assert cell_wn[0] == (6, 6)       # fast-decay cell: cheapest shape
    assert floors[0] < 1e-6
    exp1 = {wn: predict_window_floor(cells[1], *wn) for wn in candidates}
    assert cell_wn[1] == min(candidates, key=lambda wn: exp1[wn])

    # Missing cache raises a actionable error
    with pytest.raises(FileNotFoundError):
        HyperReducedOrderModelFixed.auto_cell_wn(
            None, candidates, 1e-6, path=str(tmp_path / "none.npz")
        )


def test_trilinear_table_exact_vs_deim(piston_windowed):
    """The windowed trilinear fast-path tensor is EXACT by default: it
    must equal the direct eager projection vec(Vᵀ·N(V e_j)·V)/b0 column
    by column, while the opt-in N-MDEIM reconstruction
    (ROMTIME_TRI_TABLE=deim — reference hyper-reduction semantics,
    deim/nonlinear.py) generally carries reconstruction error (measured
    58-91% relative tensor error in the round-4 high-Mach corner cell,
    SHARED by ROM and S-ROM — the estimator-blind error source)."""
    import jax.numpy as jnp

    from romtime_tpu.conventions import Stage
    from romtime_tpu.ops.assembly import band_matmat

    hrom, _mu_val, _uh, _dir = piston_windowed
    rom = hrom.rom
    fom = hrom.fom
    win = rom.windows
    w = win.n_windows - 1
    V = np.asarray(win.Vs[w])

    mu_a = dict(hrom.mu_space[Stage.OFFLINE][0])
    b0_a = float(fom.nonlinear_coefficient(mu_a))
    t_a = 0.37 * float(fom.domain[fom.T])

    rom.mdeim_Nh.project_basis(V=V)
    table = rom._windowed_trilinear_table(V)

    cols = []
    for j in range(V.shape[1]):
        op = fom.assemble_trilinear(mu=mu_a, t=t_a,
                                    u_n=jnp.asarray(V[:, j]))
        red = V.T @ np.asarray(
            band_matmat(op.band, jnp.asarray(V), fom.mesh.degree)
        )
        cols.append(red.reshape(-1) / b0_a)
    exact = np.stack(cols, axis=1)

    scale = np.abs(exact).max()
    np.testing.assert_allclose(np.asarray(table), exact, rtol=0,
                               atol=1e-12 * scale)

    # The DEIM reconstruction stays available as an ablation and is a
    # genuine approximation (not bit-equal in general).
    old = os.environ.get("ROMTIME_TRI_TABLE")
    os.environ["ROMTIME_TRI_TABLE"] = "deim"
    try:
        rom._trilinear_table_cache = None
        deim_tab = rom._windowed_trilinear_table(V)
    finally:
        if old is None:
            os.environ.pop("ROMTIME_TRI_TABLE", None)
        else:
            os.environ["ROMTIME_TRI_TABLE"] = old
        rom._trilinear_table_cache = None
    assert deim_tab is not None
    assert deim_tab.shape == exact.shape


def test_probe_reduce_on_device(piston_windowed):
    """On-device probe consumer (VERDICT r4 item 6): the reduced outputs
    equal host-side reductions of the full probe series exactly — the
    full (nt, 2, B) buffer just never crosses the host link."""
    hrom, mu_val, _uh, _dir = piston_windowed
    rom = hrom.rom
    mus = [dict(mu_val)] * 4

    full = rom.solve_batch(mus, step=Stage.ONLINE, mode="probes",
                           engine="windowed")
    mean = rom.solve_batch(mus, step=Stage.ONLINE, mode="probes",
                           engine="windowed", probe_reduce="mean")
    np.testing.assert_allclose(mean["probes"],
                               np.asarray(full["probes"]).mean(axis=1),
                               rtol=1e-12)
    k = 10
    dec = rom.solve_batch(mus, step=Stage.ONLINE, mode="probes",
                          engine="windowed", probe_reduce=k)
    np.testing.assert_array_equal(
        dec["probes"], np.asarray(full["probes"])[:, k - 1::k]
    )
    with pytest.raises(ValueError, match="probe_reduce"):
        rom.solve_batch(mus, step=Stage.ONLINE, mode="probes",
                        engine="windowed", probe_reduce="median")
