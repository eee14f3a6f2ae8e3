"""ROM constructor tests: reduced-basis construction, hyper-reduced online
solves, truncation, and batched-sweep consistency
(reference behaviors: tests/test_mpf1.py:374-563)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from romtime_tpu.conventions import OperatorType, Stage
from romtime_tpu.deim import (
    DiscreteEmpiricalInterpolation,
    MatrixDiscreteEmpiricalInterpolation,
)
from romtime_tpu.fom import HeatEquationSolver
from romtime_tpu.parameters import get_uniform_dist
from romtime_tpu.problems import define_mfp1_problem
from romtime_tpu.rom import RomConstructor


@pytest.fixture
def grid():
    return {
        "delta": get_uniform_dist(min=0.01, max=2.0),
        "beta": get_uniform_dist(min=1.0, max=10.0),
        "alpha_0": get_uniform_dist(min=0.01, max=2.0),
    }


@pytest.fixture
def fom():
    nx, nt, tf, L = 100, 100, 10.0, 2.0
    domain, bcs, forcing, u0, ue, Lt, dLt_dt = define_mfp1_problem(L, nx, tf, nt)
    fom = HeatEquationSolver(
        domain=domain, dirichlet=bcs,
        parameters=dict(delta=1.0, beta=5.0, alpha_0=1.0),
        forcing_term=forcing, u0=u0, exact_solution=ue,
    )
    fom.setup()
    return fom


@pytest.fixture
def trained_rom(fom, grid):
    """RB + DEIM-RHS + MDEIM mass/stiffness, projected."""
    rnd = np.random.RandomState(0)
    nt, tf = 100, 10.0
    ts = np.linspace(tf / nt, tf, nt)
    tw = {"ts": ts, "num_snapshots": 10}

    deim_rhs = DiscreteEmpiricalInterpolation(
        name="RHS", assemble=fom.assemble_rhs, grid=grid, tree_walk_params=tw
    )
    deim_rhs.setup(rnd=rnd)
    deim_rhs.run()

    mdeim_Ah = MatrixDiscreteEmpiricalInterpolation(
        name="Stiffness", assemble=fom.assemble_stiffness, grid=grid,
        tree_walk_params=tw,
    )
    mdeim_Ah.setup(rnd=rnd)
    mdeim_Ah.run()

    mdeim_Mh = MatrixDiscreteEmpiricalInterpolation(
        name="Mass", assemble=fom.assemble_mass, grid=grid, tree_walk_params=tw
    )
    mdeim_Mh.setup(rnd=rnd)
    mdeim_Mh.run()

    rom = RomConstructor(fom=fom, grid=grid)
    rom.setup(rnd=rnd)
    rom.build_reduced_basis(num_snapshots=10)

    rom.add_hyper_reductor(reductor=deim_rhs, which=OperatorType.RHS)
    rom.add_hyper_reductor(reductor=mdeim_Ah, which=OperatorType.STIFFNESS)
    rom.add_hyper_reductor(reductor=mdeim_Mh, which=OperatorType.MASS)
    rom.project_reductors()
    return rom


def test_rom_without_hyperreduction(fom, grid):
    """Pure Galerkin ROM (project fallback) reproduces the FOM well on
    training parameters."""
    rom = RomConstructor(fom=fom, grid=grid)
    rom.setup(rnd=np.random.RandomState(0))
    fom_solutions = rom.build_reduced_basis(num_snapshots=5)

    mu = rom.mu_space[Stage.OFFLINE][0]
    idx = rom.solve(mu=mu, step=Stage.VALIDATION)

    uh_fom = fom_solutions[0]
    uh_rom = rom.solutions.fom
    err = np.linalg.norm(uh_fom - uh_rom, axis=0) / np.sqrt(uh_fom.shape[0])
    assert err.max() < 1e-6


def test_hyper_reduced_rom_online_errors(trained_rom):
    """Online errors vs the exact solution stay within the reference's
    golden band (reference: tests/test_mpf1.py:624-718: mean
    2e-5…1.2e-2)."""
    rom = trained_rom
    rnd2 = np.random.RandomState(1)
    sampler = rom.build_sampling_space(num=10, rnd=rnd2)

    errors = []
    for mu in sampler:
        idx = rom.solve(mu=mu, step=Stage.ONLINE)
        errors.append(rom.errors[idx])

    errors = np.array(errors)
    assert np.median(errors) < 1e-3
    assert errors.mean() < 0.1


def test_solve_batch_matches_serial(trained_rom):
    """The vmapped μ-batch sweep is bit-compatible with serial solves."""
    rom = trained_rom
    mus = list(rom.build_sampling_space(num=4, rnd=np.random.RandomState(7)))

    outs = rom.solve_batch(mus, step=Stage.ONLINE, mode="full")
    for i, mu in enumerate(mus):
        rom.solve(mu=mu, step=Stage.ONLINE)
        assert_allclose(outs["uc"][i].T, rom.solutions.fom, atol=1e-12)
        assert_allclose(outs["uN"][i].T, rom.solutions.rom, atol=1e-12)


def test_solve_batch_reduced_mode(trained_rom):
    """The Nh-free reduced sweep returns the same coefficients plus end
    probes that match the reconstructed boundary values."""
    rom = trained_rom
    mus = list(rom.build_sampling_space(num=3, rnd=np.random.RandomState(9)))

    full = rom.solve_batch(mus, step=Stage.ONLINE, mode="full")
    red = rom.solve_batch(mus, step=Stage.ONLINE, mode="reduced")

    assert_allclose(red["uN"], full["uN"], atol=1e-12)
    assert "uc" not in red
    # probes = reconstructed values at the domain ends
    assert_allclose(red["probes"][..., 0], full["uc"][..., 0], atol=1e-10)
    assert_allclose(red["probes"][..., 1], full["uc"][..., -1], atol=1e-10)


def test_assemble_system_delegates_to_system_matrices(trained_rom):
    """The eager API and the scan path share one BDF formula: K_N must be
    bdf·M_N + dt·A_N assembled from the same reduced operators."""
    rom = trained_rom
    mu = dict(rom.mu_space[Stage.OFFLINE][0])
    t = 0.37 * rom.fom.domain[rom.fom.T]

    MN, KN = rom.assemble_system(mu=mu, t=t, bdf=1.5)
    MN_ref = rom.assemble_mass(mu=mu, t=t)
    AN_ref = rom.assemble_stiffness(mu=mu, t=t)

    assert_allclose(np.asarray(MN), np.asarray(MN_ref), atol=1e-14)
    assert_allclose(
        np.asarray(KN),
        1.5 * np.asarray(MN_ref) + rom.fom.dt * np.asarray(AN_ref),
        atol=1e-14,
    )


def test_solve_batch_probes_mode(trained_rom):
    """The serving mode keeps only the probe QoIs + final reduced state;
    both must match the reduced sweep exactly."""
    rom = trained_rom
    mus = list(rom.build_sampling_space(num=3, rnd=np.random.RandomState(9)))

    red = rom.solve_batch(mus, step=Stage.ONLINE, mode="reduced")
    served = rom.solve_batch(mus, step=Stage.ONLINE, mode="probes")

    assert "uN" not in served and "uc" not in served
    assert_allclose(served["probes"], red["probes"], atol=1e-14)
    assert_allclose(served["uN_final"], red["uN"][:, -1, :], atol=1e-14)


def test_solve_batch_pallas_engine(trained_rom):
    """The fused pallas sweep (interpret mode on CPU) reproduces the lanes
    probes to f32 accuracy. The batch is deliberately not lane-aligned via
    padding checks elsewhere — here B=128 exercises one block."""
    from romtime_tpu.dtypes import compute_dtype_scope
    import jax.numpy as jnp

    rom = trained_rom
    base = list(rom.build_sampling_space(num=4, rnd=np.random.RandomState(9)))
    mus = (base * 32)[:128]

    with compute_dtype_scope(jnp.float32):
        rom._online_fns = {}
        try:
            lanes = rom.solve_batch(mus, step=Stage.ONLINE, mode="probes",
                                    engine="lanes")
            served = rom.solve_batch(mus, step=Stage.ONLINE, mode="probes",
                                     engine="pallas")
        finally:
            rom._online_fns = {}

    assert served["probes"].shape == lanes["probes"].shape
    scale = np.abs(lanes["probes"]).max()
    assert_allclose(served["probes"], lanes["probes"], atol=3e-5 * scale)
    assert_allclose(served["uN_final"], lanes["uN_final"],
                    atol=1e-4 * max(np.abs(lanes["uN_final"]).max(), 1.0))


def test_pallas_theta_branch_matches(trained_rom, monkeypatch):
    """With the table budget forced to zero the fused path takes the
    θ-streaming kernel; results must match the materialized-tables path."""
    from romtime_tpu.dtypes import compute_dtype_scope
    import jax.numpy as jnp
    from romtime_tpu.rom.rom import RomConstructor

    rom = trained_rom
    base = list(rom.build_sampling_space(num=4, rnd=np.random.RandomState(3)))
    mus = (base * 32)[:128]

    with compute_dtype_scope(jnp.float32):
        rom._online_fns = {}
        try:
            tables = rom.solve_batch(mus, step=Stage.ONLINE, mode="probes",
                                     engine="pallas")
            monkeypatch.setattr(RomConstructor, "ONLINE_PRECOMPUTE_BUDGET", 0)
            rom._online_fns = {}
            theta = rom.solve_batch(mus, step=Stage.ONLINE, mode="probes",
                                    engine="pallas")
        finally:
            rom._online_fns = {}

    scale = max(np.abs(tables["probes"]).max(), 1e-6)
    assert_allclose(theta["probes"], tables["probes"], atol=3e-6 * scale)


def test_pallas_supported_gating(trained_rom):
    """Auto-selection only picks the fused kernel in its supported regime."""
    rom = trained_rom
    # f64 compute (test default) -> not supported
    assert not rom._pallas_supported(128)
    from romtime_tpu.dtypes import compute_dtype_scope
    import jax.numpy as jnp

    with compute_dtype_scope(jnp.float32):
        assert rom._pallas_supported(128)
        assert not rom._pallas_supported(100)  # lane misalignment


def test_truncate(trained_rom):
    rom = trained_rom
    N = rom.N
    truncated = rom.truncate(n=2)
    assert truncated.N == N - 2
    assert truncated.basis.shape == (rom.basis.shape[0], N - 2)
    # The truncated ROM can be re-wired and solved
    truncated.add_hyper_reductor(rom.deim_rhs, OperatorType.RHS)
    truncated.add_hyper_reductor(rom.mdeim_Ah, OperatorType.STIFFNESS)
    truncated.add_hyper_reductor(rom.mdeim_Mh, OperatorType.MASS)
    truncated.project_reductors()
    mu = rom.mu_space[Stage.OFFLINE][0]
    truncated.solve(mu=mu, step=Stage.ONLINE)
    assert truncated.solutions.rom.shape[0] == N - 2


def test_load_from_basis(trained_rom, fom, grid):
    rom2 = RomConstructor(fom=fom, grid=grid)
    rom2.setup(rnd=np.random.RandomState(0))
    rom2.load_from_basis(basis=trained_rom.basis, mu_space=trained_rom.mu_space)
    assert rom2.N == trained_rom.N
    assert rom2.mu_space[Stage.ONLINE] == []


def test_projection_roundtrip(trained_rom):
    rom = trained_rom
    rng = np.random.default_rng(0)
    uN = rng.normal(size=rom.N)
    uh = np.asarray(rom.to_fom_vector(uN))
    back = np.asarray(rom.to_rom_vector(uh))
    assert_allclose(back, uN, atol=1e-12)


def test_add_mu_duplicate_gets_fresh_slot():
    """Duplicate μ must get its own index — the reference's
    ``list.index(mu)`` aliases the first match, so repeated parameters
    overwrite each other's error series (drift-class fix, rom/base.py)."""
    from romtime_tpu.rom.base import Reductor

    red = Reductor(grid=None)
    mu = dict(delta=1.0, beta=5.0)
    i0, _ = red.add_mu(step=Stage.ONLINE, mu=mu)
    i1, _ = red.add_mu(step=Stage.ONLINE, mu=dict(mu))
    assert i0 == 0
    assert i1 == 1
    assert len(red.mu_space[Stage.ONLINE]) == 2


def test_autotune_online_precompute(trained_rom, tmp_path):
    """Measured matrices-vs-θ decision (replaces the static byte budget):
    both variants compile and time, the winner persists to the autotune
    table, and load_autotune pins it for a fresh process."""
    rom = trained_rom
    mus = list(rom.build_sampling_space(num=8, rnd=np.random.RandomState(4)))
    mus = (mus * 8)[:8]
    path = str(tmp_path / "autotune.json")

    try:
        rec = rom.autotune_online_precompute(
            mus, mode="probes", engine="lanes", n_rep=2, path=path
        )
        assert rec["winner"] in ("matrices", "thetas")
        assert set(rec["wall_s"]) == {"matrices", "thetas"}
        assert all(w > 0 for w in rec["wall_s"].values())
        assert rom._precompute_override == rec["winner"]

        # Fresh state: the persisted record restores the decision.
        rom._precompute_override = None
        rec2 = rom.load_autotune(8, mode="probes", engine="lanes",
                                 path=path)
        assert rec2 is not None and rec2["winner"] == rec["winner"]
        assert rom._precompute_override == rec["winner"]
        # An unmeasured configuration stays on the static policy.
        rom._precompute_override = None
        assert rom.load_autotune(99, mode="probes", engine="lanes",
                                 path=path) is None
        assert rom._precompute_override is None
    finally:
        rom._precompute_override = None
        rom._online_fns = {}
