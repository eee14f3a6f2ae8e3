"""Multi-device execution tests on the 8-virtual-CPU-device mesh:
TSQR POD, sharded FOM sweeps, sharded online ROM sweeps, and the driver
entry points."""

import jax
import numpy as np
import pytest
from numpy.testing import assert_allclose

from romtime_tpu.parallel import (
    device_mesh,
    orth_distributed,
    solve_fom_batch,
    solve_fom_sharded,
    solve_online_sharded,
    tsqr_svd,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("Needs 8 virtual devices (see conftest XLA_FLAGS).")
    return device_mesh(8)


def test_tsqr_svd_matches_dense(mesh):
    rng = np.random.default_rng(0)
    # Rapidly decaying spectrum, like POD snapshot matrices
    nh, m = 40, 64
    U0 = np.linalg.qr(rng.normal(size=(nh, nh)))[0]
    s0 = np.logspace(0, -12, nh)
    S = U0 @ np.diag(s0) @ rng.normal(size=(nh, m))

    U, s = tsqr_svd(S, mesh=mesh)

    s_ref = np.linalg.svd(S, full_matrices=False)[1]
    assert_allclose(s[: len(s_ref)], s_ref, rtol=1e-8, atol=1e-12)

    # Leading subspace agrees (up to sign)
    k = 5
    Ur = np.linalg.svd(S, full_matrices=False)[0][:, :k]
    overlap = np.abs(np.diag(U[:, :k].T @ Ur))
    assert_allclose(overlap, 1.0, atol=1e-8)


def test_orth_distributed_truncation(mesh):
    rng = np.random.default_rng(1)
    S = rng.normal(size=(30, 24))
    Q, s, energy = orth_distributed(S, num=4, mesh=mesh, normalize=False)
    assert Q.shape == (30, 4)
    assert_allclose(Q.T @ Q, np.eye(4), atol=1e-10)


@pytest.fixture(scope="module")
def piston_solver():
    from romtime_tpu.fom import OneDimensionalBurgers
    from romtime_tpu.problems import define_piston_problem

    domain, bcs, forcing, u0, Lt, dLt_dt = define_piston_problem(
        L=1.0, nx=64, tf=0.2, nt=20
    )
    solver = OneDimensionalBurgers(
        domain=domain, dirichlet=bcs,
        parameters=dict(a0=10.0, omega=18.0, alpha=1e-6, delta=0.12, gamma=1.4),
        forcing_term=forcing, u0=u0, Lt=Lt, dLt_dt=dLt_dt,
    )
    solver.setup()
    return solver


def _mus(n, seed=0):
    rng = np.random.default_rng(seed)
    return [
        dict(
            a0=rng.uniform(8, 10),
            omega=rng.uniform(15, 20),
            delta=rng.uniform(0.1, 0.15),
            alpha=1e-6,
            gamma=1.4,
        )
        for _ in range(n)
    ]


def test_fom_sweep_sharded_matches_batch(mesh, piston_solver):
    mus = _mus(8)
    outs_b = solve_fom_batch(piston_solver, mus)
    outs_s = solve_fom_sharded(piston_solver, mus, mesh=mesh)
    assert_allclose(outs_s["uh"], outs_b["uh"], atol=1e-12)


def test_fom_sweep_sharded_pads_ragged_batch(mesh, piston_solver):
    mus = _mus(5, seed=3)  # not a multiple of 8
    outs_b = solve_fom_batch(piston_solver, mus)
    outs_s = solve_fom_sharded(piston_solver, mus, mesh=mesh)
    assert outs_s["uh"].shape[0] == 5
    assert_allclose(outs_s["uh"], outs_b["uh"], atol=1e-12)


def test_online_sweep_sharded(mesh, piston_solver):
    from romtime_tpu.rom import RomConstructorNonlinear

    rng = np.random.default_rng(0)
    nh = piston_solver.mesh.nh
    V = np.linalg.qr(rng.normal(size=(nh, 4)))[0]

    rom = RomConstructorNonlinear(fom=piston_solver, grid=None)
    rom.setup(rnd=0)
    rom.basis = V

    mus = _mus(8, seed=5)
    outs_serial = rom.solve_batch(mus)
    outs_sharded = solve_online_sharded(rom, mus, mesh=mesh)
    assert_allclose(outs_sharded["uN"], outs_serial["uN"], atol=1e-12)


def test_graft_entry_points(mesh):
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import dryrun_multichip, entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out)))

    dryrun_multichip(8)
    dryrun_multichip(2)


def test_build_reduced_basis_device_sweep(mesh, piston_solver):
    """build_reduced_basis(device_sweep=True) — the reference's serial
    offline loop (rom/rom.py:317-327) as ONE sharded launch — must yield
    the same reduced basis and nonlinear basis as the serial path."""
    from romtime_tpu.parameters import get_uniform_dist
    from romtime_tpu.rom import RomConstructorNonlinear

    grid = {
        "a0": get_uniform_dist(min=8.0, max=10.0),
        "omega": get_uniform_dist(min=15.0, max=20.0),
        "delta": get_uniform_dist(min=0.1, max=0.15),
        "alpha": get_uniform_dist(min=1e-6, max=1e-6),
        "gamma": get_uniform_dist(min=1.4, max=1.4),
    }

    def build(device_sweep):
        rom = RomConstructorNonlinear(fom=piston_solver, grid=grid)
        rom.setup(rnd=np.random.RandomState(5))
        rom.build_reduced_basis(
            num_snapshots=3, num_basis=6,
            device_sweep=device_sweep,
            mesh=mesh if device_sweep else None,
        )
        return rom

    serial = build(False)
    device = build(True)
    assert device.basis.shape == serial.basis.shape
    # atol 1e-8: the serial f64 reference path now runs the native C++
    # Thomas loop (fom/native_sweep.py) while the device sweep runs the
    # traced PCR solve — algebraically identical, different elimination
    # order, a few-ulp-scale difference on O(1) basis entries.
    assert_allclose(device.basis, serial.basis, atol=1e-8)
    assert_allclose(device.basis_nonlinear, serial.basis_nonlinear,
                    atol=1e-8)
    assert len(device.offline_snapshots) == 3
