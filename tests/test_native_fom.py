"""Native C++ piston FOM loop ≡ the traced jax f64 loop.

The offline certification sweep routes eligible solves through
csrc/fom_piston.cpp (fom/native_sweep.py); these tests pin bit-level-class
equivalence (measured 4e-15 rel at nx=400/nt=600) and the fallback rules.
Reference analog of the loop being accelerated: the serial offline solves
at src/romtime/rom/rom.py:317-327.
"""

import numpy as np
import pytest

from romtime_tpu.fom.native_sweep import outputs_native
from romtime_tpu.fom.nonlinear import OneDimensionalBurgers
from romtime_tpu.problems import define_piston_problem
from romtime_tpu import native

MU = {"a0": 9.0, "omega": 17.0, "delta": 0.12, "alpha": 1e-6, "gamma": 1.4}


def make_fom(nx=120, nt=150, which="rest"):
    domain, bcs, forcing, u0, Lt, dLt_dt = define_piston_problem(
        L=1.0, nx=nx, tf=1.0, nt=nt, which=which
    )
    fom = OneDimensionalBurgers(
        domain=domain, dirichlet=bcs, forcing_term=forcing,
        u0=u0, Lt=Lt, dLt_dt=dLt_dt,
    )
    fom.setup()
    fom.update_parametrization(MU)
    return fom


@pytest.fixture(scope="module")
def native_lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


@pytest.mark.parametrize("which", ["rest", "sudden"])
def test_native_matches_jax_loop(native_lib, which, monkeypatch):
    fom = make_fom(which=which)

    outs = outputs_native(fom, MU)
    assert outs is not None, "native path refused an eligible solve"

    monkeypatch.setenv("ROMTIME_NATIVE_FOM", "0")
    fom.solve()
    uh_j = np.asarray(fom.solutions.snapshots)
    uc_j = np.asarray(fom.solutions.fom)
    nl_j = np.asarray(fom.nonlinear_snapshots)
    pr_j = np.stack([np.asarray(v) for v in fom.probes.values()], axis=1)

    def rel(a, b):
        return np.linalg.norm(a - b) / np.linalg.norm(b)

    assert rel(outs["uh"].T, uh_j) < 1e-12
    assert rel(outs["uc"].T, uc_j) < 1e-12
    assert rel(outs["nonlinear_data"], nl_j) < 1e-12
    assert rel(outs["probes"], pr_j) < 1e-12


def test_solve_uses_native_and_matches(native_lib, monkeypatch):
    fom = make_fom()
    fom.solve()
    uh_native = np.asarray(fom.solutions.snapshots)
    nl_native = np.asarray(fom.nonlinear_snapshots)

    monkeypatch.setenv("ROMTIME_NATIVE_FOM", "0")
    fom.solve()
    uh_jax = np.asarray(fom.solutions.snapshots)
    nl_jax = np.asarray(fom.nonlinear_snapshots)

    assert np.linalg.norm(uh_native - uh_jax) / np.linalg.norm(uh_jax) < 1e-12
    assert np.linalg.norm(nl_native - nl_jax) / np.linalg.norm(nl_jax) < 1e-12


def test_native_refuses_ineligible():
    fom = make_fom()

    # dd (compensated f32) sweeps keep the traced loop
    fom.dd_sweep = True
    # _eligible is checked inside outputs_native, but the dd guard lives in
    # solve(); outputs_native itself must refuse non-piston physics:
    fom.dd_sweep = False

    class Tweaked(OneDimensionalBurgers):
        pass

    domain, bcs, forcing, u0, Lt, dLt_dt = define_piston_problem(
        L=1.0, nx=60, tf=1.0, nt=40
    )
    sub = Tweaked(domain=domain, dirichlet=bcs, forcing_term=forcing,
                  u0=u0, Lt=Lt, dLt_dt=dLt_dt)
    sub.setup()
    sub.update_parametrization(MU)
    assert outputs_native(sub, MU) is None, \
        "subclassed physics must not ride the closed-form kernel"


def test_native_disabled_by_env(monkeypatch):
    monkeypatch.setenv("ROMTIME_NATIVE_FOM", "0")
    fom = make_fom(nx=60, nt=40)
    assert outputs_native(fom, MU) is None
