"""Compensated (double-f32, residual-form) FOM sweep — fom/base.py
``_solve_impl_dd``.

The dd loop restructures the BDF step so f32 rounding enters only
relative to the per-step increment (ops/compensated.py), enabling
certification-grade offline FOM sweeps on the TPU where f64 is emulated
and slow. Replaces the reference's serial f64 PETSc time loop for
on-device offline builds (reference: fom/base.py:693-831).

Measured context (ROADMAP.md round-3 findings): the FOM step is
stiffness-dominated (dt·A ≫ M), so each step re-solves from current
data and f32 recursion drift never accumulates — same-μ drift vs f64
(~1e-5 on the piston) is the *response* to the f32 representation of
μ/t/coefficients, which the dd restructuring cannot and need not fix
(it is manifold-tangent, absorbed by POD). These tests therefore pin
the algebraic contract (f64 identity, low-word plumbing) and that dd
costs no accuracy, NOT an accuracy win.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from romtime_tpu.dtypes import compute_dtype_scope
from romtime_tpu.problems import define_mfp1_problem
from romtime_tpu.fom.heat import HeatEquationSolver

jax.config.update("jax_enable_x64", True)


MU = dict(delta=0.1, beta=1.0, alpha_0=1.0, epsilon=0.0)


def _solve(dd, dtype, nx=80, nt=400):
    domain, bcs, forcing, u0, ue, Lt, dLt_dt = define_mfp1_problem(
        2.0, nx, 10.0, nt
    )
    s = HeatEquationSolver(
        domain=domain, dirichlet=bcs, forcing_term=forcing, u0=u0,
        exact_solution=ue,
    )
    s.setup()
    s.dd_sweep = dd
    s.update_parametrization(MU)
    with compute_dtype_scope(dtype):
        s.solve()
    return np.asarray(s.solutions.snapshots, np.float64)


def test_dd_f64_matches_plain_f64():
    """In f64 the residual-form restructuring is algebraically identical
    to the direct step — agreement at solver-roundoff level."""
    u_plain = _solve(False, jnp.float64)
    u_dd = _solve(True, jnp.float64)
    rel = np.linalg.norm(u_dd - u_plain) / np.linalg.norm(u_plain)
    assert rel < 1e-11, rel


def test_dd_f32_drift_comparable_to_plain():
    """Both f32 loops sit at the representation-response floor (see
    module docstring) — dd must not be materially worse than plain."""
    u64 = _solve(False, jnp.float64)
    nrm = np.linalg.norm(u64)
    drift_plain = np.linalg.norm(_solve(False, jnp.float32) - u64) / nrm
    drift_dd = np.linalg.norm(_solve(True, jnp.float32) - u64) / nrm
    assert drift_dd < 5.0 * drift_plain, (drift_plain, drift_dd)
    assert drift_dd < 1e-4, drift_dd


def test_dd_device_sweep_recombines_low_words():
    """build_reduced_basis(device_sweep=True) with a dd-swept solver must
    ingest the recombined (hi+lo) trajectory, not the bare hi words."""
    from romtime_tpu.parallel.sweep import solve_fom_batch

    domain, bcs, forcing, u0, ue, Lt, dLt_dt = define_mfp1_problem(
        2.0, 60, 10.0, 100
    )
    s = HeatEquationSolver(
        domain=domain, dirichlet=bcs, forcing_term=forcing, u0=u0,
    )
    s.setup()
    s.dd_sweep = True
    with compute_dtype_scope(jnp.float32):
        outs = solve_fom_batch(s, [dict(MU), dict(MU)])
    assert "uh_lo" in outs
    # Low words are genuinely sub-f32-resolution corrections.
    hi = np.abs(outs["uh"]).max()
    lo = np.abs(outs["uh_lo"]).max()
    assert 0 < lo < 1e-5 * hi
