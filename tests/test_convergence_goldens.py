"""Timestep-convergence golden regression (reference: tests/test_mpf1.py:723-768).

The reference pins its MFP1 convergence tables to checked-in CSVs; this
is the analog for the TPU-native heat solvers — the study of
``scripts/mpf1_convergence.py`` at nts [10, 100, 1000] is pinned in
``tests/goldens/mfp1_convergence_{fixed,moving}.csv`` (nx=500, tf to 99%
decay, first-order BDF-1 rates ≈ 1.0).
"""

import os

import numpy as np
import pandas as pd
import pytest

from romtime_tpu.fom import HeatEquationMovingSolver, HeatEquationSolver
from romtime_tpu.problems import define_mfp1_problem

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")
L, NX = 2.0, 500
BETA = 5.0
TF = -np.log(1.0 - 0.99) / BETA
NTS = [10, 100, 1000]


def run_study(moving):
    mu = dict(delta=1.0, beta=BETA, alpha_0=1.0)
    if moving:
        mu["omega"] = 2.0 * np.pi / (8.0 * TF)
    out = {}
    for nt in NTS:
        domain, bcs, forcing, u0, ue, Lt, dLt_dt = define_mfp1_problem(
            L, NX, TF, nt
        )
        if moving:
            solver = HeatEquationMovingSolver(
                domain=domain, dirichlet=bcs, parameters=mu,
                forcing_term=forcing, u0=u0, exact_solution=ue,
                Lt=Lt, dLt_dt=dLt_dt,
            )
        else:
            solver = HeatEquationSolver(
                domain=domain, dirichlet=bcs, parameters=mu,
                forcing_term=forcing, u0=u0, exact_solution=ue,
            )
        solver.setup()
        solver.solve()
        out[nt] = float(np.log10(solver.errors[solver.timesteps[-1]]))
    return out


@pytest.mark.slow
@pytest.mark.parametrize("moving", [False, True], ids=["fixed", "moving"])
def test_convergence_golden(moving):
    name = "mfp1_convergence_moving.csv" if moving else \
        "mfp1_convergence_fixed.csv"
    golden = pd.read_csv(os.path.join(GOLDENS, name), index_col=0)
    got = run_study(moving)
    for nt in NTS:
        assert np.isclose(
            got[nt], float(golden.loc[nt, "log10_error"]), atol=1e-7
        ), f"nt={nt}: got {got[nt]}, golden {golden.loc[nt, 'log10_error']}"

    # First-order-in-time scheme: observed rate ≈ 1 per decade of nt
    # (the moving-domain study reads 0.79 on the coarse first decade —
    # pre-asymptotic ALE transients — and 0.99 on the second).
    errs = np.array([10.0 ** got[nt] for nt in NTS])
    rates = np.log(errs[:-1] / errs[1:]) / np.log(
        np.array(NTS[1:], float) / np.array(NTS[:-1], float)
    )
    assert rates[-1] > 0.9, f"asymptotic convergence rate degraded: {rates}"
    assert np.all(rates > 0.7), f"convergence rates degraded: {rates}"
