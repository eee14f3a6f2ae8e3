"""Legacy-generation MFP1 driver surface (reference
problems/mfp1.py:80-556, exercised by reference tests/test_mpf1.py).

The legacy drivers are the pre-S-ROM orchestration objects; this pins
the affordances unique to that generation: explicit-``mu_space`` online
evaluation, per-μ error-series bookkeeping in ``driver.errors``, and the
spectrum/energy/error reporting plots.
"""

import numpy as np
import pytest

from romtime_tpu.conventions import Stage
from romtime_tpu.problems.mfp1_legacy import (
    HyperReducedOrderModelFixed,
    HyperReducedOrderModelMoving,
    define_mfp1_problem,
)

from test_hrom import _heat_config


@pytest.fixture(scope="module")
def legacy_hrom():
    (grid, fom_params, rom_params, deim_params, mdeim_params,
     models) = _heat_config(nx=60, nt=40)

    hrom = HyperReducedOrderModelFixed(
        grid=grid,
        fom_params=fom_params,
        rom_params=rom_params,
        deim_params=deim_params,
        mdeim_params=mdeim_params,
        models=models,
        rnd=np.random.RandomState(0),
    )
    hrom.setup()
    hrom.setup_hyperreduction()
    hrom.run_offline_rom()
    hrom.run_offline_hyperreduction(
        mu_space=hrom.mu_space[Stage.OFFLINE], evaluate=True
    )
    hrom.project_reductors()
    return hrom


def test_legacy_online_with_explicit_mu_space(legacy_hrom):
    hrom = legacy_hrom
    space = hrom.mu_space[Stage.OFFLINE][:2]
    errors = hrom.evaluate_online(mu_space=space)

    # Per-μ error series vs the manufactured exact solution.
    assert len(errors) == len(space)
    for series in errors.values():
        series = np.asarray(series)
        assert series.ndim == 1 and series.size > 0
        # The manufactured solution is ~0 at early times, so the
        # relative series starts O(1) and decays; certify the settled
        # tail, like the driver-level golden stats do.
        assert float(series[-1]) < 1e-4


def test_legacy_online_with_params(legacy_hrom):
    hrom = legacy_hrom
    errors = hrom.evaluate_online(params={"num": 2},
                                  rnd=np.random.RandomState(1))
    assert len(errors) >= 2
    with pytest.raises(ValueError):
        hrom.evaluate_online()


def test_legacy_summary_and_plots(legacy_hrom, tmp_path):
    hrom = legacy_hrom
    hrom.generate_summary()
    assert not hrom.summary_basis.empty
    assert not hrom.summary_errors.empty

    hrom.plot_spectrums(save=str(tmp_path / "spectrums"))
    hrom.plot_energy(save=str(tmp_path / "energy"))
    hrom.plot_errors(save=str(tmp_path / "errors"))
    for name in ("spectrums", "energy", "errors"):
        f = tmp_path / f"{name}.png"
        assert f.exists() and f.stat().st_size > 0


def test_legacy_moving_driver_smoke():
    (grid, fom_params, rom_params, deim_params, mdeim_params,
     models) = _heat_config(nx=40, nt=30, moving=True)

    hrom = HyperReducedOrderModelMoving(
        grid=grid,
        fom_params=fom_params,
        rom_params=rom_params,
        deim_params=deim_params,
        mdeim_params=mdeim_params,
        models=models,
        rnd=np.random.RandomState(0),
    )
    hrom.setup()
    hrom.setup_hyperreduction()
    assert not hrom.deim_moving_runned
    hrom.run_offline_rom()
    hrom.run_offline_hyperreduction(
        mu_space=hrom.mu_space[Stage.OFFLINE], evaluate=False
    )
    assert hrom.deim_moving_runned
    hrom.project_reductors()

    errors = hrom.evaluate_online(mu_space=hrom.mu_space[Stage.OFFLINE][:1])
    series = np.asarray(next(iter(errors.values())))
    assert series.size > 0 and float(series[-1]) < 1e-2


def test_legacy_define_mfp1_reexport():
    out = define_mfp1_problem(2.0, 20, 1.0, 10)
    assert len(out) == 7
