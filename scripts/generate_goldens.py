"""Regenerate the pinned golden error-statistics tables used by the test
suite (analog of the reference's hard-coded 20×4 HROM table,
reference: tests/test_mpf1.py:624-718).

Writes tests/goldens/heat_hrom_online_stats.json: per-μ
{mean, median, max, min} of the online ROM-vs-FOM error series for a
20-point μ-sample, from the deterministic heat HROM pipeline used by
tests/test_hrom.py::heat_hrom (RandomState(0) offline, RandomState(5)
online sample).

Run only to re-pin after an intentional numerics change:
    python scripts/generate_goldens.py
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import numpy as np

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_hrom import _heat_config
    from romtime_tpu.conventions import Errors, Stage
    from romtime_tpu.rom import HyperReducedOrderModelFixed

    (grid, fom_params, rom_params, deim_params, mdeim_params,
     models) = _heat_config()

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
        mu_space=hrom.mu_space[Stage.OFFLINE], evaluate=False
    )
    hrom.project_reductors()

    # FOM-comparison path (no manufactured solution), reference semantics.
    fom = hrom.fom
    fom.exact_solution = None
    fom._solve_jit = None
    hrom.evaluate_online(params={"num": 20}, rnd=np.random.RandomState(5))

    errors = hrom.errors[f"{Stage.ONLINE}-vs-fom"]
    table = {}
    for idx in sorted(errors):
        series = np.asarray(errors[idx][Errors.ROM])
        table[str(idx)] = {
            "mean": float(series.mean()),
            "median": float(np.median(series)),
            "max": float(series.max()),
            "min": float(series.min()),
        }

    out = os.path.join(REPO, "tests", "goldens",
                       "heat_hrom_online_stats.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        json.dump(table, fh, indent=2, sort_keys=True)
    print(f"wrote {out} ({len(table)} mu rows)")


if __name__ == "__main__":
    with tempfile.TemporaryDirectory() as tmp:
        cwd = os.getcwd()
        os.chdir(tmp)
        try:
            main()
        finally:
            os.chdir(cwd)
