"""Test configuration: CPU backend, 8 virtual devices, float64.

The suite certifies numerics (DEIM exactness at 1e-15, golden operator
values), so it runs in float64 on the CPU backend with 8 virtual devices to
exercise the multi-chip sharding paths without TPU hardware. Benchmarks run
separately on the real chip (see bench.py).
"""

import os
import sys

# Must happen before the first JAX backend initialization.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is XLA-compile dominated (CPU
# scan pipelines); repeat runs on one machine skip most of that.
_cache_dir = os.environ.get(
    "ROMTIME_TEST_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"),
)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_enable_xla_caches",
                      "all")
except Exception:
    pass


# ---------------------------------------------------------------------------
# Shared piston-pipeline fixture (test_windowed, test_registration)
# ---------------------------------------------------------------------------
import numpy as np  # noqa: E402
import pytest  # noqa: E402


def _piston_windowed_setup():
    """Config + constructor kwargs for the small windowed piston pipeline
    (shared by the build fixture and the resume-from-disk test)."""
    from romtime_tpu.conventions import (
        OperatorType,
        PistonParameters,
        RomParameters,
    )
    from romtime_tpu.parameters import get_uniform_dist
    from romtime_tpu.problems import define_piston_problem

    L, nx, nt, tf = 1.0, 150, 96, 0.6
    domain, bcs, forcing, u0, Lt, dLt_dt = define_piston_problem(
        L=L, nx=nx, tf=tf, nt=nt
    )
    grid = {
        PistonParameters.A0: get_uniform_dist(min=8.0, max=10.0),
        PistonParameters.OMEGA: get_uniform_dist(min=15.0, max=20.0),
        PistonParameters.DELTA: get_uniform_dist(min=0.1, max=0.15),
        PistonParameters.ALPHA: get_uniform_dist(min=1e-6, max=1e-6),
        PistonParameters.GAMMA: get_uniform_dist(min=1.4, max=1.4),
    }
    fom_params = dict(
        domain=domain, dirichlet=bcs, forcing_term=forcing, u0=u0,
        Lt=Lt, dLt_dt=dLt_dt, grid_params={k: "uniform" for k in grid},
    )
    ts = np.linspace(tf / nt, tf, nt)
    rom_params = {
        RomParameters.NUM_SNAPSHOTS: 3,
        RomParameters.SROM_TRUNCATE: 2,
        RomParameters.TOL_TIME: None,
        RomParameters.TOL_MU: None,
        RomParameters.NMDEIM_SIZE: 10,
    }
    deim_params = {RomParameters.TS: ts, RomParameters.NUM_SNAPSHOTS: 3}
    models = {
        OperatorType.MASS: True,
        OperatorType.STIFFNESS: True,
        OperatorType.RHS: True,
        OperatorType.CONVECTION: True,
        OperatorType.NONLINEAR_LIFTING: True,
        OperatorType.TRILINEAR: True,
    }
    return dict(
        grid=grid,
        fom_params=fom_params,
        rom_params=rom_params,
        deim_params=deim_params,
        mdeim_params=dict(deim_params),
        mdeim_nonlinear_params={
            RomParameters.TS: ts[:: max(1, nt // 24)],
            RomParameters.NUM_SNAPSHOTS: 2,
        },
        models=models,
    )


@pytest.fixture(scope="module")
def piston_windowed(tmp_path_factory):
    """Small piston pipeline + windowed serving artifacts, built in its
    own directory so the dumped basis pickles + windowed npz are available
    for the resume test (and stay out of the repo root). Module-scoped:
    each test module gets an isolated instance."""
    from romtime_tpu.conventions import Stage
    from romtime_tpu.rom.hrom import HyperReducedPiston

    cwd = os.getcwd()
    workdir = tmp_path_factory.mktemp("piston_windowed")
    os.chdir(workdir)
    try:
        hrom = HyperReducedPiston(
            **_piston_windowed_setup(), rnd=np.random.RandomState(0)
        )
        hrom.setup()
        hrom.setup_hyperreduction()
        hrom.run_offline_rom()
        hrom.run_offline_hyperreduction(
            mu_space=hrom.mu_space[Stage.OFFLINE], evaluate=False
        )
        hrom.project_reductors()
        hrom.dump_mu_space()
        hrom.dump_reduced_basis()
        hrom.build_windowed_serving(n_windows=4, num_basis=12,
                                    srom_extra=4)

        fom = hrom.fom
        mu_val = dict(a0=9.3, omega=17.5, delta=0.12, alpha=1e-6,
                      gamma=1.4)
        fom.setup()
        fom.update_parametrization(mu_val)
        fom.solve()
        uh_fom = np.asarray(fom.solutions.fom)
    finally:
        os.chdir(cwd)
    return hrom, mu_val, uh_fom, workdir
