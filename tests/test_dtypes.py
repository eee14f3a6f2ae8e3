"""Mixed-precision serving: offline-f64 pipelines can serve the online
sweep in float32 with negligible drift."""

import jax.numpy as jnp
import numpy as np

from romtime_tpu.dtypes import compute_dtype, compute_dtype_scope, set_compute_dtype


def test_compute_dtype_default_tracks_x64():
    # conftest enables x64
    assert compute_dtype() == jnp.float64


def test_scope_and_reset():
    with compute_dtype_scope(jnp.float32):
        assert compute_dtype() == jnp.float32
    assert compute_dtype() == jnp.float64

    set_compute_dtype(jnp.float32)
    assert compute_dtype() == jnp.float32
    set_compute_dtype(None)


def test_f32_serving_of_f64_trained_rom():
    from romtime_tpu.fom import HeatEquationSolver
    from romtime_tpu.parameters import get_uniform_dist
    from romtime_tpu.problems import define_mfp1_problem
    from romtime_tpu.rom import RomConstructor
    from romtime_tpu.conventions import Stage

    grid = {
        "delta": get_uniform_dist(min=0.01, max=2.0),
        "beta": get_uniform_dist(min=1.0, max=10.0),
        "alpha_0": get_uniform_dist(min=0.01, max=2.0),
    }
    domain, bcs, forcing, u0, ue, Lt, dLt_dt = define_mfp1_problem(2.0, 60, 10.0, 40)
    fom = HeatEquationSolver(
        domain=domain, dirichlet=bcs,
        parameters=dict(delta=1.0, beta=5.0, alpha_0=1.0),
        forcing_term=forcing, u0=u0, exact_solution=ue,
    )
    fom.setup()

    rom = RomConstructor(fom=fom, grid=grid)
    rom.setup(rnd=np.random.RandomState(0))
    rom.build_reduced_basis(num_snapshots=4)

    mu = rom.mu_space[Stage.OFFLINE][0]
    rom.solve(mu=mu, step=Stage.ONLINE)
    uh_f64 = rom.solutions.fom

    with compute_dtype_scope(jnp.float32):
        rom.solve(mu=mu, step=Stage.ONLINE)
        uh_f32 = rom.solutions.fom

    assert uh_f32.dtype == np.float32
    drift = np.linalg.norm(uh_f32 - uh_f64) / np.linalg.norm(uh_f64)
    assert drift < 1e-5
