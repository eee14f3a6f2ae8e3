#!/usr/bin/env python
"""Oscillating-piston ROM walkthrough — the framework's flagship pipeline
end-to-end on a small configuration (the analog of the reference's piston
scripts, reference: src/romtime/rom/hrom.py:979-1182 usage).

Stages:
  1. offline  — FOM sweeps per μ, hierarchical POD, (M)DEIM + N-MDEIM
                training, Galerkin projection;
  2. online   — a lane-batched μ-sweep in serving mode (probe QoIs only);
  3. certify  — batched S-ROM error estimation, no FOM in the loop.

Run:  python examples/piston_rom.py          (CPU, float64, ~2 min)
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

from romtime_tpu.conventions import (
    Errors,
    OperatorType,
    PistonParameters,
    RomParameters,
    Stage,
)
from romtime_tpu.parameters import get_uniform_dist
from romtime_tpu.problems import define_piston_problem
from romtime_tpu.rom.hrom import HyperReducedPiston


def build_pipeline(nx=300, nt=300):
    """Construct the small piston HROM in a throwaway artifact dir."""
    # Keep pipeline artifacts (probe CSVs, pickles) out of the repo.
    os.chdir(tempfile.mkdtemp(prefix="piston_rom_"))

    # ------------------------------------------------------------------
    # Problem: isentropic gas in a cylinder closed by an oscillating piston
    tf = 1.0
    domain, bcs, forcing, u0, Lt, dLt_dt = define_piston_problem(
        L=1.0, nx=nx, tf=tf, nt=nt
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

    ts = np.linspace(tf / nt, tf, nt)[:: max(1, nt // 60)]
    hrom = HyperReducedPiston(
        grid=grid,
        fom_params=fom_params,
        rom_params={
            RomParameters.NUM_SNAPSHOTS: 3,
            RomParameters.NUM_MU: 12,
            RomParameters.SROM_TRUNCATE: 4,
            RomParameters.TOL_TIME: None,
            RomParameters.TOL_MU: None,
            RomParameters.NMDEIM_SIZE: 10,
        },
        deim_params={RomParameters.TS: ts, RomParameters.NUM_SNAPSHOTS: 3},
        mdeim_params={RomParameters.TS: ts, RomParameters.NUM_SNAPSHOTS: 3},
        mdeim_nonlinear_params={RomParameters.TS: ts[::4],
                                RomParameters.NUM_SNAPSHOTS: 2},
        models={
            OperatorType.MASS: True,
            OperatorType.STIFFNESS: True,
            OperatorType.RHS: True,
            OperatorType.CONVECTION: True,
            OperatorType.NONLINEAR_LIFTING: True,
            OperatorType.TRILINEAR: True,
        },
        rnd=np.random.RandomState(0),
    )
    return hrom


def main():
    hrom = build_pipeline()

    # ------------------------------------------------------------------
    print("offline: FOM sweep + POD + (M)DEIM training ...")
    t0 = time.time()
    hrom.setup()
    hrom.setup_hyperreduction()
    hrom.run_offline_rom()
    hrom.run_offline_hyperreduction(mu_space=hrom.mu_space[Stage.OFFLINE])
    hrom.project_reductors()
    print(f"offline done in {time.time() - t0:.1f}s — "
          f"ROM N={hrom.rom.N}, S-ROM N={hrom.srom.N}")

    # ------------------------------------------------------------------
    # Online serving sweep: probe QoIs only (nothing trajectory-sized
    # leaves the device).
    mus = list(hrom.rom.build_sampling_space(num=32,
                                             rnd=np.random.RandomState(5)))
    for mu in mus:
        mu.pop(PistonParameters.MACH_PISTON, None)

    served = hrom.rom.solve_batch(mus, step=Stage.ONLINE, mode="probes")
    t0 = time.time()  # compile paid above; time the steady-state call
    served = hrom.rom.solve_batch(mus, step=Stage.ONLINE, mode="probes")
    wall = time.time() - t0
    probes = served["probes"]  # (B, nt, 2): outflow + piston-face values
    print(f"online: {len(mus)} μ-solves in {wall:.2f}s "
          f"({len(mus) / wall:.0f} solves/s, one compiled scan)")
    print(f"  piston-face velocity, μ₀, final step: {probes[0, -1, 1]:+.4f}")

    # ------------------------------------------------------------------
    # Batched certification: S-ROM estimator per (μ, t), reduced-space only.
    out = hrom.estimate_batch(mus, step=Stage.ONLINE)
    avg = out[Errors.AVERAGE_ESTIMATOR]
    print("certification (S-ROM estimator, time-averaged):")
    print(f"  median {np.median(avg):.2e}   worst {avg.max():.2e}")




def windowed_mulocal_serving():
    """The flagship serving configuration (smaller scale for a laptop):
    time-windowed local bases + μ-local Mach cells + per-cell S-ROM
    certification. See bench.py for the full headline pipeline."""
    import time

    import numpy as np

    from romtime_tpu.conventions import Errors, PistonParameters, Stage

    hrom = build_pipeline(nx=300, nt=300)
    print("offline: FOM sweep + POD + (M)DEIM training ...")
    hrom.setup()
    hrom.setup_hyperreduction()
    hrom.run_offline_rom()
    hrom.run_offline_hyperreduction(mu_space=hrom.mu_space[Stage.OFFLINE],
                                    evaluate=False)
    hrom.project_reductors()

    # Time-windowed local bases: W windows × N modes each; one
    # (N+Δ)-mode projection loop yields the serving configuration AND its
    # sacrificial estimator reference (nested PODs).
    hrom.build_windowed_serving(n_windows=6, num_basis=16, srom_extra=4)

    # μ-local Mach cells: every served μ routed to a basis trained on
    # nearby trajectories; all cells share (W, N) and the compiled kernel.
    t0 = time.time()
    ml = hrom.build_mulocal_serving(
        n_cells=2, n_windows=6, num_basis=16, snapshots_per_cell=4,
        srom_extra=4,
    )
    print(f"mu-local build ({ml.n_cells} cells) in {time.time()-t0:.1f}s")

    mus = list(hrom.rom.build_sampling_space(num=16,
                                             rnd=np.random.RandomState(5)))
    for mu in mus:
        mu.pop(PistonParameters.MACH_PISTON, None)

    served = hrom.rom.solve_batch_mulocal(mus, step=Stage.ONLINE,
                                          mode="probes", engine="windowed")
    print(f"served {len(mus)} μ through routed windowed bases; "
          f"piston-face v, μ₀, final step: "
          f"{np.asarray(served['probes'])[0, -1, 1]:+.4f}")

    est = hrom.estimate_batch_mulocal(mus, step=Stage.ONLINE)
    avg = np.asarray(est[Errors.AVERAGE_ESTIMATOR])
    print("per-cell S-ROM certification (time-averaged estimator):")
    print(f"  median {np.median(avg):.2e}   worst {avg.max():.2e}")


if __name__ == "__main__":
    if "--windowed" in sys.argv:
        windowed_mulocal_serving()
    else:
        main()
