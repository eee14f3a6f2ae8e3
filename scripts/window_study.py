"""Windowed-serving operating-point study at the piston headline config.

Sweeps (n_windows, num_basis) for the time-windowed local-basis serving
path (romtime_tpu/rom/windowed.py) and reports, per point:

- projection floor: rel-L2 of the held-out FOM trajectory projected onto
  the per-window bases (the best any windowed ROM can do),
- served rel-L2: engine="windowed" (lane-batched scans, f64),
- f32 drift: same engine under compute_dtype f32 vs the f64 solve.

This is the study the windowed module's docstrings cite; it motivates the
W=15-16 / N=48 operating point used by `bench.py`'s accuracy profile.
Reference analog: none — KikeM/romtime serves a single global basis
(reference: src/romtime/rom/rom.py:430-555).

Usage:
    python scripts/window_study.py [--nx 1000] [--nt 1500] \
        [--snapshots 3] [--srom-modes 96] [--truncate 8] [--nmdeim 48] \
        [--points 15:48 16:48 8:32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=1000)
    ap.add_argument("--nt", type=int, default=1500)
    ap.add_argument("--snapshots", type=int, default=3)
    ap.add_argument("--srom-modes", type=int, default=96)
    ap.add_argument("--truncate", type=int, default=8)
    ap.add_argument("--nmdeim", type=int, default=48)
    ap.add_argument("--points", nargs="*", default=["15:48"],
                    help="list of W:N pairs")
    ap.add_argument("--f32", action="store_true",
                    help="also measure f32 drift per point")
    ap.add_argument("--floor-only", action="store_true",
                    help="projection floors only (pure numpy, no serving)")
    ap.add_argument("--offline-f32", action="store_true",
                    help="run the FOM sweep in f32 via the batched device "
                         "path (emulates the TPU-resident offline); POD "
                         "and certification stay f64")
    ap.add_argument("--warm-dir", default=None,
                    help="resume the offline pipeline from a bench.py "
                         "BENCH_DIR (basis pickles + offline_snapshots.npz) "
                         "instead of rebuilding it")
    args = ap.parse_args()

    # Offline certification is f64 host work; a sitecustomize may re-force
    # JAX_PLATFORMS at startup, so override via jax.config (conftest recipe).
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from romtime_tpu.conventions import (
        OperatorType,
        PistonParameters,
        RomParameters,
        Stage,
    )
    from romtime_tpu.dtypes import compute_dtype_scope
    from romtime_tpu.parameters import get_uniform_dist
    from romtime_tpu.problems import define_piston_problem
    from romtime_tpu.rom.hrom import HyperReducedPiston

    nx, nt, tf = args.nx, args.nt, 1.0
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
    ts = np.linspace(tf / nt, tf, nt)
    ts_walk = ts[:: max(1, nt // 100)]
    rom_params = {
        RomParameters.NUM_SNAPSHOTS: args.snapshots,
        RomParameters.NUM_MU: args.srom_modes,
        RomParameters.SROM_TRUNCATE: args.truncate,
        RomParameters.TOL_TIME: None,
        RomParameters.TOL_MU: None,
        RomParameters.NMDEIM_SIZE: args.nmdeim,
    }
    deim_params = {RomParameters.TS: ts_walk,
                   RomParameters.NUM_SNAPSHOTS: args.snapshots}
    models = {
        OperatorType.MASS: True,
        OperatorType.STIFFNESS: True,
        OperatorType.RHS: True,
        OperatorType.CONVECTION: True,
        OperatorType.NONLINEAR_LIFTING: True,
        OperatorType.TRILINEAR: True,
    }

    t0 = time.time()
    hrom = HyperReducedPiston(
        grid=grid,
        fom_params=fom_params,
        rom_params=rom_params,
        deim_params=deim_params,
        mdeim_params=dict(deim_params),
        mdeim_nonlinear_params={RomParameters.TS: ts_walk[::4],
                                RomParameters.NUM_SNAPSHOTS: 2},
        models=models,
        rnd=np.random.RandomState(0),
    )
    hrom.setup()
    hrom.setup_hyperreduction()
    if args.warm_dir:
        os.chdir(args.warm_dir)
        hrom.start_from_existing_basis()
        hrom.project_reductors()
    elif args.offline_f32:
        with compute_dtype_scope(jnp.float32):
            hrom.run_offline_rom(device_sweep=True)
        hrom.run_offline_hyperreduction(
            mu_space=hrom.mu_space[Stage.OFFLINE], evaluate=False
        )
        hrom.project_reductors()
    else:
        hrom.run_offline_rom()
        hrom.run_offline_hyperreduction(
            mu_space=hrom.mu_space[Stage.OFFLINE], evaluate=False
        )
        hrom.project_reductors()
    print(f"[study] offline pipeline: {time.time()-t0:.1f}s "
          f"(global N={hrom.rom.N})", flush=True)

    fom = hrom.fom
    rom = hrom.rom
    mu_val = dict(a0=9.3, omega=17.5, delta=0.12, alpha=1e-6, gamma=1.4)
    t0 = time.time()
    uh_fom = uh_hom = None
    if args.warm_dir and os.path.exists("fom_validation_full.npz"):
        with np.load("fom_validation_full.npz") as d:
            if int(d["nx"]) == nx and int(d["nt"]) == nt:
                uh_fom, uh_hom = d["uh"], d["uh_hom"]
    if uh_fom is None:
        fom.setup()
        fom.update_parametrization(mu_val)
        fom.solve()
        uh_fom = np.asarray(fom.solutions.fom)  # (nh, nt), complete
        uh_hom = np.asarray(fom.solutions.snapshots)  # homogeneous part
        if args.warm_dir:
            np.savez("fom_validation_full.npz", uh=uh_fom, uh_hom=uh_hom,
                     nx=nx, nt=nt)
    print(f"[study] FOM reference solve: {time.time()-t0:.1f}s", flush=True)
    nrm = np.linalg.norm(uh_fom)

    snaps = hrom.srom.offline_snapshots
    # Homogeneous validation trajectory for the projection floor: subtract
    # the lifting exactly as the serving path does.
    for spec in args.points:
        W, N = (int(x) for x in spec.split(":"))
        if args.floor_only:
            from romtime_tpu.rom.windowed import build_windowed_basis

            try:
                bounds, Vs, _T = build_windowed_basis(
                    snaps, n_windows=W, num_basis=N
                )
            except ValueError as e:
                print(f"[study] W={W} N={N}: SKIP ({e})", flush=True)
                continue
            err2 = 0.0
            for w in range(W):
                a, b = int(bounds[w]), int(bounds[w + 1])
                seg = uh_hom[:, a:b]
                seg_p = Vs[w] @ (Vs[w].T @ seg)
                err2 += np.linalg.norm(seg - seg_p) ** 2
            floor = np.sqrt(err2) / nrm
            print(f"[study] W={W} N={N}: floor(hom)={floor:.2e}",
                  flush=True)
            continue
        t0 = time.time()
        try:
            win = rom.build_windowed_serving(
                n_windows=W, num_basis=N, snapshots=snaps
            )
        except ValueError as e:
            print(f"[study] W={W} N={N}: SKIP ({e})", flush=True)
            continue
        build_s = time.time() - t0

        t0 = time.time()
        outs = rom.solve_batch([dict(mu_val)], step=Stage.VALIDATION,
                               mode="full", engine="windowed")
        rom._online_fns = {}
        u = np.asarray(outs["uc"][0]).T  # (nh, nt)
        rel = np.linalg.norm(u - uh_fom) / nrm
        solve_s = time.time() - t0

        # Projection floor: rel-L2 of the homogeneous FOM trajectory
        # projected window-by-window — the best any windowed ROM can do.
        err2 = 0.0
        for w in range(win.n_windows):
            a, b = int(win.bounds[w]), int(win.bounds[w + 1])
            V = win.Vs[w]
            seg = uh_hom[:, a:b]
            seg_p = V @ (V.T @ seg)
            err2 += np.linalg.norm(seg - seg_p) ** 2
        floor = np.sqrt(err2) / nrm

        msg = (f"[study] W={W} N={N}: floor(hom)={floor:.2e} "
               f"served rel-L2={rel:.2e} (build {build_s:.1f}s, "
               f"solve {solve_s:.1f}s)")
        if args.f32:
            with compute_dtype_scope(jnp.float32):
                rom._online_fns = {}
                o32 = rom.solve_batch([dict(mu_val)], step=Stage.VALIDATION,
                                      mode="full", engine="windowed")
                rom._online_fns = {}
            u32 = np.asarray(o32["uc"][0]).T
            drift = np.linalg.norm(u32 - u) / nrm
            rel32 = np.linalg.norm(u32 - uh_fom) / nrm
            msg += f" f32-drift={drift:.2e} f32 rel-L2={rel32:.2e}"
        print(msg, flush=True)


if __name__ == "__main__":
    import tempfile

    # Keep HROM artifact dumps (basis pickles, probe CSVs) out of the repo.
    with tempfile.TemporaryDirectory() as _tmp:
        _cwd = os.getcwd()
        os.chdir(_tmp)
        try:
            main()
        finally:
            os.chdir(_cwd)
