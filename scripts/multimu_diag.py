"""Multi-μ windowed-serving error decomposition at the headline point.

For each held-out validation parameter, splits the served-vs-FOM error
into the component INSIDE the per-window basis span (ROM dynamics +
hyper-reduction error) and the orthogonal component (the projection
floor of that trajectory — the best any ROM on these bases can do):

    err = u_served − u_fom,  u_served ∈ span(V_w) + lifting
    ⇒ (I − P_w) err = −(I − P_w) (u_fom − g) = projection floor part.

This identifies whether poor corner-μ accuracy needs richer bases (more
offline snapshot trajectories) or better operator hyper-reduction
(larger/better-trained (M)DEIMs). Reference analog: the 20-μ error
statistics table of tests/test_mpf1.py:624-718 (which reports only the
total error).

Usage:
    python scripts/multimu_diag.py <warm_dir> [n_mu]
    python scripts/multimu_diag.py <dir> [n_mu] --cold --snapshots 8 \
        [--windows 30] [--window-n 40] [--nmdeim 48] [--tri-snapshots 3]

--cold rebuilds the offline pipeline in <dir> with the given snapshot
counts (persisting the artifacts for later warm runs) instead of
resuming; the multi-μ FOM reference cache is reused either way.
"""

import argparse
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dir", nargs="?", default=".bench_warm")
    ap.add_argument("n_mu", nargs="?", type=int, default=16)
    ap.add_argument("--cold", action="store_true")
    ap.add_argument("--rebuild", action="store_true",
                    help="warm-resume the basis but re-project the "
                         "windowed serving at the requested (W, N) from "
                         "the retained offline snapshots")
    ap.add_argument("--snapshots", type=int, default=3)
    ap.add_argument("--windows", type=int, default=30)
    ap.add_argument("--window-n", type=int, default=40)
    ap.add_argument("--nmdeim", type=int, default=48)
    ap.add_argument("--tri-snapshots", type=int, default=2)
    ap.add_argument("--srom-modes", type=int, default=96)
    ap.add_argument("--train-box", default=None,
                    help="restrict the TRAINING grid to a sub-box, e.g. "
                         "'a0:8.0:8.6,omega:19:20,delta:0.135:0.15' "
                         "(validation μ still come from the full box)")
    ap.add_argument("--train-corners", action="store_true",
                    help="with --train-box: train at the 8 sub-box corners "
                         "+ center (deterministic hull coverage) instead "
                         "of random samples")
    ap.add_argument("--mulocal", type=int, default=0,
                    help="build K Mach-cell mu-local serving (warm resume "
                         "+ per-cell top-up FOM solves) and validate "
                         "through solve_batch_mulocal")
    ap.add_argument("--per-cell", type=int, default=10,
                    help="training trajectories per mu-local cell (>=10 "
                         "keeps every per-window POD mode meaningful — "
                         "see build_mulocal_serving docstring)")
    ap.add_argument("--aug", type=int, default=0,
                    help="box-wide trajectories appended to every cell "
                         "stack (-1 = all retained; legacy mitigation, "
                         "dilutes capacity)")
    ap.add_argument("--aug-weight", type=float, default=1.0)
    ap.add_argument("--edges", default=None,
                    help="custom Mach cell edges, e.g. '0.15,0.25,0.33,0.4'"
                         " (overrides --mulocal count)")
    ap.add_argument("--srom-extra", type=int, default=0,
                    help="per-cell sacrificial estimator modes (N+extra)")
    ap.add_argument("--cell-wn", default=None,
                    help="mixed-(W,N) fleet, e.g. '50x32,50x32,50x32,30x40'"
                         " — one WxN per Mach cell (overrides --windows/"
                         "--window-n for the mu-local build)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import numpy as np

    from romtime_tpu.conventions import (
        OperatorType,
        PistonParameters,
        RomParameters,
        Stage,
    )
    from romtime_tpu.parameters import get_uniform_dist
    from romtime_tpu.problems import define_piston_problem
    from romtime_tpu.rom.hrom import HyperReducedPiston

    warm = args.dir
    n_mu = args.n_mu

    nx, nt, tf = 1000, 1500, 1.0
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
    ts = np.linspace(tf / nt, tf, nt)
    hrom = HyperReducedPiston(
        grid=grid,
        fom_params=dict(domain=domain, dirichlet=bcs, forcing_term=forcing,
                        u0=u0, Lt=Lt, dLt_dt=dLt_dt,
                        grid_params={k: "uniform" for k in grid}),
        rom_params={RomParameters.NUM_SNAPSHOTS: args.snapshots,
                    RomParameters.NUM_MU: args.srom_modes,
                    RomParameters.SROM_TRUNCATE: 8,
                    RomParameters.TOL_TIME: None,
                    RomParameters.TOL_MU: None,
                    RomParameters.NMDEIM_SIZE: args.nmdeim},
        deim_params={RomParameters.TS: ts[:: max(1, nt // 100)],
                     RomParameters.NUM_SNAPSHOTS: args.snapshots},
        mdeim_params={RomParameters.TS: ts[:: max(1, nt // 100)],
                      RomParameters.NUM_SNAPSHOTS: args.snapshots},
        mdeim_nonlinear_params={
            RomParameters.TS: ts[:: max(1, nt // 100)][::4],
            RomParameters.NUM_SNAPSHOTS: args.tri_snapshots},
        models={OperatorType.MASS: True, OperatorType.STIFFNESS: True,
                OperatorType.RHS: True, OperatorType.CONVECTION: True,
                OperatorType.NONLINEAR_LIFTING: True,
                OperatorType.TRILINEAR: True},
        rnd=np.random.RandomState(0),
    )
    os.makedirs(warm, exist_ok=True)
    os.chdir(warm)
    t0 = time.time()
    hrom.setup()
    hrom.setup_hyperreduction()
    if args.cold:
        mu_train = None
        if args.train_box:
            from romtime_tpu.parameters import ParameterSampler

            box = {}
            for part in args.train_box.split(","):
                name, lo, hi = part.split(":")
                box[name] = get_uniform_dist(min=float(lo), max=float(hi))
            for name, dist in grid.items():
                box.setdefault(name, dist)
            if args.train_corners:
                import itertools

                rng = {}
                for name in ("a0", "omega", "delta"):
                    s = box[name].support()
                    rng[name] = (min(s), max(s))
                mu_train = []
                for bits in itertools.product((0, 1), repeat=3):
                    m = {"alpha": 1e-6, "gamma": 1.4}
                    for b, name in zip(bits, ("a0", "omega", "delta")):
                        m[name] = rng[name][b]
                    mu_train.append(m)
                mu_train.append({"alpha": 1e-6, "gamma": 1.4,
                                 **{n: 0.5 * (rng[n][0] + rng[n][1])
                                    for n in ("a0", "omega", "delta")}})
            else:
                mu_train = [dict(m) for m in ParameterSampler(
                    box, n_iter=args.snapshots,
                    random_state=np.random.RandomState(0))]
            for m in mu_train:
                print(f"[diag] train mu: " + " ".join(
                    f"{k}={m[k]:.3f}" for k in ("a0", "omega", "delta")),
                    flush=True)
        hrom.run_offline_rom(mu_space=mu_train)
        hrom.run_offline_hyperreduction(
            mu_space=hrom.mu_space[Stage.OFFLINE], evaluate=False
        )
        hrom.project_reductors()
        hrom.dump_mu_space()
        hrom.dump_reduced_basis()
        hrom.dump_offline_snapshots()
        hrom.build_windowed_serving(n_windows=args.windows,
                                    num_basis=args.window_n)
        print(f"[diag] cold offline {time.time()-t0:.1f}s "
              f"(snapshots={args.snapshots})", flush=True)
    else:
        hrom.start_from_existing_basis()
        hrom.project_reductors()
        if args.rebuild:
            hrom.rom.windows = None
            hrom.build_windowed_serving(n_windows=args.windows,
                                        num_basis=args.window_n)
        print(f"[diag] warm resume {time.time()-t0:.1f}s", flush=True)
    rom = hrom.rom
    ml = None
    if args.mulocal:
        t1 = time.time()
        ml = hrom.build_mulocal_serving(
            n_cells=args.mulocal, n_windows=args.windows,
            num_basis=args.window_n, snapshots_per_cell=args.per_cell,
            rnd=np.random.RandomState(11),
            augment_global=(True if args.aug < 0 else args.aug),
            augment_weight=args.aug_weight,
            edges=([float(x) for x in args.edges.split(",")]
                   if args.edges else None),
            srom_extra=args.srom_extra or None,
            cell_wn=([tuple(int(v) for v in s.split("x"))
                      for s in args.cell_wn.split(",")]
                     if args.cell_wn else None),
        )
        print(f"[diag] mulocal K={ml.n_cells} edges={np.round(ml.edges, 3)}"
              f" built in {time.time()-t1:.1f}s", flush=True)
    win = ml.cells[0] if ml is not None else rom.windows
    assert win is not None, "dir has no windowed serving configuration"
    print(f"[diag] W={win.n_windows} N={win.N}", flush=True)

    mus = list(rom.build_sampling_space(num=n_mu,
                                        rnd=np.random.RandomState(7)))[:n_mu]
    for m in mus:
        m.pop(PistonParameters.MACH_PISTON, None)
    # Last row: the bench's single-μ certification point (bench.py mu_val)
    # so the scan reads the joint (single-μ, multi-μ) trade-off directly.
    mus.append(dict(a0=9.3, omega=17.5, delta=0.12, alpha=1e-6, gamma=1.4))
    key = np.array([[float(m[k]) for k in sorted(m)] for m in mus])

    refs = None
    if os.path.exists("fom_validation_multi.npz"):
        with np.load("fom_validation_multi.npz") as d:
            if d["mu"].shape == key.shape and np.allclose(d["mu"], key):
                refs = d["uh"]
    if refs is None:
        print(f"[diag] solving {len(mus)} FOM references...", flush=True)
        out = []
        fom = hrom.fom
        for m in mus:
            fom.setup()
            fom.update_parametrization(m)
            fom.solve()
            out.append(np.asarray(fom.solutions.fom))
        refs = np.stack(out)
        np.savez("fom_validation_multi.npz", uh=refs, nx=nx, nt=nt, mu=key)

    t0 = time.time()
    if ml is not None:
        outs = rom.solve_batch_mulocal([dict(m) for m in mus],
                                       step=Stage.VALIDATION,
                                       mode="full", engine="windowed")
    else:
        outs = rom.solve_batch([dict(m) for m in mus], step=Stage.VALIDATION,
                               mode="full", engine="windowed")
    print(f"[diag] windowed validation sweep {time.time()-t0:.1f}s",
          flush=True)

    print(f"[diag] {'a0':>6} {'omega':>6} {'delta':>6}  "
          f"{'rel':>9} {'floor':>9} {'inspace':>9}", flush=True)
    rows = []
    for i, m in enumerate(mus):
        if ml is not None:
            from romtime_tpu.rom.rom import RomConstructorNonlinear as RCN

            win = ml.cells[int(ml.cell_of(
                RCN.compute_piston_mach_number(m)
            ))]
        u = np.asarray(outs["uc"][i]).T          # (nh, nt)
        err = u - refs[i]
        nrm = np.linalg.norm(refs[i])
        floor2 = 0.0
        for w in range(win.n_windows):
            a, b = int(win.bounds[w]), int(win.bounds[w + 1])
            V = win.Vs[w]
            seg = err[:, a:b]
            seg_in = V @ (V.T @ seg)
            floor2 += np.linalg.norm(seg - seg_in) ** 2
        rel = np.linalg.norm(err) / nrm
        floor = np.sqrt(floor2) / nrm
        inspace = np.sqrt(max(np.linalg.norm(err) ** 2 - floor2, 0.0)) / nrm
        rows.append((rel, floor, inspace))
        print(f"[diag] {m['a0']:6.2f} {m['omega']:6.2f} {m['delta']:6.3f}  "
              f"{rel:9.2e} {floor:9.2e} {inspace:9.2e}", flush=True)
    rels = np.array([r[0] for r in rows])
    floors = np.array([r[1] for r in rows])
    print(f"[diag] rel    mean {rels.mean():.2e} max {rels.max():.2e}",
          flush=True)
    print(f"[diag] floor  mean {floors.mean():.2e} max {floors.max():.2e}",
          flush=True)


if __name__ == "__main__":
    main()
