"""Per-mu registered-fleet diagnostics on the warm bench artifacts.

Prints, for each held-out validation mu: its Mach cell, fitted dilation,
matched-grid rel-L2 vs the FOM, and the S-ROM estimator/true ratio —
the row-level view behind bench.py's `rel_l2_multi_mu` and
`windowed_estimator` summary stats (reference certification sweep:
/root/reference/tests/test_mpf1.py:624-718).

Run from a warm BENCH_DIR (defaults to .bench_warm):

    JAX_PLATFORMS=cpu python scripts/permu_diag.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_hrom():
    """Warm-resume the flagship HROM from the bench artifact dir with the
    bench.py 'joint'-profile configuration. Shared by the per-μ and
    corner-attribution diagnostics."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    # A sitecustomize may re-force the axon platform at interpreter
    # startup; pin the CPU backend explicitly (tests/conftest.py pattern)
    # or the f64 certification sweeps run through the TPU tunnel.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(repo_root, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from romtime_tpu.conventions import (
        OperatorType,
        PistonParameters,
        RomParameters,
        StorageNames,
    )
    from romtime_tpu.parameters import get_uniform_dist
    from romtime_tpu.problems import define_piston_problem
    from romtime_tpu.rom.hrom import HyperReducedPiston

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench_dir = os.environ.get("BENCH_DIR",
                               os.path.join(repo, ".bench_warm"))
    os.chdir(bench_dir)

    nx = int(os.environ.get("BENCH_NX", 1000))
    nt = int(os.environ.get("BENCH_NT", 1500))
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
    ts = np.linspace(tf / nt, tf, nt)
    ts_walk = ts[:: max(1, nt // 100)]
    rom_params = {
        RomParameters.NUM_SNAPSHOTS: 8,
        RomParameters.NUM_MU: 96,
        RomParameters.SROM_TRUNCATE: 8,
        RomParameters.TOL_TIME: None,
        RomParameters.TOL_MU: None,
        RomParameters.NMDEIM_SIZE: 96,
    }
    deim_params = {RomParameters.TS: ts_walk, RomParameters.NUM_SNAPSHOTS: 8}
    mdeim_params = dict(deim_params)
    mdeim_nonlinear_params = {RomParameters.TS: ts_walk[::4],
                              RomParameters.NUM_SNAPSHOTS: 3}
    models = {
        OperatorType.MASS: True,
        OperatorType.STIFFNESS: True,
        OperatorType.RHS: True,
        OperatorType.CONVECTION: True,
        OperatorType.NONLINEAR_LIFTING: True,
        OperatorType.TRILINEAR: True,
    }
    hrom = HyperReducedPiston(
        grid=grid, fom_params=fom_params, rom_params=rom_params,
        deim_params=deim_params, mdeim_params=mdeim_params,
        mdeim_nonlinear_params=mdeim_nonlinear_params, models=models,
        rnd=np.random.RandomState(0),
    )
    assert os.path.exists(StorageNames.SROM), "no warm artifacts here"
    t0 = time.time()
    hrom.setup()
    hrom.setup_hyperreduction()
    hrom.start_from_existing_basis()
    hrom.project_reductors()
    rom = hrom.rom
    print(f"[{time.time()-t0:.1f}s] warm resume done; "
          f"cells={None if rom.mulocal is None else rom.mulocal.n_cells}")
    return hrom


def main():
    hrom = build_hrom()
    rom = hrom.rom
    from romtime_tpu.conventions import Errors, PistonParameters, Stage

    nx = int(os.environ.get("BENCH_NX", 1000))
    nt = int(os.environ.get("BENCH_NT", 1500))
    n_multi = int(os.environ.get("BENCH_MULTI_MU", 16))
    mus_val = list(rom.build_sampling_space(
        num=n_multi, rnd=np.random.RandomState(7)
    ))[:n_multi]
    for m in mus_val:
        m.pop(PistonParameters.MACH_PISTON, None)

    outs_m = rom.solve_batch_mulocal(
        [dict(m) for m in mus_val], step=Stage.VALIDATION,
        mode="full", engine="windowed",
    )
    rom._online_fns = {}
    dils_m = np.asarray(outs_m.get("dil", np.ones(len(mus_val))), np.float64)
    mach_arr = np.array([rom.compute_piston_mach_number(m) for m in mus_val])
    cells = np.asarray(rom.mulocal.cell_of(mach_arr), int)

    key = np.array([[float(m[k]) for k in sorted(m)] for m in mus_val])
    cache = "fom_validation_multi.npz"
    fom_refs = None
    if os.path.exists(cache):
        with np.load(cache) as d:
            cached_dil = (np.asarray(d["dil"], np.float64)
                          if "dil" in d else np.ones(len(d["uh"])))
            if (int(d["nx"]) == nx and int(d["nt"]) == nt
                    and d["mu"].shape == key.shape
                    and np.allclose(d["mu"], key)
                    and cached_dil.shape == dils_m.shape
                    and np.allclose(cached_dil, dils_m)):
                fom_refs = d["uh"]
    if fom_refs is None:
        fom = hrom.fom

        def solve_fom_ref(m, d=1.0):
            t_orig = fom.domain[fom.T]
            try:
                if d != 1.0:
                    fom.domain[fom.T] = float(t_orig) * float(d)
                    fom._solve_jit = {}
                fom.setup()
                fom.update_parametrization(m)
                fom.solve()
                return np.asarray(fom.solutions.fom)
            finally:
                if d != 1.0:
                    fom.domain[fom.T] = t_orig
                    fom._solve_jit = {}

        print("solving FOM refs on matched grids")
        fom_refs = np.stack([
            solve_fom_ref(m, float(d))
            for m, d in zip(mus_val, dils_m)
        ])
        np.savez(cache, uh=fom_refs, nx=nx, nt=nt, mu=key, dil=dils_m)

    est = hrom.estimate_batch_mulocal(
        [dict(m) for m in mus_val], step=Stage.VALIDATION
    )

    mach = [float(m[PistonParameters.DELTA]) * float(m[PistonParameters.OMEGA])
            / float(m[PistonParameters.A0]) for m in mus_val]
    print(f"{'i':>2} {'mach':>6} {'cell':>4} {'dil':>7} {'relL2':>10} "
          f"{'est/true':>9}  mu")
    rows = []
    for i, m in enumerate(mus_val):
        uh_i = np.asarray(outs_m["uc"][i]).T
        rel = float(np.linalg.norm(uh_i - fom_refs[i])
                    / np.linalg.norm(fom_refs[i]))
        true_rms = np.linalg.norm(uh_i - fom_refs[i]) / np.sqrt(uh_i.size)
        est_rms = float(np.sqrt(np.mean(
            np.asarray(est[Errors.ESTIMATOR][i]) ** 2)))
        ratio = est_rms / max(true_rms, 1e-300)
        rows.append((rel, ratio))
        print(f"{i:>2} {mach[i]:6.3f} {cells[i]:>4} {dils_m[i]:7.4f} "
              f"{rel:10.3e} {ratio:9.2f}  "
              f"a0={m['a0']:.3f} w={m['omega']:.3f} d={m['delta']:.4f}")
    rels = [r for r, _ in rows]
    rats = [r for _, r in rows]
    print(f"mean {np.mean(rels):.3e} max {np.max(rels):.3e} "
          f"ratio [{np.min(rats):.2f}, {np.max(rats):.2f}]")


if __name__ == "__main__":
    main()
