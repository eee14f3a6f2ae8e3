"""Measured per-component ledger of the fused windowed serving kernel.

Runs the v3 fused kernel at the headline operating point (warm BENCH_DIR
required — see bench.py) with pieces ablated in turn, timing each variant
with the chained-marginal protocol (docs/tpu_notes.md "Timing pitfall":
jax.block_until_ready is a no-op on the axon backend, so sweeps chain
through data dependencies and one scalar leaves the device).

Usage:
    BENCH_DIR=.bench_warm python scripts/kernel_ledger.py [B] [reps]

Prints one line per variant: wall/sweep, µs/step (whole batch), and the
derived component costs (dots, solve, trilinear, boundary, floor).
"""

import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    cache_dir = os.path.join(repo, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp
    import numpy as np

    from romtime_tpu.conventions import (
        OperatorType,
        PistonParameters,
        RomParameters,
        Stage,
    )
    from romtime_tpu.dtypes import compute_dtype_scope
    from romtime_tpu.ops.pallas_online import online_sweep_windowed_fused
    from romtime_tpu.parameters import get_uniform_dist
    from romtime_tpu.problems import define_piston_problem
    from romtime_tpu.rom.hrom import HyperReducedPiston

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n_rep = int(sys.argv[2]) if len(sys.argv) > 2 else 3

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
        rom_params={RomParameters.NUM_SNAPSHOTS: 3,
                    RomParameters.NUM_MU: 96,
                    RomParameters.SROM_TRUNCATE: 8,
                    RomParameters.TOL_TIME: None,
                    RomParameters.TOL_MU: None,
                    RomParameters.NMDEIM_SIZE: 48},
        deim_params={RomParameters.TS: ts[:: max(1, nt // 100)],
                     RomParameters.NUM_SNAPSHOTS: 3},
        mdeim_params={RomParameters.TS: ts[:: max(1, nt // 100)],
                      RomParameters.NUM_SNAPSHOTS: 3},
        mdeim_nonlinear_params={RomParameters.TS: ts[:: max(1, nt // 100)][::4],
                                RomParameters.NUM_SNAPSHOTS: 2},
        models={OperatorType.MASS: True, OperatorType.STIFFNESS: True,
                OperatorType.RHS: True, OperatorType.CONVECTION: True,
                OperatorType.NONLINEAR_LIFTING: True,
                OperatorType.TRILINEAR: True},
        rnd=np.random.RandomState(0),
    )
    cpu0 = jax.devices("cpu")[0]
    with jax.default_device(cpu0):
        hrom.setup()
        hrom.setup_hyperreduction()
        hrom.start_from_existing_basis()
        hrom.project_reductors()
    rom = hrom.rom
    assert rom.windows is not None, "warm BENCH_DIR with windows required"
    win = rom.windows
    fom = hrom.fom

    mus = list(rom.build_sampling_space(num=64, rnd=np.random.RandomState(3)))
    reps = int(np.ceil(B / len(mus)))
    mus = (mus * reps)[:B]
    for mu in mus:
        mu.pop(PistonParameters.MACH_PISTON, None)
    for mu in mus:
        rom.add_mu(mu=mu, step=Stage.ONLINE)
    names = sorted(mus[0].keys())
    batch = {k: jnp.asarray(np.array([float(m[k]) for m in mus]),
                            jnp.float32) for k in names}

    accel = jax.devices()[0]
    with jax.default_device(accel), compute_dtype_scope(jnp.float32):
        rom._prime_online_tables()
        tables = rom._windowed_pallas_tables()
        prep = jax.jit(rom._full_precision(rom._windowed_pallas_prep))(
            batch, tables
        )
        TH = jnp.concatenate(
            [prep["THm"], prep["THk"], prep["THf"], prep["g"]], axis=1
        )
        b0 = prep["b0"]
        km8 = tables["Bm"].shape[2]
        kk8 = tables["Bk"].shape[2]
        kf8 = tables["Bf"].shape[2]
        N = win.N
        NP = tables["Tp"].shape[1]
        widths = tuple(int(x) for x in np.diff(win.bounds))
        bdf2 = True

        def make_run(ablate, with_trilinear=True, paired=None):
            def run(state0):
                return online_sweep_windowed_fused(
                    TH, tables["Bmk"], tables["BmF"], tables["BkF"],
                    tables["BfT"], tables["TQ"], tables["VE"],
                    tables["Tp"], b0, state0,
                    widths=widths, dt=float(fom.dt), bdf2=bdf2,
                    with_trilinear=with_trilinear, n_real=N,
                    km8=km8, kk8=kk8, kf8=kf8, ablate=ablate,
                    solve_iters=rom._windowed_solve_iters(),
                    paired_lu=paired,
                )
            return run

        def chain(run, reps):
            state = jnp.zeros((4, NP, B), jnp.float32)
            acc = jnp.asarray(0.0, jnp.float32)
            for _ in range(reps):
                probes, state = run(state * 1e-30 + acc * 1e-30)
                acc = jnp.sum(state[0])
            return float(np.asarray(acc))

        results = {}
        variants = [
            ("full", None, True, None),
            ("no_solve", "no_solve", True, None),
            ("no_dots", "no_dots", True, None),
            ("no_boundary", "no_boundary", True, None),
            ("no_trilinear", None, False, None),
            ("empty", "empty", True, None),
        ]
        # Paired-step LU panel-reuse variants (ROMTIME_PAIRED_LU
        # serving mode): extra full-kernel rows for the group sizes
        # listed in LEDGER_PAIRED (comma-separated), e.g.
        # LEDGER_PAIRED=2,3.
        for gs in os.environ.get("LEDGER_PAIRED", "").split(","):
            if gs.strip():
                g = int(gs)
                variants.append((f"full_paired{g}", None, True, g))
        for name, ablate, tri, paired in variants:
            run = make_run(ablate, tri, paired)
            if not tri:
                # with_trilinear=False needs tables built without the
                # folded T0 block; fleet caches fold it in — skip.
                try:
                    chain(run, 1)
                except ValueError as e:
                    print(f"[ledger] {name:13s} skipped ({e})", flush=True)
                    continue
            t_c0 = time.time()
            chain(run, 1)   # compile + execute
            compile_wall = time.time() - t_c0
            chain(run, n_rep)
            t0 = time.time()
            chain(run, 1)
            w1 = time.time() - t0
            t0 = time.time()
            chain(run, n_rep)
            wk = time.time() - t0
            wall = (wk - w1) / max(n_rep - 1, 1)
            results[name] = wall
            print(f"[ledger] {name:13s} {wall*1e3:8.2f} ms/sweep  "
                  f"{wall/1500*1e6:7.2f} us/step  "
                  f"(first-call {compile_wall:.1f}s)", flush=True)

        full = results["full"]
        print(f"[ledger] derived (us/step, whole batch B={B}):", flush=True)
        for part, key in [("theta dots", "no_dots"), ("solve", "no_solve"),
                          ("trilinear", "no_trilinear"),
                          ("boundary dd", "no_boundary")]:
            if key not in results:
                continue
            d = (full - results[key]) / 1500 * 1e6
            print(f"[ledger]   {part:12s} {d:7.2f}", flush=True)
        print(f"[ledger]   floor        "
              f"{results['empty']/1500*1e6:7.2f}", flush=True)
        print(f"[ledger]   full         {full/1500*1e6:7.2f}", flush=True)


if __name__ == "__main__":
    bench_dir = os.environ.get("BENCH_DIR")
    if bench_dir:
        os.chdir(bench_dir)
    main()
