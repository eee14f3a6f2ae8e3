#!/usr/bin/env python
"""MFP1 timestep-convergence study.

Working rebuild of the reference's stale script (reference:
scripts/MPF1.py — it imports a module that no longer exists,
scripts/MPF1.py:8): sweeps nt, solves the manufactured heat problem, and
reports the exact-solution error at t = tf per refinement level.

Usage:  python scripts/mpf1_convergence.py [--moving] [--nx 500]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--nx", type=int, default=500)
    parser.add_argument("--tf", type=float, default=10.0)
    parser.add_argument("--L", type=float, default=2.0)
    parser.add_argument("--moving", action="store_true")
    parser.add_argument("--nts", type=int, nargs="+",
                        default=[10, 50, 100, 500, 1000, 5000])
    parser.add_argument("--csv", type=str, default=None)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)

    import pandas as pd

    from romtime_tpu.fom import HeatEquationMovingSolver, HeatEquationSolver
    from romtime_tpu.problems import define_mfp1_problem

    mu = dict(delta=1.0, beta=5.0, alpha_0=1.0)
    if args.moving:
        mu["omega"] = 2.0 * np.pi / (8.0 * args.tf)

    rows = {}
    for nt in args.nts:
        domain, bcs, forcing, u0, ue, Lt, dLt_dt = define_mfp1_problem(
            args.L, args.nx, args.tf, nt
        )
        if args.moving:
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

        err_tf = solver.errors[solver.timesteps[-1]]
        rows[nt] = dict(
            dt=args.tf / nt,
            error_tf=err_tf,
            log10_error=np.log10(err_tf),
        )
        print(f"nt={nt:6d}  dt={args.tf / nt:.4e}  "
              f"log10 err(tf) = {np.log10(err_tf):+.4f}")

    df = pd.DataFrame(rows).T
    df.index.name = "nt"
    if args.csv:
        df.to_csv(args.csv)
        print(f"wrote {args.csv}")

    # First-order-in-time scheme: halving dt should ~halve the error.
    errs = df["error_tf"].to_numpy()
    rates = np.log(errs[:-1] / errs[1:]) / np.log(
        np.array(args.nts[1:]) / np.array(args.nts[:-1])
    )
    print("observed convergence rates:", np.round(rates, 2))


if __name__ == "__main__":
    main()
