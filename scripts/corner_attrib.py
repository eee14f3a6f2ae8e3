"""Attribute the high-Mach-corner served error to its in-span sources.

The corner row of the 16-mu certification (mu14: a0=8.019, omega=19.846,
delta=0.1491 — cell 5) serves at rel-L2 1.4e-5 while its windowed
projection floor is 7.7e-8 and the nested S-ROM estimator reads only 18%
of the true error — the error is in-span and SHARED between ROM and
S-ROM. The shared inputs are the hyper-reduction thetas (DEIM-RHS,
MDEIM convection / nonlinear-lifting) and the N-MDEIM-built trilinear
fast-path tables. This script measures each reductor's interpolation
error AT the corner mu over the serving time grid (reference evaluation
semantics: /root/reference/src/romtime/deim/deim.py:226-261).

Run from the repo root against warm artifacts:
    env -u PALLAS_AXON_POOL_IPS python scripts/corner_attrib.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(repo, ".jax_cache"))
    except Exception:
        pass

    import jax.numpy as jnp

    from scripts.permu_diag import build_hrom  # noqa: F401  (reuse setup)

    hrom = build_hrom()
    mu14 = dict(a0=8.019263506488011, omega=19.845792266348, delta=0.14908754553066,
                alpha=1e-6, gamma=1.4)
    dil = 1.0153979623527734  # fitted law dilation for mu14 (cell 5)
    fom = hrom.fom
    nt = int(fom.domain[fom.NT])
    dt = float(fom.dt)
    ts = (np.arange(1, nt + 1, nt // 40) * dt * dil)

    reds = {
        "deim_rhs": hrom.deim_rhs,
        "mdeim_mass": hrom.mdeim_mass,
        "mdeim_stiffness": hrom.mdeim_stiffness,
        "mdeim_convection": hrom.mdeim_convection,
        "mdeim_nl_lifting": hrom.mdeim_trilinear_lifting,
    }
    # Interpolation check in the nnz-vector convention: _interpolate
    # (pre-scatter) vs the exact assembled snapshot — exactly what the
    # serving θ streams consume per step.
    for name, red in reds.items():
        if red is None:
            continue
        errs = []
        for t in ts:
            exact = np.asarray(red.assemble_snapshot(mu14, float(t)))
            approx = np.asarray(red._interpolate(mu14, float(t),
                                                 which=red.FOM))
            den = max(np.linalg.norm(exact), 1e-300)
            errs.append(np.linalg.norm(exact - approx) / den)
        print(f"nnz {name:18s}: mean {np.mean(errs):.3e} max "
              f"{np.max(errs):.3e}")


if __name__ == "__main__":
    main()
