"""Plotting helpers (reference: fom/base.py:917-1012, deim/deim.py:563-613,
rom/hrom.py:42).

Matplotlib is imported lazily so headless pipeline runs never pay for it.
"""

import numpy as np

from ..conventions import FIG_KWARGS


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def plot_solution(solutions, pics=6, save=None, scale=1.0, title="Solution"):
    """Snapshots of u(x, t) over the moving domain
    (reference: fom/base.py:917-951)."""
    plt = _plt()
    plt.figure()

    domain = solutions.domain
    fom = solutions.fom
    nt = domain.shape[1]
    step = max(1, nt // pics)

    for t in range(0, nt, step):
        plt.plot(domain[:, t], scale * fom[:, t], c="b")

    plt.grid()
    plt.xlabel("$x$")
    plt.ylabel("$u(x,t)$")
    plt.title(title)

    if save:
        plt.savefig(save, **FIG_KWARGS)
        plt.close()
    else:
        plt.show()


def plot_errors(ts, errors, save=None, log=False, label=None, new=True):
    """Error time series (reference: fom/base.py:953-978)."""
    plt = _plt()
    if new:
        plt.figure()

    errors = np.asarray(errors)
    if log:
        errors = np.log10(errors)
    plt.plot(ts, errors, label=label)

    plt.grid()
    plt.xlabel("$t$")
    plt.ylabel("L2 norm")
    plt.title("Errors")

    if save:
        plt.savefig(save, **FIG_KWARGS)
        plt.close()


def plot_spectrum(sigmas, energy=None, save=None, title="Spectrum decay"):
    """Singular-value decay + cumulative energy
    (reference: deim/deim.py:584-613)."""
    plt = _plt()
    plt.figure()

    sigmas = np.asarray(sigmas)
    plt.semilogy(sigmas / sigmas[0], "o-", label="$\\sigma_i/\\sigma_1$")
    if energy is not None:
        plt.semilogy(1.0 - np.asarray(energy) + 1e-18, "s--",
                     label="1 - energy")

    plt.grid(True)
    plt.xlabel("$i$-th mode")
    plt.legend()
    plt.title(title)

    if save:
        plt.savefig(save, **FIG_KWARGS)
        plt.close()


def plot_deim_errors(deim, save=None, show=False):
    """Online (M)DEIM error series per μ (reference: deim/deim.py:563-582)."""
    plt = _plt()
    plt.figure()

    ts = deim.tree_walk_params["ts"]
    for error in deim.errors_rom.values():
        if np.size(error):
            plt.plot(ts[: len(error)], np.log10(np.asarray(error)))

    plt.grid(True)
    plt.xlabel("$t$")
    plt.ylabel("log10 L2 error")
    plt.title(f"(M)DEIM {str(deim.name).title()} online errors")

    if save:
        plt.savefig(save, **FIG_KWARGS)
        plt.close()
    elif show:
        plt.show()
