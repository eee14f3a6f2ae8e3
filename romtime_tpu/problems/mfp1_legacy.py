"""Legacy-generation MFP1 HROM drivers.

The reference ships TWO generations of the heat-equation HROM pipeline
drivers: the current one (reference src/romtime/rom/hrom.py) and an
older, pre-S-ROM generation living inside the problem module
(reference src/romtime/problems/mfp1.py:80-556) that is still exercised
by reference tests/test_mpf1.py:19.  The old generation has no
sacrificial-ROM error estimator and no validation stage, but it carries
three user-facing affordances the new drivers dropped: an
``evaluate_online`` that also accepts an explicit ``mu_space``, and the
``plot_spectrums`` / ``plot_energy`` / ``plot_errors`` reporting plots.

This module is the TPU-native counterpart of that legacy surface: thin
subclasses of the modern drivers (rom/hrom.py here) that restore the
legacy entry points, so a reference user importing the drivers from
``romtime.problems.mfp1`` finds the same API at
``romtime_tpu.problems.mfp1_legacy``.  The numerics underneath are the
modern lax.scan/vmap pipeline — the legacy generation's *algorithms*
(POD walk, greedy DEIM, Galerkin online loop) are identical to the
modern ones, only the orchestration object differed, so re-implementing
the drift (e.g. the stale ``rom.solve`` call signatures, SURVEY §0)
would reproduce bugs, not behavior.
"""

from collections import defaultdict

import numpy as np

from ..conventions import FIG_KWARGS, Stage
from ..rom import hrom as _hrom
from .mfp1 import define_mfp1_problem

__all__ = [
    "HyperReducedOrderModelFixed",
    "HyperReducedOrderModelMoving",
    "define_mfp1_problem",
]


class _LegacyReportingMixin:
    """Legacy evaluation/reporting surface (reference
    problems/mfp1.py:277-438)."""

    FIG_KWARGS = FIG_KWARGS

    def evaluate_online(self, params=None, mu_space=None, rnd=None):
        """Online evaluation over a sampled set (``params``) or an
        explicit parameter list (``mu_space``) — the legacy driver is
        the only reference object accepting both (reference
        problems/mfp1.py:290-313)."""
        self.online_params = params

        rom = self.rom
        if params:
            rnd2 = params.get("rnd", rnd)
            space = rom.build_sampling_space(num=params["num"], rnd=rnd2)
        elif mu_space is not None:
            space = mu_space
        else:
            raise ValueError("evaluate_online needs params or mu_space")

        for mu in space:
            rom.solve(mu=mu, step=Stage.ONLINE)

        # Legacy bookkeeping: per-μ error series against the exact
        # solution (MFP1 is manufactured, so rom.errors is populated).
        self.errors = dict(rom.errors)
        return self.errors

    # ------------------------------------------------------------------
    # Reporting plots (reference problems/mfp1.py:372-438) — the modern
    # drivers dropped these; they only exist in the legacy generation.
    # ------------------------------------------------------------------
    def plot_spectrums(self, save=None, new=True, show=False):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        if new:
            plt.figure()

        SPECTRUM_MU = self.rom.SPECTRUM_MU
        for element, sigmas_dict in self.summary_sigmas.items():
            sigma = sigmas_dict.get(SPECTRUM_MU)
            if sigma is None:
                continue
            sigma = np.asarray(sigma)
            plt.plot(np.log10(np.maximum(sigma, 1e-300)), label=str(element))

        plt.xlabel("Up to n-th basis element")
        plt.ylabel("$\\log (\\sigma)$")
        plt.title("Spectrum decay in the parameter space")
        plt.legend()
        plt.grid(True)
        if save:
            plt.savefig(str(save) + ".png", **self.FIG_KWARGS)
        if show:
            plt.show()
        plt.close("all")

    def plot_energy(self, save=None, show=False):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        ENERGY_MU = self.rom.ENERGY_MU
        for element, energy in self.summary_energy.items():
            ratio = energy.get(ENERGY_MU)
            if ratio is None:
                continue
            plt.plot(np.asarray(ratio), label=str(element))

        plt.xlabel("Up to n-th basis element")
        plt.ylabel("Ratio")
        plt.title("Total POD Energy Ratio")
        plt.legend()
        plt.grid(True)
        if save:
            plt.savefig(str(save) + ".png", **self.FIG_KWARGS)
        if show:
            plt.show()
        plt.close("all")

    def plot_errors(self, save=None, new=True, label=None, show=False):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        if new:
            plt.figure()

        rom = self.rom
        ts = np.asarray(rom.timesteps)
        for idx, error in rom.errors.items():
            error = np.asarray(error)
            n = min(len(error), len(ts))
            plt.plot(ts[len(ts) - n:], np.log10(np.maximum(error[-n:],
                                                           1e-300)),
                     linewidth=1.0, alpha=0.85, label=label)

        plt.xlabel("t")
        plt.ylabel("log10 Error (L2)")
        plt.title("Online Errors")
        if label:
            plt.legend()
        plt.grid(True)
        if save:
            plt.savefig(str(save) + ".png", **self.FIG_KWARGS)
        if show:
            plt.show()
        plt.close("all")


class HyperReducedOrderModelFixed(_LegacyReportingMixin,
                                  _hrom.HyperReducedOrderModelFixed):
    """Legacy fixed-domain MFP1 driver (reference
    problems/mfp1.py:80-460)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        # Legacy drivers report per-μ error *series*; start empty like
        # the reference's defaultdict-flavored bookkeeping.
        self.errors = dict()
        self.summary_errors = defaultdict(dict)


class HyperReducedOrderModelMoving(_LegacyReportingMixin,
                                   _hrom.HyperReducedOrderModelMoving):
    """Legacy moving-domain MFP1 driver (reference
    problems/mfp1.py:463-556)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.errors = dict()
        self.summary_errors = defaultdict(dict)
        self.deim_moving_runned = False

    def run_offline_hyperreduction(self, mu_space=None, evaluate=True):
        super().run_offline_hyperreduction(mu_space=mu_space,
                                           evaluate=evaluate)
        self.deim_moving_runned = True
