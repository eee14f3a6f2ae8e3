"""Shared reduction state machine (reference: src/romtime/rom/base.py:9-163).

Every reduction object (POD-RB constructors and the (M)DEIM family) keeps
μ-space bookkeeping per stage, a structured report of the tree walk, and
per-μ online error series.
"""

from collections import defaultdict

import numpy as np
import pandas as pd

from ..conventions import ProblemType, Stage, Treewalk, TreewalkNonlinear
from ..parameters import ParameterSampler


class Reductor:

    FOM = ProblemType.FOM
    ROM = ProblemType.ROM

    BASIS_AFTER_WALK = Treewalk.BASIS_AFTER_WALK
    BASIS_FINAL = Treewalk.BASIS_FINAL
    BASIS_TIME = Treewalk.BASIS_TIME
    ENERGY_MU = Treewalk.ENERGY_MU
    ENERGY_TIME = Treewalk.ENERGY_TIME
    SPECTRUM_MU = Treewalk.SPECTRUM_MU
    SPECTRUM_TIME = Treewalk.SPECTRUM_TIME

    def __init__(self, grid=None) -> None:

        self.grid = grid

        self.mu_space = {
            Stage.OFFLINE: list(),
            Stage.ONLINE: list(),
            Stage.VALIDATION: list(),
        }
        self.report = defaultdict(dict)
        self.errors_rom = defaultdict(list)
        self.summary_errors = None

        self.mu = None
        self.random_state = None

    @staticmethod
    def _compute_error(u, ue):
        """RMS-normalized L2 error (reference: rom/base.py:51-73)."""
        e = np.asarray(u) - np.asarray(ue)
        l2_error = np.linalg.norm(e, ord=2)
        return l2_error / np.sqrt(len(e))

    def add_mu(self, step, mu):
        """Register a parameter point for a stage; returns its index
        (reference: rom/base.py:75-96).

        Deviation from the reference: the reference returns
        ``list.index(mu)`` — the *first* match — so a duplicate μ aliases
        an earlier slot and its error series overwrite each other. We
        return the appended position (drift-class fix, SURVEY §0)."""
        self.mu_space[step].append(mu)
        idx = len(self.mu_space[step]) - 1
        self.mu = mu
        return idx, mu

    def build_sampling_space(self, num, rnd=None):
        """Random μ-sampler over the grid (reference: rom/base.py:98-120)."""
        return ParameterSampler(
            param_distributions=self.grid, n_iter=num, random_state=rnd
        )

    def setup(self, rnd=None):
        """Initialize the tree-walk report slots
        (reference: rom/base.py:122-152)."""
        self.random_state = rnd

        offline = self.report[Stage.OFFLINE]
        for walk in (Treewalk, TreewalkNonlinear):
            offline[walk.BASIS_AFTER_WALK] = None
            offline[walk.BASIS_FINAL] = None
            offline[walk.SPECTRUM_MU] = None
            offline[walk.ENERGY_MU] = None
            offline[walk.BASIS_TIME] = dict()
            offline[walk.SPECTRUM_TIME] = dict()
            offline[walk.ENERGY_TIME] = dict()

    def create_errors_summary(self):
        """Mean/median/max/min error table per μ (reference:
        rom/base.py:154-163)."""
        summary_errors = defaultdict(dict)
        for idx, error in self.errors_rom.items():
            summary_errors[idx]["mean"] = np.mean(error)
            summary_errors[idx]["median"] = np.median(error)
            summary_errors[idx]["max"] = np.max(error)
            summary_errors[idx]["min"] = np.min(error)

        self.summary_errors = pd.DataFrame(summary_errors).T
