"""Solution storage containers (reference: src/romtime/base.py:19-79).

Pickleable time-series containers for solutions on (possibly moving) grids,
with physical-space probing by interpolation over the per-step domain.
"""

import pickle

import numpy as np

from .conventions import PistonParameters


class SolutionsStorageNames:

    DOMAIN = "domain"
    FOM = "fom"
    MU = "mu"
    ROM = "rom"
    SNAPSHOTS = "snapshots"
    TIMESTEPS = "ts"


class SolutionsStorage:
    """Time-series solution container.

    Attributes
    ----------
    ts : (nt,) timesteps
    mu : dict parameter point
    domain : (nh, nt) per-step physical dof coordinates
    fom : (nh, nt) reconstructed solutions (homogeneous + lifting)
    snapshots : (nh, nt) homogeneous solutions (RB training data)
    """

    def __init__(self, ts, mu, domain, fom, snapshots=None) -> None:
        self.ts = np.array(ts)
        self.mu = dict(mu) if mu is not None else None
        self.snapshots = None if snapshots is None else np.array(snapshots)
        self.fom = np.array(fom)
        self.domain = np.array(domain)

    def to_pickle(self, name):
        with open(name + ".pkl", mode="wb") as fp:
            pickle.dump(self, fp)

    def compute_at(self, x):
        """Probe the physical-space value at fixed x over time.

        Interpolates over the per-step moving domain and scales to physical
        units by a0 (reference: base.py:45-67 — the reference flips because
        FEniCS orders dofs from L to 0; this framework orders them
        ascending, so no flip is needed).
        """
        domain = self.domain
        func = self.fom

        points = np.array(
            [
                np.interp(x, domain[:, idx], func[:, idx])
                for idx in range(len(self.ts))
            ]
        )

        a0 = self.mu[PistonParameters.A0]
        return points * a0


class RomSolutionsStorage(SolutionsStorage):
    """Adds the reduced coefficients time series (reference: base.py:70-79)."""

    def __init__(self, ts, mu, domain, fom, rom) -> None:
        super().__init__(ts=ts, mu=mu, domain=domain, fom=fom)
        self.rom = np.array(rom)
