"""Shared vocabulary: string-constant namespaces used as config schema and
storage keys throughout the framework.

API parity with the reference library's ``romtime.conventions``
(reference: src/romtime/conventions.py:1-156). These names are part of the
public contract — user configuration dicts and report dictionaries are keyed
by them — so they are reproduced verbatim as *names*; the implementation
behind them is TPU-native.
"""

FIG_KWARGS = dict(dpi=300, bbox_inches="tight")


class ProblemType:
    """Model fidelity tags (reference: conventions.py:15-20)."""

    FOM = "fom"
    ROM = "rom"
    SROM = "srom"
    HROM = "hrom"


class OperatorType(ProblemType):
    """Algebraic operator tags (reference: conventions.py:48-59)."""

    MASS = "mass"
    STIFFNESS = "stiffness"
    CONVECTION = "convection"
    TRILINEAR = "trilinear"
    NONLINEAR = "nonlinear"
    NONLINEAR_LIFTING = "nonlinear-lifting"
    FORCING = "forcing"
    LIFTING = "lifting"
    RHS = "rhs"
    REDUCED_BASIS = "reduced-basis"


class Stage:
    """Pipeline stages (reference: conventions.py:91-95)."""

    OFFLINE = "offline"
    VALIDATION = "validation"
    ONLINE = "online"


class BDF:
    """Time integration schemes (reference: conventions.py:42-45)."""

    ONE = "1"
    TWO = "2"


class Domain:
    """Space/time domain keys (reference: conventions.py:109-114)."""

    NX = "nx"
    NT = "nt"
    T = "T"
    L0 = "L0"


class BoundaryConditions:
    """Dirichlet data keys (reference: conventions.py:98-106)."""

    B0 = "b0"
    BL = "bL"
    DB0_DT = "db0_dt"
    DBL_DT = "dbL_dt"


class Treewalk:
    """Report keys for the POD tree walk (reference: conventions.py:62-70)."""

    BASIS_AFTER_WALK = "basis-shape-after-tree-walk"
    BASIS_FINAL = "basis-shape-final"
    BASIS_TIME = "basis-shape-time"
    ENERGY_MU = "energy-mu"
    ENERGY_TIME = "energy-time"
    SPECTRUM_MU = "spectrum-mu"
    SPECTRUM_TIME = "spectrum-time"


class TreewalkNonlinear:
    """Report keys for the nonlinear-operator tree walk
    (reference: conventions.py:73-81)."""

    BASIS_AFTER_WALK = "N-basis-shape-after-tree-walk"
    BASIS_FINAL = "N-basis-shape-final"
    BASIS_TIME = "N-basis-shape-time"
    ENERGY_MU = "N-energy-mu"
    ENERGY_TIME = "N-energy-time"
    SPECTRUM_MU = "N-spectrum-mu"
    SPECTRUM_TIME = "N-spectrum-time"


class EmpiricalInterpolation:
    """Hyper-reduction flavors (reference: conventions.py:84-88)."""

    DEIM = "DEIM"
    MDEIM = "MDEIM"
    NONLINEAR = "N-MDEIM"


class RomParameters:
    """ROM configuration keys (reference: conventions.py:117-137)."""

    # Offline phase
    NUM_SNAPSHOTS = "num_snapshots"
    NUM_MU = "num_mu"
    NUM_TIME = "num_time"
    NUM_BASIS = "num_phi"
    TOL_MU = "tol_mu"
    TOL_TIME = "tol_time"
    TOL_BASIS = "tol_phi"
    TS = "ts"
    # Hierarchical-POD weighting: keep the sigma-weighted stacks
    # unnormalized at the mu-combination stages so slowly-decaying
    # operator families stay energy-ordered (extension; the reference
    # always re-normalizes, deim/deim.py:306-311).
    WEIGHTED_POD = "weighted_pod"

    # Online phase
    NUM_ONLINE = "num_online"

    # Sacrificial-ROM definition
    SROM_TRUNCATE = "srom_truncate"  # how many modes to drop
    SROM_KEEP = "srom_num"  # how many modes to keep

    # Nonlinear MDEIM truncation
    NMDEIM_SIZE = "mdeim_truncate"


class PistonParameters:
    """Piston problem parameter names (reference: conventions.py:147-156)."""

    A0 = "a0"
    ALPHA = "alpha"
    DELTA = "delta"
    GAMMA = "gamma"
    OMEGA = "omega"

    MACH_PISTON = "piston_mach"
    NONLINEARITY = "eta"


class MassConservation:
    """Mass conservation report keys (reference: conventions.py:23-29)."""

    WHICH = "which"
    TIMESTEPS = "timesteps"
    MASS = "mass"
    MASS_CHANGE = "mass_change"
    OUTFLOW = "outflow"


class Errors(ProblemType):
    """Error report keys (reference: conventions.py:32-39)."""

    SACRIFICIAL = "sacrificial"
    ESTIMATOR = "estimator"

    AVERAGE_ROM = "rom_average"
    AVERAGE_ESTIMATOR = "estimator_average"
    AVERAGE_SACRIFICIAL = "srom_average"


class ProbeLocations:
    """Probe naming (reference: conventions.py:140-144)."""

    OUTFLOW = "outflow"
    MIDDLE = "halfway"
    PISTON = "piston"


class StorageNames:
    """Canonical checkpoint artifact names (reference: conventions.py:4-12).

    The rebuild stores arrays in ``.npz`` containers but keeps the reference
    basenames so resume-from-disk layouts stay recognisable; pickle fallbacks
    use the original names.
    """

    ROM = "basis_rom.pkl"
    SROM = "basis_srom.pkl"

    VALIDATION_SOLUTIONS = "validation_solutions.pkl"
    SETUP = "setup.json"
    MU_SPACE = "mu_space.json"
    MU_SPACE_DEIM = "mu_space_deim.json"

    # TPU-era extension artifacts (no reference analog): the time-windowed
    # local-basis serving configuration (rom/windowed.py) and the retained
    # offline FOM snapshots that windowed bases are built from.
    WINDOWS = "windowed_serving.npz"
    WINDOWS_SROM = "windowed_serving_srom.npz"
    WINDOWS_MULOCAL = "windowed_serving_mulocal.npz"
    MULOCAL_SNAPSHOTS = "mulocal_snapshots.npz"
    SNAPSHOTS = "offline_snapshots.npz"
