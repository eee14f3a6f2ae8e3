"""Numeric helpers shared across layers."""

import numpy as np

ZERO_TOLERANCE = 1e-15


def project_dense(Ah, V):
    """Galerkin projection A_N = Vᵀ A_h V for a dense/banded-densified matrix.

    Reference analog: ``project_csr`` (utils.py:96-113), with the CSR matrix
    replaced by whatever array-like supports ``@``.
    """
    return V.T @ (Ah @ V)


def eliminate_zeros_vector(values, tolerance=ZERO_TOLERANCE):
    """Mask of entries that survive zero-elimination.

    The reference drops numerically-zero CSR entries with rtol=atol=1e-15
    (utils.py:152-168); here operators are stored as vectors of structural
    nonzeros, so elimination is a boolean keep-mask over that vector.
    """
    values = np.asarray(values)
    mask = ~np.isclose(values, 0.0, rtol=tolerance, atol=tolerance)
    return mask


def compute_rom_difference(uN, uN_srom, V_srom):
    """Online error estimator: RMS-L2 distance between ROM and S-ROM
    reconstructions (reference: utils.py:173-212).

    Parameters
    ----------
    uN : np.array
        ROM coefficients (size N).
    uN_srom : np.array
        Sacrificial-ROM coefficients (size N_hat >= N).
    V_srom : np.array (Nh, N_hat)
        Sacrificial-ROM basis.
    """
    uN = np.asarray(uN)
    uN_srom = np.asarray(uN_srom)

    extra = len(uN_srom) - len(uN)
    uN_padded = np.append(uN, [0.0] * extra)

    diff = uN_srom - uN_padded
    lincomb = np.sum(diff * V_srom, axis=1)

    error = np.linalg.norm(lincomb, ord=2)
    error /= np.sqrt(len(lincomb))
    return error


def time_average(ts, func):
    """Trapezoid time average normalized by the horizon
    (reference: utils.py:215-221)."""
    integral = np.trapezoid(y=func, x=ts)
    return integral / np.max(ts)


def singular_to_pod_error(sigmas):
    """POD truncation error from a singular-value decay
    (reference: utils.py:224-233)."""
    eigenvalues = np.power(sigmas, 2)
    total = np.sum(eigenvalues)
    pod_error = total - np.cumsum(eigenvalues)
    # Guard the last entry against tiny negative round-off before the sqrt
    pod_error = np.sqrt(np.maximum(pod_error, 0.0))
    return pod_error


def singular_to_energy(sigmas):
    """Cumulative energy fraction of a singular-value decay
    (reference: utils.py:236-243)."""
    eigenvalues = np.power(sigmas, 2)
    total = np.sum(eigenvalues)
    return np.cumsum(eigenvalues) / total
