"""Certification utilities (reference: tests/test_utils.py:6-40 and
tests/test_errors.py:17-60)."""

import numpy as np
from numpy.testing import assert_allclose

from romtime_tpu.rom.base import Reductor
from romtime_tpu.utils import (
    compute_rom_difference,
    singular_to_energy,
    singular_to_pod_error,
    time_average,
)


def test_compute_rom_difference_hand_computed():
    """ROM-vs-SROM estimator against a hand-computed norm
    (reference: tests/test_utils.py)."""
    V_srom = np.array(
        [
            [1.0, 0.0, 0.5],
            [0.0, 1.0, -0.5],
            [1.0, 1.0, 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    uN = np.array([1.0, 2.0])
    uN_srom = np.array([1.0, 2.0, 3.0])

    # Difference lives only in the third mode with coefficient 3.
    diff_vector = 3.0 * V_srom[:, 2]
    expected = np.linalg.norm(diff_vector) / np.sqrt(V_srom.shape[0])

    got = compute_rom_difference(uN=uN, uN_srom=uN_srom, V_srom=V_srom)
    assert np.isclose(got, expected)


def test_compute_rom_difference_equal_roms():
    V = np.eye(4)[:, :3]
    uN = np.array([0.3, -0.2, 0.9])
    assert compute_rom_difference(uN, uN, V) == 0.0


def test_reductor_rms_error():
    """RMS-normalized L2 error (reference: tests/test_errors.py)."""
    u = np.array([1.0, 2.0, 3.0, 4.0])
    ue = np.array([1.5, 2.0, 2.5, 4.0])
    expected = np.linalg.norm(u - ue) / 2.0  # sqrt(4) = 2
    assert np.isclose(Reductor._compute_error(u, ue), expected)


def test_time_average():
    ts = np.linspace(0.0, 2.0, 101)
    func = 3.0 * np.ones_like(ts)
    assert np.isclose(time_average(ts, func), 3.0)


def test_singular_value_transforms():
    sigmas = np.array([3.0, 2.0, 1.0])
    energy = singular_to_energy(sigmas)
    assert np.isclose(energy[-1], 1.0)
    assert np.all(np.diff(energy) > 0)

    pod_err = singular_to_pod_error(sigmas)
    assert np.isclose(pod_err[-1], 0.0)
    assert np.isclose(pod_err[0] ** 2, 4.0 + 1.0)


def test_installation():
    """Environment smoke (reference: tests/test_installation.py)."""
    import jax
    import romtime_tpu

    assert romtime_tpu.__version__
    assert len(jax.devices()) >= 1
