"""POD orthogonalization (reference: src/romtime/rom/pod.py:7-62).

The SVD runs on-device (``jnp.linalg.svd``) — the TPU replacement for the
reference's LAPACK ``gesvd`` call; truncation logic is host-side because the
retained rank is data-dependent. For snapshot matrices too tall for one
chip, :func:`romtime_tpu.parallel.tsqr.tsqr_svd` shards the row dimension.

Float64 inputs are pinned to the host CPU backend regardless of the
ambient default device: TPUs emulate f64, and the emulated
``lax.linalg`` SVD is a compile pathology — the cold device-offline
bench sat >50 minutes inside ``backend_compile`` of one such SVD when
``run_offline_rom(device_sweep=True)`` left the POD stage under
``jax.default_device(tpu)`` (2026-08-19; docs/tpu_notes.md).
"""

import jax
import jax.numpy as jnp
import numpy as np

DROP_TOLERANCE = 1e-7


def _svd_device(dtype):
    """Host CPU for f64 (certification grade; see module docstring),
    ambient default otherwise."""
    if np.dtype(dtype) == np.dtype(np.float64):
        try:
            return jax.devices("cpu")[0]
        except RuntimeError:
            return None
    return None


def orth(snapshots, num=None, tol=None, normalize=True, return_VT=False):
    """Compute an orthonormal basis of the snapshot span via SVD.

    Truncation modes (reference semantics, pod.py:44-57):
    - ``tol``: keep modes while the cumulative energy is *below* tol;
    - ``num``: keep the first ``num`` modes;
    - neither: drop modes with singular value < DROP_TOLERANCE.

    Returns (Q, sigmas, energy[, VT]).
    """
    if isinstance(snapshots, list):
        raise ValueError("You should use an array, not a list.")

    snapshots = np.asarray(snapshots)

    if normalize:
        l2_norms = np.linalg.norm(snapshots, axis=0)
        _snapshots = np.divide(snapshots, l2_norms)
    else:
        _snapshots = snapshots

    import contextlib

    dev = _svd_device(np.asarray(_snapshots).dtype)
    ctx = jax.default_device(dev) if dev is not None \
        else contextlib.nullcontext()
    with ctx:
        u, s, vt = jnp.linalg.svd(jnp.asarray(_snapshots),
                                  full_matrices=False)
    u = np.asarray(u)
    s = np.asarray(s)
    vt = np.asarray(vt)

    eigenvalues = np.power(s, 2)
    total = np.sum(eigenvalues)
    energy = np.cumsum(eigenvalues) / total

    if tol:
        mask = energy < tol
        Q = u[:, mask]
        VT = vt[mask, :]
    elif num:
        Q = u[:, :num]
        VT = vt[:num, :]
    else:
        # Reference drops sigma < 1e-7 absolute (pod.py:4). That threshold
        # assumes float64: in float32 the SVD noise floor (~eps·sigma_1) can
        # exceed it, and noise modes poison the DEIM greedy selection. Use
        # the dtype-aware floor, which reduces to the reference behavior in
        # float64.
        eps = np.finfo(_snapshots.dtype).eps
        threshold = max(DROP_TOLERANCE, 50.0 * eps * (s[0] if s.size else 0.0))
        Q = u[:, s > threshold]
        VT = vt[s > threshold, :]

    if return_VT:
        return Q, s, energy, VT
    return Q, s, energy
