"""Distributed POD via Tall-Skinny QR.

TPU-native replacement for the reference's LAPACK ``gesvd`` POD
(reference: rom/pod.py:38) when the snapshot count outgrows one chip:

    S (Nh, M) with M sharded over the mesh's μ axis.
    A = Sᵀ is tall-skinny (M, Nh):
      per-shard QR:   A_i = Q_i R_i            (local, MXU)
      reduce:         R = QR(all_gather R_i)    (ICI collective)
      small SVD:      R = U_R Σ V_Rᵀ            (replicated)
    ⇒ left singular vectors of S are V_R, singular values Σ.

No squaring of the condition number (unlike the Gram/"method of
snapshots"), one all-gather of d·Nh×Nh instead of moving the snapshots.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from .mesh import MU_AXIS, device_mesh


def tsqr_svd(snapshots, mesh=None, axis=MU_AXIS):
    """Left singular vectors + singular values of (Nh, M) ``snapshots``.

    ``snapshots`` may be a host array; it is sharded over columns.
    Returns (U (Nh, r), s (r,)) with r = min(Nh, M_padded).
    """
    if mesh is None:
        mesh = device_mesh()

    snapshots = np.asarray(snapshots)
    nh, m = snapshots.shape
    n_dev = mesh.devices.size

    # Pad the snapshot axis to a multiple of the device count (zero columns
    # do not perturb the SVD).
    m_pad = (-m) % n_dev
    if m_pad:
        snapshots = np.concatenate(
            [snapshots, np.zeros((nh, m_pad), dtype=snapshots.dtype)], axis=1
        )

    A = jnp.asarray(snapshots.T)  # (M, Nh) tall-skinny

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=P(None, None),
        check_vma=False,
    )
    def local_r(a_shard):
        r_local = jnp.linalg.qr(a_shard, mode="r")  # (Nh, Nh)
        r_all = jax.lax.all_gather(r_local, axis, axis=0, tiled=True)
        return r_all  # (n_dev*Nh, Nh), replicated

    r_stack = local_r(A)
    R = jnp.linalg.qr(r_stack, mode="r")
    _, s, vt = jnp.linalg.svd(R, full_matrices=False)
    U = vt.T  # left singular vectors of S, up to column signs
    return np.asarray(U), np.asarray(s)


def orth_distributed(snapshots, num=None, tol=None, normalize=True, mesh=None):
    """Drop-in ``orth`` with the TSQR backend (same truncation semantics as
    :func:`romtime_tpu.rom.pod.orth`)."""
    from ..rom.pod import DROP_TOLERANCE

    snapshots = np.asarray(snapshots)
    if normalize:
        norms = np.linalg.norm(snapshots, axis=0)
        snapshots = snapshots / norms

    U, s = tsqr_svd(snapshots, mesh=mesh)

    eigenvalues = s**2
    energy = np.cumsum(eigenvalues) / np.sum(eigenvalues)

    if tol:
        mask = energy < tol
        Q = U[:, mask]
    elif num:
        Q = U[:, :num]
    else:
        Q = U[:, s > DROP_TOLERANCE]

    return Q, s, energy
