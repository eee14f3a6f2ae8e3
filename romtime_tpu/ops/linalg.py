"""Direct solvers for the banded FOM systems.

Replaces PETSc GMRES+ILU (reference: fom/base.py:360-375, solve at :774).
The 1-D P1 system is tridiagonal: a direct solve is exact (more accurate
than the reference's 1e-10 iterative tolerance). The default is parallel
cyclic reduction — log-depth, fully vectorized, the fastest choice on TPU
*and* on XLA:CPU (the sequential Thomas ``lax.scan`` is loop-overhead
bound there; see :func:`solve_banded`). Higher degrees (p ≤ 5, used by
the Mock/test layer) fall back to a dense solve — Nh there is small by
construction.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .assembly import band_to_dense


def tridiag_solve(band, rhs):
    """Solve A x = rhs with tridiagonal A in banded storage (3, nh).

    band[0, r] = A[r, r-1], band[1, r] = A[r, r], band[2, r] = A[r, r+1].
    Thomas algorithm, no pivoting (the BDF system is diagonally dominant).
    Batch axes broadcast: band (..., 3, nh), rhs (..., nh).
    """
    lower, diag, upper = band[..., 0, :], band[..., 1, :], band[..., 2, :]

    def fwd(carry, inp):
        c_prev, d_prev = carry
        a_i, b_i, c_i, r_i = inp
        m = b_i - a_i * c_prev
        c_new = c_i / m
        d_new = (r_i - a_i * d_prev) / m
        return (c_new, d_new), (c_new, d_new)

    # Move the spatial axis to the front for scan; keep batch axes behind.
    def _solve(lo, di, up, r):
        init = (jnp.zeros_like(di[0]), jnp.zeros_like(di[0]))
        (_, _), (cs, ds) = jax.lax.scan(fwd, init, (lo, di, up, r))

        def bwd(x_next, inp):
            c_i, d_i = inp
            x_i = d_i - c_i * x_next
            return x_i, x_i

        _, xs = jax.lax.scan(bwd, jnp.zeros_like(di[0]), (cs, ds), reverse=True)
        return xs

    # Support arbitrary leading batch dims by flattening them.
    if rhs.ndim == 1:
        return _solve(lower, diag, upper, rhs)
    batch_shape = rhs.shape[:-1]
    nh = rhs.shape[-1]
    flat = lambda a: a.reshape((-1, nh)).T  # (nh, B)
    x = _solve(flat(lower), flat(diag), flat(upper), flat(rhs))
    return x.T.reshape(batch_shape + (nh,))


def tridiag_solve_pcr(band, rhs):
    """Parallel cyclic reduction for tridiagonal systems.

    O(log n) fully-vectorized steps — each reduction is elementwise over the
    whole grid (VPU-friendly), unlike the O(n) sequential Thomas scan. The
    TPU-preferred path; numerically sound for the diagonally-dominant BDF
    systems this framework produces.

    band[..., 0, :]=lower, band[..., 1, :]=diag, band[..., 2, :]=upper;
    batch axes broadcast.
    """
    a = band[..., 0, :]
    b = band[..., 1, :]
    c = band[..., 2, :]
    d = rhs

    n = rhs.shape[-1]
    steps = max(1, int(np.ceil(np.log2(n))))

    def shift(v, s, fill):
        """v[..., i-s] with ``fill`` outside the range (s may be negative)."""
        if s > 0:
            pad = [(0, 0)] * (v.ndim - 1) + [(s, 0)]
            return jnp.pad(v, pad, constant_values=fill)[..., :n]
        pad = [(0, 0)] * (v.ndim - 1) + [(0, -s)]
        return jnp.pad(v, pad, constant_values=fill)[..., -n:]

    for k in range(steps):
        s = 1 << k
        # Out-of-range neighbors behave as identity rows (b=1, a=c=d=0).
        b_m = shift(b, s, 1.0)
        b_p = shift(b, -s, 1.0)
        a_m = shift(a, s, 0.0)
        c_p = shift(c, -s, 0.0)
        c_m = shift(c, s, 0.0)
        a_p = shift(a, -s, 0.0)
        d_m = shift(d, s, 0.0)
        d_p = shift(d, -s, 0.0)

        alpha = -a / b_m
        gamma = -c / b_p

        a = alpha * a_m
        c = gamma * c_p
        b = b + alpha * c_m + gamma * a_p
        d = d + alpha * d_m + gamma * d_p

    return d / b


def solve_banded(band, rhs, p, method=None):
    """Direct solve with half-bandwidth p banded matrix.

    Tridiagonal systems (the physics path) use parallel cyclic reduction
    on every backend: its log-depth vectorized steps beat the sequential
    Thomas ``lax.scan`` not only on TPU but also on XLA:CPU, where the
    2·nx-iteration scan is loop-overhead-bound (measured at nx=1000,
    f64, one core: 29.3 s vs 0.63 s for a full 1500-step piston FOM
    trajectory — 46×; trajectories agree to 4e-12 rel-L2). Thomas stays
    available as ``method="thomas"``. Higher bandwidths densify
    (test-layer sizes only).
    """
    if p == 1:
        if method is None:
            method = "pcr"
        if method == "pcr":
            return tridiag_solve_pcr(band, rhs)
        return tridiag_solve(band, rhs)
    dense = band_to_dense(band, p)
    return jnp.linalg.solve(dense, rhs)


def solve_dense_batch(mats, rhs):
    """Batched dense solve for the reduced N×N online systems.

    Replaces scipy GMRES on the reduced system (reference: rom/rom.py:414-425,
    :492): at N ≲ 50 a batched direct solve beats any iterative scheme.
    mats: (..., N, N), rhs: (..., N).
    """
    return gauss_solve(mats, rhs)


def gauss_solve(A, b, pivot=True):
    """Batched dense solve via unrolled Gauss-Jordan.

    ``jnp.linalg.solve`` lowers LU through ``lax.linalg`` loops whose XLA
    compilation inside a ``lax.scan`` body explodes on TPU (observed:
    minutes for a 15×15 solve in a 300-step scan). For the reduced systems
    here (N ≲ 64, statically known) an unrolled elimination is a few
    hundred elementwise/VPU ops.

    pivot=False drops the partial-pivoting argmax/swap — legitimate for the
    two matrix families the online scan solves: the reduced BDF system
    bdf·M_N + dt·K_N (M_N = VᵀMV is SPD and dominates) and PᵀU from greedy
    DEIM selection (every leading principal minor is nonsingular by
    construction of the greedy recursion, so elimination without pivoting
    exists; reference solves the same systems with unpivoted contexts).

    A: (..., N, N), b: (..., N) -> x: (..., N).
    """
    N = A.shape[-1]
    M = jnp.concatenate([A, b[..., :, None]], axis=-1)  # (..., N, N+1)
    row_ids = jnp.arange(N)

    for k in range(N):
        is_k = (row_ids == k)[:, None]

        if pivot:
            col = jnp.abs(M[..., :, k])
            col = jnp.where(row_ids >= k, col, -jnp.inf)
            piv = jnp.argmax(col, axis=-1)  # (...,)

            # Swap rows k and piv — branch-free AND gather-free: the pivot
            # row is extracted by a one-hot contraction (dynamic gathers in
            # scan bodies are TPU compile poison, see
            # ops.assembly._gather_terms).
            onehot_p = (row_ids == piv[..., None]).astype(M.dtype)
            row_p = jnp.einsum("...r,...rc->...c", onehot_p, M)[..., None, :]
            row_k = M[..., k : k + 1, :]
            is_p = onehot_p[..., :, None].astype(bool)
            M = jnp.where(is_k, row_p, jnp.where(is_p, row_k, M))

        # Normalize the pivot row, then eliminate column k from every other
        # row (Gauss-Jordan). Normalizing as we go leaves the left block
        # equal to the identity, so the solution is the last column — no
        # ``jnp.diagonal`` at the end (diagonal extraction inside a scan
        # body is another TPU compile pathology: observed 90s+ vs ~1s).
        pivot_row = M[..., k : k + 1, :]
        pivot_val = pivot_row[..., 0:1, k : k + 1]
        pivot_row = pivot_row / pivot_val
        factor = M[..., :, k : k + 1]
        M = jnp.where(is_k, pivot_row, M - factor * pivot_row)

    return M[..., :, N]


def gauss_solve_lanes(A, b):
    """Batched dense solve with the μ-batch in the LAST (lane) axis.

    Layout is the whole point: inside ``lax.scan`` bodies this TPU toolchain
    compiles batch-first rank-3 tensors (B, N, N) pathologically (measured:
    >120 s for plain arithmetic) but batch-last (N, N, B) in ~1 s — every
    elimination op is then a (B,)-lane vector op (see docs/tpu_notes.md).
    No pivoting: see :func:`gauss_solve` for why the online systems admit it.

    A: (N, N) shared or (N, N, B); b: (N, B) -> x: (N, B).
    """
    N = A.shape[0]
    if A.ndim == 2:
        A = jnp.broadcast_to(A[:, :, None], (N, N, b.shape[-1])).astype(b.dtype)
    M = jnp.concatenate([A, b[:, None, :]], axis=1)  # (N, N+1, B)
    row_ids = jnp.arange(N)

    for k in range(N):
        pivot_row = M[k] / M[k, k][None, :]  # (N+1, B)
        factor = M[:, k][:, None, :]  # (N, 1, B)
        eliminated = M - factor * pivot_row[None, :, :]
        is_k = (row_ids == k)[:, None, None]
        M = jnp.where(is_k, pivot_row[None], eliminated)

    return M[:, N, :]  # (N, B)


def solve_small(A, b):
    """Shape-dispatching small dense solve for DEIM θ-systems: b (N,) →
    unrolled Gauss-Jordan; b (N, B) lanes → batch-last elimination."""
    A = jnp.asarray(A)
    if b.ndim == 1:
        return gauss_solve(A, b)
    return gauss_solve_lanes(A, b)
