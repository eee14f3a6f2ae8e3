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


def _gauss_solve_matrix(A, B):
    """Batched unrolled Gauss-Jordan with a MATRIX right-hand side.

    A: (..., N, N), B: (..., N, K) -> X: (..., N, K). Same unpivoted
    elimination as :func:`gauss_solve` (the block-cyclic-reduction pivot
    blocks are diagonally dominant by the same BDF argument), augmented
    with K columns instead of one.
    """
    N = A.shape[-1]
    M = jnp.concatenate([A, B], axis=-1)  # (..., N, N+K)
    row_ids = jnp.arange(N)

    for k in range(N):
        is_k = (row_ids == k)[:, None]
        pivot_row = M[..., k : k + 1, :]
        pivot_val = pivot_row[..., 0:1, k : k + 1]
        pivot_row = pivot_row / pivot_val
        factor = M[..., :, k : k + 1]
        M = jnp.where(is_k, pivot_row, M - factor * pivot_row)

    return M[..., :, N:]


def block_tridiag_from_band(band, p):
    """View a half-bandwidth-p banded matrix as block-tridiagonal.

    Grouping dofs into blocks of size p makes any coupling within ±p
    dofs adjacent-block coupling, so the banded system becomes block
    tridiagonal with p×p blocks — the structure block cyclic reduction
    needs. Returns (A, B, C, m, pad): sub/diag/super block stacks of
    shape (m, p, p) with the matrix padded by identity rows to m·p dofs.

    Built from p² static strided slices per block stack — no gathers, so
    the construction is safe inside ``lax.scan`` bodies on TPU
    (docs/tpu_notes.md gather hazard).
    """
    nh = band.shape[-1]
    m = -(-nh // p)
    pad = m * p - nh
    if pad:
        ext = jnp.zeros(band.shape[:-1] + (pad,), band.dtype)
        band = jnp.concatenate([band, ext], axis=-1)
        # Identity rows keep the padded system nonsingular.
        band = band.at[..., p, nh:].set(1.0)

    def blocks(j_of):
        cols = []
        for a in range(p):
            row = []
            for b in range(p):
                j = j_of(a, b)
                if 0 <= j <= 2 * p:
                    row.append(band[..., j, a::p])
                else:
                    row.append(jnp.zeros_like(band[..., 0, a::p]))
            cols.append(jnp.stack(row, axis=-1))  # (m, p)
        return jnp.stack(cols, axis=-2)  # (m, p, p)

    B = blocks(lambda a, b: p + b - a)
    A = blocks(lambda a, b: b - a)            # offset −p block
    C = blocks(lambda a, b: 2 * p + b - a)    # offset +p block
    return A, B, C, m, pad


def block_tridiag_solve_pcr(A, B, C, D):
    """Block parallel cyclic reduction: solve the block-tridiagonal
    system A_i X_{i-1} + B_i X_i + C_i X_{i+1} = D_i.

    log2(m) fully-batched steps; every op is an (m, p, p) matmul or the
    unrolled p×p block solve — MXU/VPU-friendly, no sequential recursion
    (the block analog of :func:`tridiag_solve_pcr`). Unpivoted block
    pivots: sound for the diagonally-dominant FEM/BDF systems this
    framework produces (see :func:`gauss_solve`).

    A, B, C: (m, p, p); D: (m, p) -> X: (m, p).
    """
    m = B.shape[0]
    p = B.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(p, dtype=B.dtype), (m, p, p))
    D = D[..., None]  # (m, p, 1)

    def shifted(v, s, identity=False):
        """v[i-s]; out-of-range neighbors behave as identity rows
        (B=I, A=C=D=0), exactly like the scalar PCR's fill values."""
        if s > 0:
            body = v[: m - s]
            head = eye[:s] if identity else jnp.zeros_like(v[:s])
            return jnp.concatenate([head, body], axis=0)
        body = v[-s:]
        tail = eye[:(-s)] if identity else jnp.zeros_like(v[: (-s)])
        return jnp.concatenate([body, tail], axis=0)

    steps = max(1, int(np.ceil(np.log2(m)))) if m > 1 else 0
    for k in range(steps):
        s = 1 << k
        B_m = shifted(B, s, identity=True)
        B_p = shifted(B, -s, identity=True)
        A_m = shifted(A, s)
        C_p = shifted(C, -s)
        C_m = shifted(C, s)
        A_p = shifted(A, -s)
        D_m = shifted(D, s)
        D_p = shifted(D, -s)

        alpha = -_gauss_solve_matrix(
            jnp.swapaxes(B_m, -1, -2), jnp.swapaxes(A, -1, -2)
        )
        alpha = jnp.swapaxes(alpha, -1, -2)      # -A @ B_m^{-1}
        gamma = -_gauss_solve_matrix(
            jnp.swapaxes(B_p, -1, -2), jnp.swapaxes(C, -1, -2)
        )
        gamma = jnp.swapaxes(gamma, -1, -2)      # -C @ B_p^{-1}

        A = alpha @ A_m
        C = gamma @ C_p
        B = B + alpha @ C_m + gamma @ A_p
        D = D + alpha @ D_m + gamma @ D_p

    return _gauss_solve_matrix(B, D)[..., 0]


def solve_banded_block_pcr(band, rhs, p):
    """Banded direct solve via block cyclic reduction (p ≤ 5).

    The degree-p physics path on TPU: log-depth batched block algebra
    instead of the dense O(nh³) fallback — heat/Burgers at P2–P5 stay
    scan-compatible at production nh. Batch axes of ``rhs`` broadcast
    like :func:`tridiag_solve` (band (..., 2p+1, nh), rhs (..., nh)).
    """
    if rhs.ndim > 1:
        # Flatten leading batch axes through vmap for layout sanity.
        batch_shape = rhs.shape[:-1]
        nh = rhs.shape[-1]
        band_b = jnp.broadcast_to(band, batch_shape + band.shape[-2:])
        flat_band = band_b.reshape((-1,) + band.shape[-2:])
        flat_rhs = rhs.reshape((-1, nh))
        out = jax.vmap(lambda bd, r: solve_banded_block_pcr(bd, r, p))(
            flat_band, flat_rhs
        )
        return out.reshape(batch_shape + (nh,))

    nh = rhs.shape[-1]
    A, B, C, m, pad = block_tridiag_from_band(band, p)
    if pad:
        rhs = jnp.concatenate([rhs, jnp.zeros((pad,), rhs.dtype)])
    D = rhs.reshape(m, p)
    X = block_tridiag_solve_pcr(A, B, C, D)
    return X.reshape(m * p)[:nh]


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
    if p <= 5 and method != "dense":
        # Degree 2-5 physics: block cyclic reduction keeps the solve
        # banded/batched (log-depth p×p block algebra) instead of
        # densifying to O(nh³).
        return solve_banded_block_pcr(band, rhs, p)
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
