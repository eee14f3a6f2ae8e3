"""Jit-friendly weak-form assembly on banded storage.

Replaces ``fenics.assemble`` / ``fenics.assemble_local`` + ``bc.apply``
(reference: fom/base.py:500-599). Every operator in the framework is

    A_ij = sum_e  ∫_e  c(x, t, μ) · u^(a) · v^(b) dx

with scalar coefficient field ``c`` (possibly built from a FE function, e.g.
the trilinear term) and derivative orders a (trial) and b (test) in {0, 1}.
On a uniform mesh scaled by the ALE factor ``s`` (physical width
h = s·h0), the element integral pulls back to the reference element:

    local[e, i, j] = h^(1-a-b) · Σ_q w_q · c(x_e + h·ξ_q) · P_j^(a)(ξ_q) · P_i^(b)(ξ_q)

— one einsum over (elements × quadrature), which XLA maps onto the MXU.
Banded storage: band[d, r] = A[r, r + d - p], d ∈ [0, 2p].
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import asarray as _asarray


# ----------------------------------------------------------------------
# Local element integration
# ----------------------------------------------------------------------
def _local_bilinear(c_eq, tables, a, b, h_phys):
    """local[e, i, j] with i = test (row), j = trial (col).

    ``c_eq`` is (ne, Q) or batch-last (ne, Q, B) — the μ-batched online path
    keeps the batch in the lane axis (docs/tpu_notes.md); ``h_phys`` is a
    scalar or (B,)."""
    Dtrial = _asarray(tables.basis_table(a))
    Dtest = _asarray(tables.basis_table(b))
    w = _asarray(tables.quad_weights)
    if c_eq.ndim == 3:
        local = jnp.einsum("eqB,q,qj,qi->eijB", c_eq, w, Dtrial, Dtest)
    else:
        local = jnp.einsum("eq,q,qj,qi->eij", c_eq, w, Dtrial, Dtest)
    return local * h_phys ** (1 - a - b)


def _local_linear(c_eq, tables, b, h_phys):
    """local[e, i] with i = test (row); c_eq (ne, Q) or (ne, Q, B)."""
    Dtest = _asarray(tables.basis_table(b))
    w = _asarray(tables.quad_weights)
    if c_eq.ndim == 3:
        local = jnp.einsum("eqB,q,qi->eiB", c_eq, w, Dtest)
    else:
        local = jnp.einsum("eq,q,qi->ei", c_eq, w, Dtest)
    return local * h_phys ** (1 - b)


# ----------------------------------------------------------------------
# Global assembly (banded)
# ----------------------------------------------------------------------
def scatter_band(local, mesh):
    """Scatter element matrices into the banded global matrix.

    Global row of local index i in element e is e·p + i — a strided slice,
    so the accumulation lowers to slice updates rather than scatters (TPU
    scatters in scan bodies are compile poison)."""
    p = mesh.degree
    ne = mesh.ne
    band = jnp.zeros((2 * p + 1, mesh.nh), dtype=local.dtype)
    for i in range(p + 1):
        for j in range(p + 1):
            sl = slice(i, i + p * (ne - 1) + 1, p) if p > 0 else slice(i, i + ne)
            band = band.at[j - i + p, sl].add(local[:, i, j])
    return band


def scatter_vector(local, mesh):
    """Scatter element vectors into the global vector (strided slices)."""
    p = mesh.degree
    ne = mesh.ne
    vec = jnp.zeros((mesh.nh,), dtype=local.dtype)
    for i in range(p + 1):
        sl = slice(i, i + p * (ne - 1) + 1, p) if p > 0 else slice(i, i + ne)
        vec = vec.at[sl].add(local[:, i])
    return vec


def assemble_bilinear_band(mesh, c_eq, a, b, h_phys):
    """Assemble a bilinear form globally as a banded matrix.

    Parameters
    ----------
    mesh : Mesh1D
    c_eq : (ne, Q) coefficient values at *physical* quadrature points
    a, b : int derivative orders (trial, test)
    h_phys : scalar physical cell width (traced)
    """
    local = _local_bilinear(c_eq, mesh.tables, a, b, h_phys)
    return scatter_band(local, mesh)


def assemble_linear_vector(mesh, c_eq, b, h_phys):
    """Assemble a linear form globally as a vector."""
    local = _local_linear(c_eq, mesh.tables, b, h_phys)
    return scatter_vector(local, mesh)


# ----------------------------------------------------------------------
# Gathered assembly on DEIM entry sets
# ----------------------------------------------------------------------
def assemble_bilinear_entries(mesh, entry_map, c_eq_needed, a, b, h_phys,
                              apply_dirichlet=True):
    """Integrate a bilinear form at selected matrix entries only.

    ``c_eq_needed`` holds coefficient values at quadrature points of the
    *needed* elements (entry_map.elements) — the reduced-mesh escape hatch
    of DEIM, without any Python↔C++ crossings (reference analog:
    fom/base.py:523-599). Pass ``apply_dirichlet=False`` when summing
    multiple terms of one operator; apply the override once at the end with
    :func:`apply_entry_dirichlet`.
    """
    values = _gather_terms(
        _local_bilinear(c_eq_needed, mesh.tables, a, b, h_phys),
        entry_map,
        is_vector=False,
    )
    if apply_dirichlet:
        values = apply_entry_dirichlet(values, entry_map)
    return values


def assemble_linear_entries(mesh, entry_map, c_eq_needed, b, h_phys,
                            apply_dirichlet=True):
    """Integrate a linear form at selected dofs only."""
    values = _gather_terms(
        _local_linear(c_eq_needed, mesh.tables, b, h_phys),
        entry_map,
        is_vector=True,
    )
    if apply_dirichlet:
        values = apply_entry_dirichlet(values, entry_map)
    return values


def apply_entry_dirichlet(values, entry_map):
    """Override Dirichlet-convention entries of a gathered value vector;
    ``values`` may carry trailing (lane) batch axes."""
    trailing = (1,) * (values.ndim - 1)
    mask = jnp.asarray(entry_map.dirichlet_mask).reshape((-1,) + trailing)
    diri = jnp.asarray(entry_map.dirichlet_values, dtype=values.dtype)
    diri = diri.reshape((-1,) + trailing)
    return jnp.where(mask, diri, values)


def _gather_terms(local, entry_map, is_vector):
    """Accumulate element-local contributions into entry values.

    Implemented as one static 0/1 contraction entries = W · vec(local):
    gather/scatter ops inside ``lax.scan`` bodies trigger pathological TPU
    compile times (observed: minutes for a 20-step scan containing one
    segment_sum), while a tiny dense matmul compiles instantly and rides
    the MXU. W folds both the (element, i, j) selection and the per-entry
    accumulation; it is cached on the entry map.
    """
    n_entries = entry_map.n_entries
    batched = local.ndim == (3 if is_vector else 4)
    if len(entry_map.term_entry) == 0:
        shape = (n_entries, local.shape[-1]) if batched else (n_entries,)
        return jnp.zeros(shape, dtype=local.dtype)
    local_shape = local.shape[:-1] if batched else local.shape
    W = _entry_accumulation_matrix(entry_map, local_shape, is_vector)
    flat = local.reshape((-1, local.shape[-1])) if batched else local.reshape(-1)
    return jnp.asarray(W, dtype=local.dtype) @ flat


def _entry_accumulation_matrix(entry_map, local_shape, is_vector):
    """Static (n_entries, prod(local_shape)) accumulation matrix."""
    key = (local_shape, is_vector)
    cache = getattr(entry_map, "_accumulation_matrices", None)
    if cache is None:
        cache = {}
        object.__setattr__(entry_map, "_accumulation_matrices", cache)
    W = cache.get(key)
    if W is None:
        if is_vector:
            _, nb = local_shape
            flat = entry_map.term_elem_pos * nb + entry_map.term_i
        else:
            _, nb, _ = local_shape
            flat = (
                entry_map.term_elem_pos * nb * nb
                + entry_map.term_i * nb
                + entry_map.term_j
            )
        W = np.zeros((entry_map.n_entries, int(np.prod(local_shape))))
        np.add.at(W, (entry_map.term_entry, flat), 1.0)
        cache[key] = W
    return W


# ----------------------------------------------------------------------
# Dirichlet conditions (row elimination; columns untouched)
# ----------------------------------------------------------------------
def apply_dirichlet_band(band, dirichlet_dofs, p, entry=1.0):
    """bc.apply for matrices: zero rows, unit diagonal
    (reference: fom/base.py:50-51, assemble_operator:500-521)."""
    for r in dirichlet_dofs:
        band = band.at[:, r].set(0.0).at[p, r].set(entry)
    return band


def apply_dirichlet_vector(vec, dirichlet_dofs, value=0.0):
    """bc.apply for vectors: pin entries to the Dirichlet value."""
    for r in dirichlet_dofs:
        vec = vec.at[r].set(value)
    return vec


# ----------------------------------------------------------------------
# Banded-matrix algebra
# ----------------------------------------------------------------------
def band_matvec(band, v, p):
    """y = A v with banded A. (2p+1) shifted elementwise multiplies."""
    nh = v.shape[-1]
    vpad = jnp.pad(v, (p, p))
    out = jnp.zeros_like(v)
    for d in range(2 * p + 1):
        out = out + band[d] * jax.lax.dynamic_slice_in_dim(vpad, d, nh)
    return out


def band_matmat(band, V, p):
    """Y = A V with banded A and dense V (nh, k). Stays O(p·nh·k)."""
    nh, k = V.shape
    Vpad = jnp.pad(V, ((p, p), (0, 0)))
    out = jnp.zeros_like(V)
    for d in range(2 * p + 1):
        out = out + band[d][:, None] * jax.lax.dynamic_slice_in_dim(Vpad, d, nh, axis=0)
    return out


def band_to_dense(band, p):
    """Densify a banded matrix (small problems / debugging / p>1 solves)."""
    nh = band.shape[-1]
    dense = jnp.zeros((nh, nh), dtype=band.dtype)
    rows = jnp.arange(nh)
    for d in range(2 * p + 1):
        cols = rows + d - p
        valid = (cols >= 0) & (cols < nh)
        dense = dense.at[rows, jnp.clip(cols, 0, nh - 1)].add(
            jnp.where(valid, band[d], 0.0)
        )
    return dense


def band_gather_nnz(band, rows, cols, p):
    """Gather the structural-nonzero vector A[rows, cols] from banded storage.

    (rows, cols) must lie inside the band; this is the banded analog of
    reading ``csr.data`` (reference: deim/mdeim.py:194-210).
    """
    d = jnp.asarray(cols) - jnp.asarray(rows) + p
    return band[d, jnp.asarray(rows)]


def band_nonzero_entries(band, mesh, tolerance=None):
    """Rows/cols/values of the *stored nonzeros* of a banded operator.

    Mimics ``scipy.sparse.find`` on the PETSc CSR (reference:
    deim/mdeim.py:126-151): structural positions whose value is exactly zero
    (e.g. the off-diagonals of an eliminated Dirichlet row) are dropped.
    With ``tolerance``, values within it of zero are zeroed first — the
    reference's ``eliminate_zeros`` (utils.py:152-168).

    Host-side helper (returns numpy); used to fix operator topologies once.
    """
    rows, cols = mesh.band_pattern
    values = np.asarray(band_gather_nnz(jnp.asarray(band), rows, cols, mesh.degree))
    if tolerance is not None:
        close = np.isclose(values, 0.0, rtol=tolerance, atol=tolerance)
        values = np.where(close, 0.0, values)
    keep = values != 0.0
    return rows[keep], cols[keep], values[keep]


def nnz_to_band(values, rows, cols, p, nh):
    """Scatter a nonzero vector back into banded storage."""
    band = jnp.zeros((2 * p + 1, nh), dtype=values.dtype)
    d = jnp.asarray(cols) - jnp.asarray(rows) + p
    return band.at[d, jnp.asarray(rows)].set(values)


# ----------------------------------------------------------------------
# Function-space operations
# ----------------------------------------------------------------------
def interpolate_dofs(fn, mesh, scale=1.0, **kwargs):
    """Interpolate a coefficient callable onto the (scaled) dof grid.

    Analog of ``fenics.interpolate`` (reference: fom/base.py:841-856): for
    Lagrange elements interpolation is pointwise evaluation at dof
    coordinates; mesh motion is the ``scale`` pull-back.
    """
    x = _asarray(mesh.x_dofs) * scale
    return fn(x, **kwargs)


def eval_function_at(u, x_eval, mesh, scale=1.0):
    """Evaluate the FE function with dof values ``u`` at physical points.

    Vectorized point evaluation: locate the owning cell, map to reference
    coordinates, evaluate the Lagrange polynomials via their monomial
    coefficients.
    """
    p = mesh.degree
    h = mesh.h0 * scale
    x_eval = jnp.atleast_1d(jnp.asarray(x_eval))
    e = jnp.clip(jnp.floor(x_eval / h).astype(jnp.int32), 0, mesh.ne - 1)
    xi = x_eval / h - e
    coeffs = _asarray(mesh.tables.coeffs)  # (p+1, p+1)
    # Static integer exponents: an array exponent lowers to exp(y·log x),
    # which returns NaN at xi=0 with exponent 0 (eval points landing
    # exactly on a node); integer_pow is exact there.
    powers = jnp.stack([xi**i for i in range(p + 1)], axis=1)  # (m, p+1)
    basis = powers @ coeffs.T  # (m, p+1) values P_i(xi)
    dof0 = e * p
    local_dofs = dof0[:, None] + jnp.arange(p + 1)[None, :]
    return jnp.sum(u[local_dofs] * basis, axis=1)


def norm_L2(u, mesh, h_phys=None):
    """∫ u_h² dx over the (scaled) mesh, FE-exact quadrature.

    Matches ``fenics.errornorm(..., norm_type='L2', degree_rise=0)`` applied
    to the dof-wise difference (reference: fom/base.py:878-915).
    """
    if h_phys is None:
        h_phys = mesh.h0
    w = _asarray(mesh.tables.quad_weights)
    u_eq = _function_at_quad(u, mesh)
    return jnp.sqrt(h_phys * jnp.sum(w[None, :] * u_eq**2))


def norm_H1(u, mesh, h_phys=None):
    """Full H1 norm sqrt(∫ u² + ∫ (u')²)."""
    if h_phys is None:
        h_phys = mesh.h0
    w = _asarray(mesh.tables.quad_weights)
    u_eq = _function_at_quad(u, mesh, derivative=0)
    du_eq = _function_at_quad(u, mesh, derivative=1) / h_phys
    val = h_phys * jnp.sum(w[None, :] * (u_eq**2 + du_eq**2))
    return jnp.sqrt(val)


def _function_at_quad(u, mesh, derivative=0):
    """FE function (or derivative, reference coords) at quadrature points."""
    p = mesh.degree
    table = _asarray(mesh.tables.basis_table(derivative))  # (Q, p+1)
    u_loc = _gather_cell_dofs(u, mesh)  # (ne, p+1)
    return jnp.einsum("ei,qi->eq", u_loc, table)


def _gather_cell_dofs(u, mesh):
    """(ne, p+1) element-local dof values via strided slices (gather-free)."""
    p = mesh.degree
    ne = mesh.ne
    cols = [
        jax.lax.slice_in_dim(u, i, i + p * (ne - 1) + 1, stride=p)
        for i in range(p + 1)
    ]
    return jnp.stack(cols, axis=1)
