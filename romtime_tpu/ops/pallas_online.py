"""Fused online ROM sweep as a single pallas TPU kernel.

The lane-batched online scan (rom/rom.py::_online_scan_batch, "matrices"
path) runs ~12 XLA ops per BDF step through HBM; on hardware its wall is
per-op dispatch + HBM round-trips of small intermediates. This kernel fuses
the whole μ-sweep time loop: the reduced state stays in VMEM, the
precomputed reduced-operator time tables stream from HBM with
double-buffered, chunked DMA, and each step does

    u*   = 2·uN − uN₋₁                       (BDF-2 extrapolation)
    N_N  = reshape(T0 @ u*) · (dt·b0)        (trilinear fast path, MXU)
    K_N  = bdf·M_N + KLIN_N + N_N
    b_N  = Σ_j M_N[:, j]·combo[j] + f_N      (combo = 2uN − ½uN₋₁)
    uN   = gauss_jordan(K_N, b_N)            (unrolled, pivot-free, lanes)
    out  = V_ends @ uN + g(t)                (probe QoIs)

entirely on-chip (reference online loop semantics: rom/rom.py:430-555 of
KikeM/romtime, hyper-reduced path).

Layout rules (Mosaic): every DMA slice must be tile-aligned — the reduced
dimension N is padded to NP=16 sublanes and the probe row count to 8; the
μ-batch lives in the minor (lane) axis in blocks of 128. Padding is
numerically inert: padded rows/cols of M/N/f/b are zero and the padded
diagonal of KLIN is 1, so the padded block of K is the identity and the
padded entries of uN stay exactly 0.
"""

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compensated import dd_add_small, dd_matvec, two_sum

# Mosaic lowers convert_element_type by recursing into jaxpr_subcomp once
# per convert; under jax_enable_x64 the unrolled kernel body carries a few
# hundred f64→f32 canonicalization converts and the default 1000-frame
# Python stack overflows during lowering.
if sys.getrecursionlimit() < 20000:
    sys.setrecursionlimit(20000)

NP = 16       # default padded reduced dimension (one sublane tile)
PROBE_P = 8   # padded probe rows
BLANE = 128   # lane block


def pad_dim(n):
    """Smallest f32-sublane-tile multiple (8) ≥ 16 that holds n. Every
    kernel shape keyed on NP (DMA slices, LU blocks of 8, probe rows) is
    8-aligned, so 8-granular padding is legal — and at N=44→48 vs
    N=40→40 the whole serving step scales with NP²–NP³."""
    return max(16, -(-n // 8) * 8)


def _chunk_for(nt, n_pad=NP):
    """Largest DMA chunk (timesteps per transfer) that divides nt and fits
    the scratch budget.

    Scratch cost is 2 slots × chunk × (2·n_pad² + n_pad + PROBE_P) × BLANE
    × 4 bytes (≈ chunk × 0.55 MB at n_pad=16). The sweep is DMA-*latency*
    bound (measured: chunk 10 → ~9600 waits → ~196 ms at nt=1500, B=2048),
    so prefer the largest chunk within ~44 MB of scratch; per-step compute
    is unrolled chunk times, so Mosaic compile time also grows with chunk
    — 75 compiles in ~½ min at n_pad=16."""
    per_step = 2 * (2 * n_pad * n_pad + n_pad + PROBE_P) * BLANE * 4
    cap = min(75, max(1, (44 * 1024 * 1024) // per_step))
    return _chunk_capped(nt, min(cap, _compile_cap(n_pad)))


def _compile_cap(n_real):
    """Mosaic compile time grows with the unrolled body: chunk × n_real
    Gauss-Jordan iterations. 75×15 ≈ 1150 compiles in ~30 s; NP=64 at
    chunk 75 (4500 iterations) did not finish in 18 min."""
    return max(1, 1152 // max(n_real, 1))


# Above this size the v2 kernels run the Gauss-Jordan pivot loop as an
# in-kernel fori_loop (one compiled body) instead of a full unroll.
GJ_FORI_MIN = 20

# Force the theta-v2 STEP loop to unroll even for large N (static scratch
# indexing + static probe stores; costs Mosaic compile time ~ chunk).
STEP_UNROLL_V2 = False

def _compile_cap_v2(n_real):
    """v2 chunk cap: the fori-loop Gauss-Jordan removes the n_real factor
    from the unrolled body, so only the per-step assembly ops count."""
    if n_real <= GJ_FORI_MIN:
        return _compile_cap(n_real)
    return 60


def _chunk_capped(nt, cap):
    for c in range(min(cap, nt), 0, -1):
        if nt % c == 0:
            return c
    return 1


def pad_reduced_tables(MN_tab, KLIN_tab, fN_tab, N, n_pad=None):
    """(nt, N², B)/(nt, N, B) tables → padded (nt, NP, NP, B)/(nt, NP, B).

    The padded diagonal of KLIN is set to 1 so the padded block of the
    per-step system matrix is the identity (see module docstring).
    """
    NP = n_pad or pad_dim(N)
    nt, _, B = MN_tab.shape
    dtype = MN_tab.dtype

    def pad_mat(tab, diag):
        tab = tab.reshape(nt, N, N, B)
        out = jnp.zeros((nt, NP, NP, B), dtype)
        out = out.at[:, :N, :N, :].set(tab)
        if diag:
            pad_eye = jnp.zeros((NP, NP), dtype).at[
                jnp.arange(N, NP), jnp.arange(N, NP)
            ].set(1.0)
            out = out + pad_eye[None, :, :, None]
        return out

    MN_p = pad_mat(MN_tab, diag=False)
    KL_p = pad_mat(KLIN_tab, diag=True)
    fN_p = jnp.zeros((nt, NP, B), dtype).at[:, :N, :].set(fN_tab)
    return MN_p, KL_p, fN_p


def _bdf_step(MN, KL, fN, g, uN, uN1, step, T0, VE, b0, dt_c, bdf2,
              with_trilinear, n_real, NP):
    """One BDF step on a (NP, NP, BLANE) lane block: assemble K_N/b_N,
    pivot-free Gauss-Jordan over the N real rows (the padded block of K_N
    is the identity so it never mixes in; pivot rows are restored with
    static one-hot selects — a .at[k] update would lower to an unsupported
    in-kernel scatter), probes via the MXU. Shared by the matrices- and
    θ-streaming kernels. All constants must be strong-typed f32/i32 (see
    the x64 notes above)."""
    i32 = jnp.int32
    one = jnp.float32(1.0)
    two = jnp.float32(2.0)
    half = jnp.float32(0.5)
    three_half = jnp.float32(1.5)

    if bdf2:
        bdf = jnp.where(step == i32(0), one, three_half)
        combo = two * uN - half * uN1
        u_star = two * uN - uN1
    else:
        bdf = one
        combo = uN
        u_star = uN

    KN = bdf * MN + KL
    if with_trilinear:
        NN = jax.lax.dot(
            T0, u_star, precision=jax.lax.Precision.HIGHEST
        ).reshape(NP, NP, BLANE)
        KN = KN + NN * (dt_c * b0)[None, None, :]

    bN = jnp.sum(MN * combo[None, :, :], axis=1) + fN

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (NP, 1), 0)
    for k in range(n_real):
        is_k = row_ids == i32(k)            # (NP, 1)
        inv = one / KN[k, k, :]
        row = KN[k] * inv[None, :]          # (NP, BLANE)
        bk = bN[k] * inv                    # (BLANE,)
        colk = KN[:, k, :]                  # (NP, BLANE)
        KN = jnp.where(is_k[:, :, None],
                       row[None, :, :],
                       KN - colk[:, None, :] * row[None, :, :])
        bN = jnp.where(is_k,
                       bk[None, :],
                       bN - colk * bk[None, :])

    probes = jax.lax.dot(
        VE, bN, precision=jax.lax.Precision.HIGHEST
    ) + g
    return bN, probes


def _sweep_kernel(MN_ref, KL_ref, fN_ref, g_ref, T0_ref, VE_ref, b0_ref,
                  probes_ref, uN_ref, *, nt, chunk, dt, bdf2,
                  with_trilinear, n_real, n_pad):
    NP = n_pad
    i = pl.program_id(0)
    n_chunks = nt // chunk

    def body(mn_s, kl_s, fn_s, g_s, sems):
        lanes = pl.ds(i * BLANE, BLANE)

        def dmas(slot, c):
            sl = pl.ds(c * chunk, chunk)
            return (
                pltpu.make_async_copy(MN_ref.at[sl, :, :, lanes],
                                      mn_s.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(KL_ref.at[sl, :, :, lanes],
                                      kl_s.at[slot], sems.at[slot, 1]),
                pltpu.make_async_copy(fN_ref.at[sl, :, lanes],
                                      fn_s.at[slot], sems.at[slot, 2]),
                pltpu.make_async_copy(g_ref.at[sl, :, lanes],
                                      g_s.at[slot], sems.at[slot, 3]),
            )

        for d in dmas(0, 0):
            d.start()

        T0 = T0_ref[:] if with_trilinear else None          # (NP·NP, NP)
        VE = VE_ref[:]                                       # (PROBE_P, NP)
        b0 = b0_ref[0, :] if with_trilinear else None        # (BLANE,)

        dt_c = jnp.float32(dt)

        def chunk_body(c, carry):
            # All index arithmetic in strong i32: python-int operands would
            # promote through converts that Mosaic cannot lower (see above).
            i32 = jnp.int32
            uN, uN1 = carry
            slot = jax.lax.rem(c, i32(2))

            @pl.when(c + i32(1) < i32(n_chunks))
            def _():
                for d in dmas(jax.lax.rem(c + i32(1), i32(2)), c + i32(1)):
                    d.start()

            for d in dmas(slot, c):
                d.wait()

            for s in range(chunk):
                step = c * i32(chunk) + i32(s)
                uN_new, probes = _bdf_step(
                    mn_s[slot, s], kl_s[slot, s], fn_s[slot, s],
                    g_s[slot, s], uN, uN1, step, T0, VE, b0, dt_c,
                    bdf2, with_trilinear, n_real, NP,
                )
                uN1 = uN
                uN = uN_new
                probes_ref[step] = probes

            return (uN, uN1)

        zeros = jnp.zeros((NP, BLANE), jnp.float32)
        # i32 bounds: under jax_enable_x64 python-int bounds make the
        # induction variable i64, and a 0-D i64→i32 convert sends Mosaic's
        # lowering into unbounded recursion.
        uN, _ = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_chunks),
                                  chunk_body, (zeros, zeros))
        uN_ref[:] = uN

    pl.run_scoped(
        body,
        mn_s=pltpu.VMEM((2, chunk, NP, NP, BLANE), jnp.float32),
        kl_s=pltpu.VMEM((2, chunk, NP, NP, BLANE), jnp.float32),
        fn_s=pltpu.VMEM((2, chunk, NP, BLANE), jnp.float32),
        g_s=pltpu.VMEM((2, chunk, PROBE_P, BLANE), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2, 4)),
    )


@partial(jax.jit, static_argnames=("dt", "bdf2", "with_trilinear",
                                   "n_real", "interpret"))
def online_sweep_pallas(MN_p, KL_p, fN_p, g_p, T0_p, VE_p, b0,
                        *, dt, bdf2=True, with_trilinear=True,
                        n_real=15, interpret=False):
    """Run the fused sweep.

    MN_p, KL_p : (nt, NP, NP, B) padded reduced-operator tables (f32)
    fN_p       : (nt, NP, B) padded rhs table, dt already applied
    g_p        : (nt, PROBE_P, B) lifting values at the probe points
    T0_p       : (NP·NP, NP) trilinear fast-path tensor (zeros-padded)
    VE_p       : (PROBE_P, NP) probe reconstruction rows
    b0         : (1, B) trilinear μ-coefficient
    dt         : python float (static)

    Returns (probes (nt, PROBE_P, B), uN_final (NP, B)).
    """
    nt, n_pad, _, B = MN_p.shape
    if B % BLANE:
        raise ValueError(f"batch ({B}) must be a multiple of {BLANE}")
    # Interpret mode (CPU tests) pays python-level cost per unrolled step:
    # keep chunks small there.
    chunk = _chunk_capped(nt, 8) if interpret else _chunk_for(nt, n_pad)

    kernel = partial(_sweep_kernel, nt=nt, chunk=chunk, dt=dt, bdf2=bdf2,
                     with_trilinear=with_trilinear, n_real=n_real,
                     n_pad=n_pad)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(B // BLANE,),
        in_specs=[hbm, hbm, hbm, hbm, vmem, vmem,
                  pl.BlockSpec((1, BLANE), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((nt, PROBE_P, BLANE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, BLANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt, PROBE_P, B), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, B), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    # Trace the kernel with x64 disabled: under jax_enable_x64 pallas
    # canonicalizes ref indices to i64, which Mosaic's memref ops reject,
    # and scalar f64→f32 converts hit an unbounded lowering recursion. All
    # kernel inputs are already f32/i32, so semantics are unchanged.
    with jax.enable_x64(False):
        return call(MN_p, KL_p, fN_p, g_p, T0_p, VE_p, b0)


def _theta_sweep_kernel(THm_ref, THk_ref, THf_ref, g_ref, Bm_ref, Bk_ref,
                        Bf_ref, T0_ref, VE_ref, b0_ref, probes_ref, uN_ref,
                        *, nt, chunk, dt, bdf2, with_trilinear, n_real,
                        n_pad):
    """θ-streaming variant: only the DEIM coefficient tables θ(μ, t) —
    (nt, k, B) with k ≈ 10–60 — stream from HBM; the reduced operators are
    reconstructed per step in VMEM as one MXU matmul against the constant
    padded basis tensors. HBM traffic per sweep drops from 2·nt·NP²·B·4
    bytes (matrices kernel) to nt·Σk·B·4 — ~15× at the headline config —
    and the design scales to NP=64 where materialized tables no longer fit
    in HBM."""
    NP = n_pad
    i = pl.program_id(0)
    n_chunks = nt // chunk

    def body(thm_s, thk_s, thf_s, g_s, sems):
        lanes = pl.ds(i * BLANE, BLANE)

        def dmas(slot, c):
            sl = pl.ds(c * chunk, chunk)
            return (
                pltpu.make_async_copy(THm_ref.at[sl, :, lanes],
                                      thm_s.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(THk_ref.at[sl, :, lanes],
                                      thk_s.at[slot], sems.at[slot, 1]),
                pltpu.make_async_copy(THf_ref.at[sl, :, lanes],
                                      thf_s.at[slot], sems.at[slot, 2]),
                pltpu.make_async_copy(g_ref.at[sl, :, lanes],
                                      g_s.at[slot], sems.at[slot, 3]),
            )

        for d in dmas(0, 0):
            d.start()

        Bm = Bm_ref[:]                                       # (NP·NP, km)
        Bk = Bk_ref[:]                                       # (NP·NP, kk)
        Bf = Bf_ref[:]                                       # (NP, kf)
        T0 = T0_ref[:] if with_trilinear else None           # (NP·NP, NP)
        VE = VE_ref[:]                                       # (PROBE_P, NP)
        b0 = b0_ref[0, :] if with_trilinear else None        # (BLANE,)
        dt_c = jnp.float32(dt)
        hi = jax.lax.Precision.HIGHEST

        def chunk_body(c, carry):
            i32 = jnp.int32
            uN, uN1 = carry
            slot = jax.lax.rem(c, i32(2))

            @pl.when(c + i32(1) < i32(n_chunks))
            def _():
                for d in dmas(jax.lax.rem(c + i32(1), i32(2)), c + i32(1)):
                    d.start()

            for d in dmas(slot, c):
                d.wait()

            for s in range(chunk):
                step = c * i32(chunk) + i32(s)
                MN = jax.lax.dot(Bm, thm_s[slot, s],
                                 precision=hi).reshape(NP, NP, BLANE)
                KL = jax.lax.dot(Bk, thk_s[slot, s],
                                 precision=hi).reshape(NP, NP, BLANE)
                fN = jax.lax.dot(Bf, thf_s[slot, s], precision=hi)
                uN_new, probes = _bdf_step(
                    MN, KL, fN, g_s[slot, s], uN, uN1, step, T0, VE, b0,
                    dt_c, bdf2, with_trilinear, n_real, NP,
                )
                uN1 = uN
                uN = uN_new
                probes_ref[step] = probes

            return (uN, uN1)

        zeros = jnp.zeros((NP, BLANE), jnp.float32)
        uN, _ = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_chunks),
                                  chunk_body, (zeros, zeros))
        uN_ref[:] = uN

    km = THm_ref.shape[1]
    kk = THk_ref.shape[1]
    kf = THf_ref.shape[1]
    pl.run_scoped(
        body,
        thm_s=pltpu.VMEM((2, chunk, km, BLANE), jnp.float32),
        thk_s=pltpu.VMEM((2, chunk, kk, BLANE), jnp.float32),
        thf_s=pltpu.VMEM((2, chunk, kf, BLANE), jnp.float32),
        g_s=pltpu.VMEM((2, chunk, PROBE_P, BLANE), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2, 4)),
    )


@partial(jax.jit, static_argnames=("dt", "bdf2", "with_trilinear",
                                   "n_real", "interpret"))
def online_sweep_theta_pallas(THm, THk, THf, g_p, Bm, Bk, Bf, T0_p, VE_p,
                              b0, *, dt, bdf2=True, with_trilinear=True,
                              n_real=15, interpret=False):
    """θ-streaming fused sweep.

    THm/THk/THf : (nt, k, B) θ coefficient tables, k 8-aligned; THk carries
                  the concatenated stiffness-side operators plus one
                  constant-1 row for the padded-diagonal identity
    g_p         : (nt, PROBE_P, B) lifting at the probe points
    Bm/Bk       : (NP·NP, k) padded basis tensors (dt folded into Bk)
    Bf          : (NP, kf) padded rhs basis (dt folded)
    T0_p        : (NP·NP, NP) trilinear fast-path tensor
    VE_p        : (PROBE_P, NP) probe rows
    b0          : (1, B) trilinear μ-coefficient

    Returns (probes (nt, PROBE_P, B), uN_final (NP, B)).
    """
    nt, _, B = THm.shape
    n_pad = VE_p.shape[1]
    if B % BLANE:
        raise ValueError(f"batch ({B}) must be a multiple of {BLANE}")
    for tab in (THm, THk, THf):
        if tab.shape[1] % 8:
            raise ValueError("θ table k dims must be 8-aligned (pad with "
                             "zero rows + zero basis columns)")
    if interpret:
        chunk = _chunk_capped(nt, 8)
    else:
        per_step = 2 * (THm.shape[1] + THk.shape[1] + THf.shape[1]
                        + PROBE_P) * BLANE * 4
        chunk = _chunk_capped(
            nt, min(75, max(1, (44 * 1024 * 1024) // per_step),
                    _compile_cap(n_real)),
        )

    kernel = partial(_theta_sweep_kernel, nt=nt, chunk=chunk, dt=dt,
                     bdf2=bdf2, with_trilinear=with_trilinear,
                     n_real=n_real, n_pad=n_pad)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(B // BLANE,),
        in_specs=[hbm, hbm, hbm, hbm, vmem, vmem, vmem, vmem, vmem,
                  pl.BlockSpec((1, BLANE), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((nt, PROBE_P, BLANE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, BLANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt, PROBE_P, B), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, B), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    with jax.enable_x64(False):
        return call(THm, THk, THf, g_p, Bm, Bk, Bf, T0_p, VE_p, b0)


# ======================================================================
# v2: residual-form compensated kernels (window-chainable)
#
# Differences from the v1 kernels above:
#   * the carry is a double-f32 state (hi, lo) for both BDF registers —
#     streamed in/out of the kernel so W window launches chain exactly;
#   * each step solves K·δ = r0 for the increment against the dd
#     predictor (residual form, see ops/compensated.py) — the f32 drift
#     of the 1500-step recursion collapses to the operator-quantization
#     floor;
#   * a static `step0` offset keeps the BDF-2 startup convention correct
#     across window boundaries (only the global step 0 uses bdf=1).
# Table formats are IDENTICAL to v1 (KL carries the identity on the
# padded diagonal, dt folded into KL/fN), so the same table builders
# feed both generations.
# ======================================================================


def _dd_predictor(uN, lo, uN1, lo1, step, bdf2):
    """Double-word BDF-2 extrapolation + history difference.

    Returns (pred_hi, pred_lo, d, bdf) with the first-step (BDF-1)
    special case folded in via where()."""
    i32 = jnp.int32
    one = jnp.float32(1.0)
    two = jnp.float32(2.0)
    three_half = jnp.float32(1.5)

    if bdf2:
        # NB: never name a local `pl` here — it would shadow the pallas
        # module alias used by the blocked solve.
        ph, pe = two_sum(two * uN, -uN1)
        plo = pe + (two * lo - lo1)
        ph, plo = two_sum(ph, plo)
        dh, de = two_sum(uN1, -uN)
        d = dh + (de + (lo1 - lo))
        first = step == i32(0)
        pred_hi = jnp.where(first, uN, ph)
        pred_lo = jnp.where(first, lo, plo)
        d = jnp.where(first, jnp.zeros_like(d), d)
        bdf = jnp.where(first, one, three_half)
    else:
        pred_hi, pred_lo = uN, lo
        d = jnp.zeros_like(uN)
        bdf = one
    return pred_hi, pred_lo, d, bdf


def _bdf_step_resid(MN, KL, fN, g, uN, lo, uN1, lo1, step, T0, VE, b0,
                    dt_c, bdf2, with_trilinear, n_real, NP,
                    kn_ref=None, r0_ref=None, t0_transposed=False,
                    skip_solve=False):
    """One residual-form BDF step on a (NP, NP, BLANE) lane block.

    KL is the dt-scaled stiffness-side sum with identity padding — it IS
    dt·S, so K = bdf·MN + KL(+trilinear) and
    r0 = MN·(u_{n-1} − u_n) + fN − (KL+tri)·u_pred. The padded block of K
    is the identity and every padded state entry stays exactly 0."""
    pred_hi, pred_lo, d, bdf = _dd_predictor(uN, lo, uN1, lo1, step, bdf2)

    dtS = KL
    if with_trilinear:
        if t0_transposed:
            # T0 stored (NP, NP·NP) so its VMEM-resident form wastes no
            # lane padding; contract the leading axis on the MXU.
            NN = jax.lax.dot_general(
                T0, pred_hi, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(NP, NP, BLANE)
        else:
            NN = jax.lax.dot(
                T0, pred_hi, precision=jax.lax.Precision.HIGHEST
            ).reshape(NP, NP, BLANE)
        dtS = dtS + NN * (dt_c * b0)[None, None, :]

    KN = bdf * MN + dtS
    r0 = (jnp.sum(MN * d[None, :, :], axis=1) + fN
          - jnp.sum(dtS * pred_hi[None, :, :], axis=1))
    delta = _lanes_solve(KN, r0, n_real, NP, skip_solve=skip_solve)

    uN_new, lo_new = dd_add_small(pred_hi, pred_lo, delta)
    probes = jax.lax.dot(
        VE, uN_new, precision=jax.lax.Precision.HIGHEST
    ) + g
    return uN_new, lo_new, probes


def _lanes_solve(KN, r0, n_real, NP, skip_solve=False):
    """Lane-batched in-register solve of KN·delta = r0 on a
    (NP, NP, BLANE) block — unrolled Gauss-Jordan for small N, blocked
    pivot-free LU above GJ_FORI_MIN."""
    i32 = jnp.int32
    one = jnp.float32(1.0)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (NP, 1), 0)
    if skip_solve:
        # Ablation probe only (perf ledger): bypass the linear solve.
        delta = r0
    elif n_real <= GJ_FORI_MIN:
        # Fully unrolled pivot loop: static row indexing, minimal runtime
        # ops. Mosaic compile cost grows with chunk × n_real — fine here.
        for k in range(n_real):
            is_k = row_ids == i32(k)
            inv = one / KN[k, k, :]
            row = KN[k] * inv[None, :]
            bk = r0[k] * inv
            colk = KN[:, k, :]
            KN = jnp.where(is_k[:, :, None],
                           row[None, :, :],
                           KN - colk[:, None, :] * row[None, :, :])
            r0 = jnp.where(is_k,
                           bk[None, :],
                           r0 - colk * bk[None, :])
        delta = r0
    else:
        # Blocked pivot-free LU with STATIC shrinking shapes. The matrix
        # stays a register value: python-level loop over NP//8 pivot
        # blocks, each inverting its 8×8 diagonal block (unrolled
        # Jordan), forming CD = C·D⁻¹, and applying one chained rank-8
        # update to the TRAILING submatrix only (Σ R² ≈ ¼ of full-Jordan
        # traversal volume at NP=48); back-substitution runs over the
        # saved (D⁻¹, U) panels. Scalar-pivot and full-Jordan variants
        # were VMEM-bandwidth-bound (measured 1.3k / 2.9k solves per
        # second at NP=48, B=2048 on v5e). No pivoting: K = bdf·M + dt·S
        # is diagonally dominant at BDF step sizes, and the padded
        # diagonal is exactly identity.
        BS = 8                        # pad_dim guarantees NP % 8 == 0
        NB = NP // BS

        r_ids = jax.lax.broadcasted_iota(jnp.int32, (BS, 1), 0)
        c_ids = jax.lax.broadcasted_iota(jnp.int32, (1, BS), 1)
        eyeB = (r_ids == c_ids).astype(jnp.float32)     # (BS, BS)

        def solve_blk_aug(D, rj):
            """Jordan on the augmented block [D | I | r]: WIDE (BS,
            2·BS+1, lane) ops — a row-list formulation lowers to ~260
            one-vreg ops per block and is op-overhead-bound on the VPU."""
            A8 = jnp.concatenate(
                [D,
                 jnp.broadcast_to(eyeB[:, :, None], D.shape),
                 rj[:, None, :]],
                axis=1,
            )                                       # (BS, 2·BS+1, BLANE)
            for i in range(BS):
                inv = one / A8[i, i]
                rowi = A8[i] * inv[None, :]
                coli = A8[:, i, :]
                is_i = r_ids == i32(i)
                A8 = jnp.where(
                    is_i[:, :, None],
                    rowi[None, :, :],
                    A8 - coli[:, None, :] * rowi[None, :, :],
                )
            return A8[:, BS:2 * BS], A8[:, 2 * BS]      # D⁻¹, y

        def matbvec(Dinv, v):
            return jnp.sum(Dinv * v[None, :, :], axis=1)

        A = KN
        r = r0
        ys = []
        panels = []
        for jb in range(NB):
            D = A[:BS, :BS]
            U = A[:BS, BS:]          # (BS, R, BLANE); R may be 0
            C = A[BS:, :BS]          # (R, BS, BLANE)
            Dinv, y = solve_blk_aug(D, r[:BS])
            panels.append((Dinv, U))
            ys.append(y)
            R = A.shape[0] - BS
            if R == 0:
                break
            # CD = C·D⁻¹ as BS wide FMAs on (R, BS, lane)
            CD = C[:, 0:1, :] * Dinv[0][None, :, :]
            for k in range(1, BS):
                CD = CD + C[:, k:k + 1, :] * Dinv[k][None, :, :]
            upd = CD[:, 0:1, :] * U[0][None, :, :]
            updr = C[:, 0, :] * y[0][None, :]
            for i in range(1, BS):
                upd = upd + CD[:, i:i + 1, :] * U[i][None, :, :]
                updr = updr + C[:, i, :] * y[i][None, :]
            A = A[BS:, BS:] - upd
            r = r[BS:] - updr

        xs = [ys[-1]]
        for jb in range(NB - 2, -1, -1):
            Dinv, U = panels[jb]
            xt = jnp.concatenate(xs, axis=0)       # (R_jb, BLANE)
            Ux = jnp.sum(U * xt[None, :, :], axis=1)
            xs.insert(0, ys[jb] - matbvec(Dinv, Ux))
        delta = jnp.concatenate(xs, axis=0)        # (NP, BLANE)

    return delta


def _lanes_solve_panels(KN, r0, NP):
    """Blocked pivot-free LU of a (NP, NP, BLANE) lane block that ALSO
    returns the factorization panels, so NEARBY systems can be solved by
    substitution + iterative refinement instead of refactorizing
    (`_panels_substitute`). Identical elimination to the `_lanes_solve`
    blocked path; per pivot block jb it saves (D⁻¹_jb, U_jb, C_jb) where
    D/U/C are the diagonal/super/sub panels of the PARTIALLY ELIMINATED
    trailing matrix at stage jb (i.e. the block-LU factors).

    Used by the paired-step serving mode: the reduced step matrix
    K(μ, t) drifts ~0.1%/serving step (within-window variation ≤4% over
    a full window, ROADMAP round-3 probe), so a one-to-two-step-stale
    factorization refines to below the f32 solve roundoff in one
    refinement pass."""
    i32 = jnp.int32
    one = jnp.float32(1.0)
    BS = 8
    NB = NP // BS

    r_ids = jax.lax.broadcasted_iota(jnp.int32, (BS, 1), 0)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (1, BS), 1)
    eyeB = (r_ids == c_ids).astype(jnp.float32)

    def solve_blk_aug(D, rj):
        A8 = jnp.concatenate(
            [D, jnp.broadcast_to(eyeB[:, :, None], D.shape),
             rj[:, None, :]], axis=1)
        for i in range(BS):
            inv = one / A8[i, i]
            rowi = A8[i] * inv[None, :]
            coli = A8[:, i, :]
            is_i = r_ids == i32(i)
            A8 = jnp.where(is_i[:, :, None], rowi[None, :, :],
                           A8 - coli[:, None, :] * rowi[None, :, :])
        return A8[:, BS:2 * BS], A8[:, 2 * BS]

    def matbvec(Dinv, v):
        return jnp.sum(Dinv * v[None, :, :], axis=1)

    A = KN
    r = r0
    ys = []
    panels = []
    for jb in range(NB):
        D = A[:BS, :BS]
        U = A[:BS, BS:]
        C = A[BS:, :BS]
        Dinv, y = solve_blk_aug(D, r[:BS])
        panels.append((Dinv, U, C))
        ys.append(y)
        R = A.shape[0] - BS
        if R == 0:
            break
        CD = C[:, 0:1, :] * Dinv[0][None, :, :]
        for k in range(1, BS):
            CD = CD + C[:, k:k + 1, :] * Dinv[k][None, :, :]
        upd = CD[:, 0:1, :] * U[0][None, :, :]
        updr = C[:, 0, :] * y[0][None, :]
        for i in range(1, BS):
            upd = upd + CD[:, i:i + 1, :] * U[i][None, :, :]
            updr = updr + C[:, i, :] * y[i][None, :]
        A = A[BS:, BS:] - upd
        r = r[BS:] - updr

    xs = [ys[-1]]
    for jb in range(NB - 2, -1, -1):
        Dinv, U, _C = panels[jb]
        xt = jnp.concatenate(xs, axis=0)
        Ux = jnp.sum(U * xt[None, :, :], axis=1)
        xs.insert(0, ys[jb] - matbvec(Dinv, Ux))
    delta = jnp.concatenate(xs, axis=0)
    return delta, panels


def _panels_substitute(panels, r, NP):
    """Solve with SAVED block-LU panels (`_lanes_solve_panels`): one
    forward sweep (block solves + subdiagonal updates) and one
    back-substitution — ≈ a matvec of VPU work, ~5× cheaper than a
    refactorization at NP=32."""
    BS = 8
    NB = NP // BS

    def matbvec(Dinv, v):
        return jnp.sum(Dinv * v[None, :, :], axis=1)

    ys = []
    for jb in range(NB):
        Dinv, _U, C = panels[jb]
        y = matbvec(Dinv, r[:BS])
        ys.append(y)
        if r.shape[0] > BS:
            updr = C[:, 0, :] * y[0][None, :]
            for i in range(1, BS):
                updr = updr + C[:, i, :] * y[i][None, :]
            r = r[BS:] - updr

    xs = [ys[-1]]
    for jb in range(NB - 2, -1, -1):
        Dinv, U, _C = panels[jb]
        xt = jnp.concatenate(xs, axis=0)
        Ux = jnp.sum(U * xt[None, :, :], axis=1)
        xs.insert(0, ys[jb] - matbvec(Dinv, Ux))
    return jnp.concatenate(xs, axis=0)


def _lanes_invert(K, NP):
    """In-register inversion of a (NP, NP, BLANE) lane-batched block:
    unrolled pivot-free Gauss-Jordan on the augmented [K | I] block.

    Runs ONCE PER WINDOW (not per step) to seed the Richardson solve —
    the reduced step matrix K = bdf·MN + dt·S(+tri) is superbly
    conditioned (measured cond ∈ [3.1, 9.3] at the headline W=30/N=40
    point) and varies ≤ 4% within a window, so K̄⁻¹ of the window-mean
    matrix preconditions every step of the window. No pivoting: same
    diagonal-dominance argument as the blocked LU below; the padded
    diagonal is exactly identity, so the padded block inverts to I."""
    i32 = jnp.int32
    one = jnp.float32(1.0)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (NP, 1), 0)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (NP, NP), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (NP, NP), 1)
           ).astype(jnp.float32)
    A = jnp.concatenate(
        [K, jnp.broadcast_to(eye[:, :, None], K.shape)], axis=1
    )                                            # (NP, 2·NP, BLANE)
    for k in range(NP):
        is_k = row_ids == i32(k)
        inv = one / A[k, k, :]
        row = A[k] * inv[None, :]
        colk = A[:, k, :]
        A = jnp.where(is_k[:, :, None],
                      row[None, :, :],
                      A - colk[:, None, :] * row[None, :, :])
    return A[:, NP:, :]


def _lanes_matvec(A, x):
    """(NP, NP, BLANE) · (NP, BLANE) lane-batched matvec on the VPU."""
    return jnp.sum(A * x[None, :, :], axis=1)


def _richardson_solve(KN, Kinv, r0, iters, delta0=None):
    """Solve KN·δ = r0 by preconditioned Richardson iteration with the
    per-window mean-matrix inverse K̄⁻¹ (see _lanes_invert). Convergence
    factor ρ = ‖I − K̄⁻¹KN‖ ≤ ~0.04 within a window (measured at the
    headline W=30/N=40 point), and the iteration warm-starts from the
    PREVIOUS step's delta (`delta0` — δ changes ~1%/step at serving dt),
    so the start residual is already ~1e-2·‖δ‖. The BDF-1 start steps
    (bdf 1.0 vs the 1.5 folded into K̄) converge at ρ ≈ 0.33 and rely on
    the extra iterations + the dissipative decay of the tiny start-up
    deltas. Cost: 2·iters matvecs ≈ 40 wide FMAs each — ~3-4× cheaper
    than the per-step blocked LU at NP=40."""
    if delta0 is None:
        delta = _lanes_matvec(Kinv, r0)
    else:
        delta = delta0 + _lanes_matvec(Kinv,
                                       r0 - _lanes_matvec(KN, delta0))
    for _ in range(iters - 1):
        resid = r0 - _lanes_matvec(KN, delta)
        delta = delta + _lanes_matvec(Kinv, resid)
    return delta


def _bdf_step_merged(tts, Bmk, BmF, BkF, Bf, g, uN, lo, uN1, lo1, step,
                     TQ, VE, b0, dt_c, bdf2, with_trilinear, n_real, NP,
                     km8, kk8, kf8, skip_solve=False, Kinv=None,
                     solve_iters=None, dprev=None, panels=None,
                     save_panels=False, refine=1, paired_mode="sub1",
                     dprev2=None):
    """Merged-dot residual-form BDF step (v3 fused kernel).

    The v2 step materialized MN and KL with two K=8 MXU dots, then ran
    the r0 matvecs on the VPU over the (NP, NP, BLANE) blocks. Those dots
    are STREAM-bound (M·N/128 array cycles regardless of K — measured
    68.6 µs/step of a 164.7 µs step at the W=25/NP=48 point), so:

      * the solve matrix is built by ONE merged dot over the FULLY folded
        combine tensor — KN = [Bm | Bk | T0] @ [bdf·θm; θk; dt·b0·u*] =
        bdf·MN + dt·S_lin + dt·b0·N(u*). The trilinear tensor rides the
        same NP²-row output stream as the linear parts (MXU dot cost is
        output-stream-bound, independent of contraction depth), so the
        state-dependent solve matrix costs ONE stream pass per step —
        the separate NN = T0·u* materialization (a second full NP²-row
        pass, measured ~17 µs/step at the headline shape) is gone;
      * the r0 matvecs use the θ-FACTORED form instead of materialized
        operators: MN·d = Σ_k θm_k · (Bm_k · d) with the k-stacked
        (k·NP, NP) tensor as a single small MXU dot (M = k·NP ≈ NP²/6)
        plus a cheap VPU θ-contraction;
      * the trilinear residual term tri·u* = (N(u*)·u*) is a QUADRATIC
        FORM in u*, evaluated without materializing N(u*): one VPU outer
        product u*⊗u* (NP² rows) contracted against the [i, (j,k)]-
        permuted trilinear layout TQ — an NP-row MXU dot instead of an
        NP²-row one.

    r0 = MN·d + fN − KL·pred − tri·pred is evaluated term-by-term
    (each term computed directly — no catastrophic cancellation; same
    structure as the v2 residual form)."""
    kmk8 = km8 + kk8
    one = jnp.float32(1.0)
    hi = jax.lax.Precision.HIGHEST

    pred_hi, pred_lo, d, bdf = _dd_predictor(uN, lo, uN1, lo1, step, bdf2)

    k_iota = jax.lax.broadcasted_iota(jnp.int32, (kmk8, 1), 0)
    scale = jnp.where(k_iota < km8, bdf, one)
    rhs = tts[0:kmk8] * scale
    fN = jax.lax.dot(Bf, tts[kmk8:kmk8 + kf8], precision=hi)

    if with_trilinear:
        dtb0 = (dt_c * b0)[None, :]
        rhs = jnp.concatenate([rhs, pred_hi * dtb0], axis=0)
        KN = jax.lax.dot(Bmk, rhs, precision=hi).reshape(NP, NP, BLANE)
        outer = (pred_hi[:, None, :]
                 * pred_hi[None, :, :]).reshape(NP * NP, BLANE)
        trip = jax.lax.dot(TQ, outer, precision=hi) * dtb0
    else:
        KN = jax.lax.dot(Bmk, rhs, precision=hi).reshape(NP, NP, BLANE)
        trip = jnp.zeros_like(pred_hi)

    # Factored tensors carry only the REAL k rows (k·NP output rows are
    # what the dot streams); the θ table stays 8-padded for its sublane
    # layout — slice just the real rows out of each 8-aligned block.
    km = BmF.shape[0] // NP
    kk = BkF.shape[0] // NP
    t1m = jax.lax.dot(BmF, d, precision=hi).reshape(km, NP, BLANE)
    MNd = jnp.sum(t1m * tts[0:km][:, None, :], axis=0)
    t1k = jax.lax.dot(BkF, pred_hi, precision=hi).reshape(kk, NP, BLANE)
    KLp = jnp.sum(t1k * tts[km8:km8 + kk][:, None, :], axis=0)
    r0 = MNd + fN - KLp - trip

    out_panels = None
    if skip_solve:
        delta = r0
    elif solve_iters is not None and Kinv is not None:
        delta = _richardson_solve(KN, Kinv, r0, solve_iters,
                                  delta0=dprev)
    elif panels is not None:
        # Paired-step mode, reuse step: solve with the group leader's
        # few-step-stale LU panels, refining against the TRUE current
        # KN (ρ = ‖I − K_stale⁻¹K‖ ≈ per-step θ drift, ~1e-3/step at
        # serving dt; the BDF-1→2 switch at global step 1 never reaches
        # this branch — the chunk's first two steps take the full LU).
        #   sub1 : δ₀ = P(r0), one refinement — err ρ² (2 subst + 1 mv)
        #   warm1: δ₀ = previous step's δ, one refinement —
        #          err (Δδ/δ)·ρ ≈ 1%·ρ (1 subst + 1 mv — the cheap one;
        #          the substitution is VPU-op-overhead-bound, so halving
        #          the substitution count is the lever that matters)
        #   warm2: warm start, two refinements — err 1%·ρ² (2 + 2)
        #   warmx: δ₀ = 2·δ_prev − δ_prev2 (linear extrapolation of the
        #          smooth delta trajectory — start error ~curvature·dt²
        #          ≈ 1e-4 vs warm1's ~1%), one refinement (1 + 1).
        #   inv1/inv2: the group leader saved K_lead⁻¹ (full Jordan
        #          inversion) instead of LU panels; followers run
        #          preconditioned Richardson — δ₀ = K⁻¹r0 plus 1 (inv1)
        #          or 2 (inv2) refinements, i.e. 3 or 5 matvecs and NO
        #          op-overhead-bound substitutions.
        if paired_mode in ("inv1", "inv2"):
            delta = _richardson_solve(KN, panels, r0,
                                      2 if paired_mode == "inv1" else 3)
        elif (paired_mode == "warmx" and dprev is not None
                and dprev2 is not None):
            delta = jnp.float32(2.0) * dprev - dprev2
            resid = r0 - _lanes_matvec(KN, delta)
            delta = delta + _panels_substitute(panels, resid, NP)
        elif paired_mode in ("warm1", "warm2") and dprev is not None:
            delta = dprev
            for _ in range(1 if paired_mode == "warm1" else 2):
                resid = r0 - _lanes_matvec(KN, delta)
                delta = delta + _panels_substitute(panels, resid, NP)
        else:
            delta = _panels_substitute(panels, r0, NP)
            for _ in range(refine):
                resid = r0 - _lanes_matvec(KN, delta)
                delta = delta + _panels_substitute(panels, resid, NP)
    elif save_panels and paired_mode in ("inv1", "inv2"):
        # Group leader for the inv modes: one full Jordan inversion,
        # solve by matvec; the inverse is the group's "panels".
        out_panels = _lanes_invert(KN, NP)
        delta = _lanes_matvec(out_panels, r0)
    elif save_panels:
        delta, out_panels = _lanes_solve_panels(KN, r0, NP)
    else:
        delta = _lanes_solve(KN, r0, n_real, NP)
    uN_new, lo_new = dd_add_small(pred_hi, pred_lo, delta)
    probes = jax.lax.dot(VE, uN_new, precision=hi) + g
    if save_panels:
        return uN_new, lo_new, probes, delta, out_panels
    return uN_new, lo_new, probes, delta


def _sweep_kernel_v2(step0_ref, MN_ref, KL_ref, fN_ref, g_ref, T0_ref,
                     VE_ref, b0_ref, state0_ref, probes_ref, state_ref, *,
                     nt, chunk, dt, bdf2, with_trilinear, n_real, n_pad):
    """Materialized-tables residual-form sweep with chainable dd state.

    step0 is a runtime SMEM scalar (NOT a static arg): it only feeds the
    global-step-0 BDF startup select, and keeping it dynamic lets every
    window launch of a chained sweep share ONE Mosaic compilation."""
    NP = n_pad
    i = pl.program_id(0)
    n_chunks = nt // chunk
    step0 = step0_ref[0]

    def body(mn_s, kl_s, fn_s, g_s, sems, kn_s=None, r0_s=None):
        lanes = pl.ds(i * BLANE, BLANE)

        def dmas(slot, c):
            sl = pl.ds(c * chunk, chunk)
            return (
                pltpu.make_async_copy(MN_ref.at[sl, :, :, lanes],
                                      mn_s.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(KL_ref.at[sl, :, :, lanes],
                                      kl_s.at[slot], sems.at[slot, 1]),
                pltpu.make_async_copy(fN_ref.at[sl, :, lanes],
                                      fn_s.at[slot], sems.at[slot, 2]),
                pltpu.make_async_copy(g_ref.at[sl, :, lanes],
                                      g_s.at[slot], sems.at[slot, 3]),
            )

        for d in dmas(0, 0):
            d.start()

        T0 = T0_ref[:] if with_trilinear else None
        VE = VE_ref[:]
        b0 = b0_ref[0, :] if with_trilinear else None
        dt_c = jnp.float32(dt)

        def chunk_body(c, carry):
            i32 = jnp.int32
            uN, lo, uN1, lo1 = carry
            slot = jax.lax.rem(c, i32(2))

            @pl.when(c + i32(1) < i32(n_chunks))
            def _():
                for d in dmas(jax.lax.rem(c + i32(1), i32(2)), c + i32(1)):
                    d.start()

            for d in dmas(slot, c):
                d.wait()

            for s in range(chunk):
                step = step0 + c * i32(chunk) + i32(s)
                uN_new, lo_new, probes = _bdf_step_resid(
                    mn_s[slot, s], kl_s[slot, s], fn_s[slot, s],
                    g_s[slot, s], uN, lo, uN1, lo1, step, T0, VE, b0,
                    dt_c, bdf2, with_trilinear, n_real, NP,
                    kn_ref=kn_s, r0_ref=r0_s,
                )
                uN1, lo1 = uN, lo
                uN, lo = uN_new, lo_new
                probes_ref[c * i32(chunk) + i32(s)] = probes

            return (uN, lo, uN1, lo1)

        carry0 = (state0_ref[0], state0_ref[1], state0_ref[2],
                  state0_ref[3])
        uN, lo, uN1, lo1 = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(n_chunks), chunk_body, carry0
        )
        state_ref[0] = uN
        state_ref[1] = lo
        state_ref[2] = uN1
        state_ref[3] = lo1

    scratches = dict(
        mn_s=pltpu.VMEM((2, chunk, NP, NP, BLANE), jnp.float32),
        kl_s=pltpu.VMEM((2, chunk, NP, NP, BLANE), jnp.float32),
        fn_s=pltpu.VMEM((2, chunk, NP, BLANE), jnp.float32),
        g_s=pltpu.VMEM((2, chunk, PROBE_P, BLANE), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2, 4)),
    )
    pl.run_scoped(body, **scratches)


@partial(jax.jit, static_argnames=("dt", "bdf2", "with_trilinear",
                                   "n_real", "interpret"))
def online_sweep_pallas_v2(MN_p, KL_p, fN_p, g_p, T0_p, VE_p, b0, state0,
                           *, dt, step0=0, bdf2=True, with_trilinear=True,
                           n_real=15, interpret=False):
    """Residual-form materialized-tables sweep.

    state0 : (4, NP, B) dd carry (uN_hi, uN_lo, uN1_hi, uN1_lo); zeros for
             a fresh trajectory, the previous window's output when chained.
    step0  : global index of this launch's first timestep — a RUNTIME
             scalar, so chained window launches share one compilation.

    Returns (probes (nt, PROBE_P, B), state (4, NP, B)).
    """
    nt, n_pad, _, B = MN_p.shape
    if B % BLANE:
        raise ValueError(f"batch ({B}) must be a multiple of {BLANE}")
    chunk = _chunk_capped(nt, 8) if interpret else _chunk_for(nt, n_pad)

    kernel = partial(_sweep_kernel_v2, nt=nt, chunk=chunk, dt=dt,
                     bdf2=bdf2, with_trilinear=with_trilinear,
                     n_real=n_real, n_pad=n_pad)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(B // BLANE,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  hbm, hbm, hbm, hbm, vmem, vmem,
                  pl.BlockSpec((1, BLANE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((4, n_pad, BLANE), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((nt, PROBE_P, BLANE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n_pad, BLANE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt, PROBE_P, B), jnp.float32),
            jax.ShapeDtypeStruct((4, n_pad, B), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    step0_arr = jnp.asarray(step0, jnp.int32).reshape(1)
    with jax.enable_x64(False):
        return call(step0_arr, MN_p, KL_p, fN_p, g_p, T0_p, VE_p, b0,
                    state0)


def _theta_sweep_kernel_v2(step0_ref, THm_ref, THk_ref, THf_ref, g_ref,
                           Bm_ref, Bk_ref, Bf_ref, T0_ref, VE_ref, b0_ref,
                           state0_ref, probes_ref, state_ref, *, nt, chunk,
                           dt, bdf2, with_trilinear, n_real, n_pad):
    """θ-streaming residual-form sweep with chainable dd state (step0 is
    a runtime SMEM scalar — see _sweep_kernel_v2)."""
    NP = n_pad
    i = pl.program_id(0)
    n_chunks = nt // chunk
    step0 = step0_ref[0]

    def body(thm_s, thk_s, thf_s, g_s, sems, kn_s=None, r0_s=None):
        lanes = pl.ds(i * BLANE, BLANE)

        def dmas(slot, c):
            sl = pl.ds(c * chunk, chunk)
            return (
                pltpu.make_async_copy(THm_ref.at[sl, :, lanes],
                                      thm_s.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(THk_ref.at[sl, :, lanes],
                                      thk_s.at[slot], sems.at[slot, 1]),
                pltpu.make_async_copy(THf_ref.at[sl, :, lanes],
                                      thf_s.at[slot], sems.at[slot, 2]),
                pltpu.make_async_copy(g_ref.at[sl, :, lanes],
                                      g_s.at[slot], sems.at[slot, 3]),
            )

        for d in dmas(0, 0):
            d.start()

        Bm = Bm_ref[:]
        Bk = Bk_ref[:]
        Bf = Bf_ref[:]
        T0 = T0_ref[:] if with_trilinear else None
        VE = VE_ref[:]
        b0 = b0_ref[0, :] if with_trilinear else None
        dt_c = jnp.float32(dt)
        hi = jax.lax.Precision.HIGHEST

        def chunk_body(c, carry):
            i32 = jnp.int32
            uN, lo, uN1, lo1 = carry
            slot = jax.lax.rem(c, i32(2))

            @pl.when(c + i32(1) < i32(n_chunks))
            def _():
                for d in dmas(jax.lax.rem(c + i32(1), i32(2)), c + i32(1)):
                    d.start()

            for d in dmas(slot, c):
                d.wait()

            def one_step(uN, lo, uN1, lo1, s, step):
                MN = jax.lax.dot(Bm, thm_s[slot, s],
                                 precision=hi).reshape(NP, NP, BLANE)
                KL = jax.lax.dot(Bk, thk_s[slot, s],
                                 precision=hi).reshape(NP, NP, BLANE)
                fN = jax.lax.dot(Bf, thf_s[slot, s], precision=hi)
                uN_new, lo_new, probes = _bdf_step_resid(
                    MN, KL, fN, g_s[slot, s], uN, lo, uN1, lo1, step,
                    T0, VE, b0, dt_c, bdf2, with_trilinear, n_real, NP,
                    kn_ref=kn_s, r0_ref=r0_s,
                )
                return uN_new, lo_new, probes

            if n_real <= GJ_FORI_MIN or STEP_UNROLL_V2:
                # Small-N: fully unrolled steps (static stores, minimal
                # loop overhead — the N=15 serving latency path).
                for s in range(chunk):
                    step = step0 + c * i32(chunk) + i32(s)
                    uN_new, lo_new, probes = one_step(
                        uN, lo, uN1, lo1, s, step
                    )
                    uN1, lo1 = uN, lo
                    uN, lo = uN_new, lo_new
                    probes_ref[c * i32(chunk) + i32(s)] = probes
            else:
                # Large-N: per-step work dwarfs loop overhead; a
                # fori_loop keeps the Mosaic body size (and compile
                # time) independent of chunk.
                def step_body(s, carry2):
                    uN, lo, uN1, lo1 = carry2
                    step = step0 + c * i32(chunk) + s
                    uN_new, lo_new, probes = one_step(
                        uN, lo, uN1, lo1, s, step
                    )
                    probes_ref[c * i32(chunk) + s] = probes
                    return (uN_new, lo_new, uN, lo)

                uN, lo, uN1, lo1 = jax.lax.fori_loop(
                    i32(0), i32(chunk), step_body, (uN, lo, uN1, lo1)
                )

            return (uN, lo, uN1, lo1)

        carry0 = (state0_ref[0], state0_ref[1], state0_ref[2],
                  state0_ref[3])
        uN, lo, uN1, lo1 = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(n_chunks), chunk_body, carry0
        )
        state_ref[0] = uN
        state_ref[1] = lo
        state_ref[2] = uN1
        state_ref[3] = lo1

    km = THm_ref.shape[1]
    kk = THk_ref.shape[1]
    kf = THf_ref.shape[1]
    scratches = dict(
        thm_s=pltpu.VMEM((2, chunk, km, BLANE), jnp.float32),
        thk_s=pltpu.VMEM((2, chunk, kk, BLANE), jnp.float32),
        thf_s=pltpu.VMEM((2, chunk, kf, BLANE), jnp.float32),
        g_s=pltpu.VMEM((2, chunk, PROBE_P, BLANE), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2, 4)),
    )
    pl.run_scoped(body, **scratches)


@partial(jax.jit, static_argnames=("dt", "bdf2", "with_trilinear",
                                   "n_real", "interpret"))
def online_sweep_theta_pallas_v2(THm, THk, THf, g_p, Bm, Bk, Bf, T0_p,
                                 VE_p, b0, state0, *, dt, step0=0,
                                 bdf2=True, with_trilinear=True, n_real=15,
                                 interpret=False):
    """θ-streaming residual-form sweep (see online_sweep_pallas_v2)."""
    nt, _, B = THm.shape
    n_pad = VE_p.shape[1]
    if B % BLANE:
        raise ValueError(f"batch ({B}) must be a multiple of {BLANE}")
    for tab in (THm, THk, THf):
        if tab.shape[1] % 8:
            raise ValueError("θ table k dims must be 8-aligned (pad with "
                             "zero rows + zero basis columns)")
    if interpret:
        chunk = _chunk_capped(nt, 8)
    else:
        per_step = 2 * (THm.shape[1] + THk.shape[1] + THf.shape[1]
                        + PROBE_P) * BLANE * 4
        chunk = _chunk_capped(
            nt, min(75, max(1, (44 * 1024 * 1024) // per_step),
                    _compile_cap_v2(n_real)),
        )

    kernel = partial(_theta_sweep_kernel_v2, nt=nt, chunk=chunk, dt=dt,
                     bdf2=bdf2, with_trilinear=with_trilinear,
                     n_real=n_real, n_pad=n_pad)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(B // BLANE,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  hbm, hbm, hbm, hbm, vmem, vmem, vmem, vmem, vmem,
                  pl.BlockSpec((1, BLANE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((4, n_pad, BLANE), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((nt, PROBE_P, BLANE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n_pad, BLANE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt, PROBE_P, B), jnp.float32),
            jax.ShapeDtypeStruct((4, n_pad, B), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    step0_arr = jnp.asarray(step0, jnp.int32).reshape(1)
    with jax.enable_x64(False):
        return call(step0_arr, THm, THk, THf, g_p, Bm, Bk, Bf, T0_p, VE_p,
                    b0, state0)


# ======================================================================
# v3: fully-fused windowed serving — ONE kernel launch for the whole
# W-window sweep.
#
# The v2 serving path launched one θ-streaming kernel per window
# (lax.scan over stacked tables) with the dd boundary transfer as XLA
# ops between launches. Measured costs that removes:
#   * W×(B/BLANE) kernel entries + XLA dispatches per sweep;
#   * the ~50-op dd transfer dispatch per boundary (~10% of the sweep,
#     round-2 ablation ledger);
#   * a full-chunk DMA stall at the head of every window — at serving
#     widths each window is a single chunk, so the v2 double buffer
#     never actually prefetched.
# Here the window loop runs INSIDE the kernel: the per-window constant
# tensors (combine bases, trilinear table, probe rows, boundary
# transfer) stay VMEM-RESIDENT for the whole sweep (~20 MB at the
# headline W=25/NP=48 — their minor dims are not 128-lane aligned, so
# Mosaic cannot DMA-slice them from HBM anyway) and are dynamically
# indexed per window; the merged θ table streams continuously across
# window boundaries (one DMA per chunk instead of four), and the dd
# carry transfer is computed on the VPU between windows — the BDF state
# never leaves VMEM.
# ======================================================================


def _windowed_fused_kernel(TH_ref, Bmk_ref, BmF_ref, BkF_ref, Bf_ref,
                           TQ_ref, VE_ref, T_ref, b0_ref, THb_ref,
                           state0_ref, probes_ref, state_ref,
                           *, W, width, chunk, km8, kk8, kf8, dt, bdf2,
                           with_trilinear, n_real, n_pad, ablate=None,
                           solve_iters=None, paired_lu=None,
                           paired_mode="sub1"):
    NP = n_pad
    i = pl.program_id(0)
    nt = W * width
    n_chunks = nt // chunk
    cpw = width // chunk          # chunks per window (width % chunk == 0)
    off_g = km8 + kk8 + kf8
    # warmx is the only mode reading δ_{n-2}; carrying a DEAD second
    # delta slot in the other modes trips Mosaic's while-carry layout
    # unification (replicated init vs materialized body value), so the
    # carry is extended only when the slot is live.
    track_d2 = bool(paired_lu) and paired_mode == "warmx"

    def body(th_s, pr_s, sems, osems):
        lanes = pl.ds(i * BLANE, BLANE)

        def th_dma(slot, c):
            sl = pl.ds(c * chunk, chunk)
            return pltpu.make_async_copy(TH_ref.at[sl, :, lanes],
                                         th_s.at[slot], sems.at[slot])

        def pr_dma(slot, c):
            # Probes leave VMEM per chunk (the full (nt, P, B) output
            # would be a ~100 MB scoped-VMEM stack at headline shapes).
            sl = pl.ds(c * chunk, chunk)
            return pltpu.make_async_copy(pr_s.at[slot],
                                         probes_ref.at[sl, :, lanes],
                                         osems.at[slot])

        th_dma(0, jnp.int32(0)).start()

        b0 = b0_ref[0, :] if with_trilinear else None
        dt_c = jnp.float32(dt)

        def window_body(w, carry):
            i32 = jnp.int32
            if track_d2:
                uN, lo, uN1, lo1, dprev, dprev2 = carry
            else:
                uN, lo, uN1, lo1, dprev = carry
                dprev2 = None

            # Boundary transfer of the dd carry through T_w on the VPU
            # (T[0] is the identity; its dd renormalization is a no-op on
            # a normalized carry). ops/compensated.dd_matvec is pure jnp —
            # 8-column wide TwoProducts + pairwise dd tree.
            if ablate != "no_boundary":
                T = T_ref[w]
                uN, lo = dd_matvec(T, uN, lo)
                uN1, lo1 = dd_matvec(T, uN1, lo1)
                if solve_iters is not None or (
                        paired_lu and paired_mode in ("warm1", "warm2",
                                                      "warmx")):
                    # Re-express the warm-start guess too (a plain f32
                    # matvec — it seeds an iteration, so eps here is
                    # harmless). Needed by both the Richardson path and
                    # the paired-LU warm follower modes: the delta lives
                    # in the window-local basis.
                    hi_p = jax.lax.Precision.HIGHEST
                    dprev = jax.lax.dot(T, dprev, precision=hi_p)
                    if track_d2:
                        dprev2 = jax.lax.dot(T, dprev2, precision=hi_p)

            # Constants live TRANSPOSED — (k, NP·NP) with the big axis
            # minor — so their VMEM residency wastes no 128-lane padding
            # (k=8 minor would tile-pad 16×: ~90 MB at headline shapes).
            # Un-transpose ONCE PER WINDOW: a leading-axis contraction in
            # the step body makes Mosaic relayout the operand every step
            # (measured 10% off the whole sweep via the trilinear tensor).
            # Bmk carries the FOLDED [Bm | Bk | T0] combine when the
            # trilinear is on (see _bdf_step_merged: one solve-matrix dot
            # per step); TQ is the [i, (j,k)]-permuted trilinear layout
            # for the quadratic-form residual term — already stored with
            # the big axis minor, used untransposed.
            Bmk = Bmk_ref[w].T         # (NP·NP, kmk8[+NP]) folded combine
            BmF = BmF_ref[w].T         # (km8·NP, NP) factored mass
            BkF = BkF_ref[w].T         # (kk8·NP, NP) factored stiffness
            Bf = Bf_ref[w].T           # (NP, kf8)
            VE = VE_ref[w]
            TQ = TQ_ref[w] if with_trilinear else None  # (NP, NP·NP)
            hi = jax.lax.Precision.HIGHEST

            Kinv = None
            if solve_iters is not None and ablate != "empty":
                # Per-window Richardson preconditioner: K̄ from the
                # window-MEAN θ rows (bdf folded in prep) + the
                # trilinear contribution at the window-entry state,
                # inverted once per window (amortized over `width`
                # steps — the per-step solve becomes 2·iters−1 VPU
                # matvecs instead of a blocked LU).
                thb = THb_ref[w]                     # (kmk8, BLANE)
                if with_trilinear:
                    thb = jnp.concatenate(
                        [thb, uN * (dt_c * b0)[None, :]], axis=0
                    )
                Kb = jax.lax.dot(Bmk, thb, precision=hi).reshape(
                    NP, NP, BLANE
                )
                Kinv = _lanes_invert(Kb, NP)
            if ablate == "no_dots":
                # Perf-ledger probe: a per-window constant solve matrix
                # stands in for the per-step θ-combine MXU dots.
                kfold = km8 + kk8 + (NP if with_trilinear else 0)
                KN0 = jax.lax.dot(
                    Bmk, jnp.ones((kfold, BLANE), jnp.float32),
                    precision=hi,
                ).reshape(NP, NP, BLANE)
                fN0 = jax.lax.dot(Bf, jnp.ones((kf8, BLANE), jnp.float32),
                                  precision=hi)

            def chunk_body(cw, carry2):
                c = w * i32(cpw) + cw
                slot = jax.lax.rem(c, i32(2))

                @pl.when(c + i32(1) < i32(n_chunks))
                def _():
                    th_dma(jax.lax.rem(c + i32(1), i32(2)),
                           c + i32(1)).start()

                th_dma(slot, c).wait()
                # The out-DMA of the chunk that last used this probe slot
                # must have drained before we overwrite it.
                @pl.when(c >= i32(2))
                def _():
                    pr_dma(slot, c - i32(2)).wait()

                def step_body(s, carry3):
                    if track_d2:
                        uN, lo, uN1, lo1, dprev, dprev2 = carry3
                    else:
                        uN, lo, uN1, lo1, dprev = carry3
                        dprev2 = None
                    step = c * i32(chunk) + s
                    tts = th_s[slot, s]            # (K8, BLANE)
                    g = tts[off_g:off_g + PROBE_P]
                    if ablate == "empty":
                        # Floor probe: loop + θ DMA + probe store only.
                        pr_s[slot, s] = g
                        uN_new = uN * jnp.float32(0.99) + tts[0][None, :]
                        if track_d2:
                            return (uN_new, lo, uN, lo1, dprev, dprev2)
                        return (uN_new, lo, uN, lo1, dprev)
                    if ablate == "no_dots":
                        # Skip every per-step table dot (the folded
                        # solve-matrix dot, fN, factored r0 matvecs, the
                        # quadratic-form trilinear); keep predictor,
                        # solve, probes.
                        pred_hi, pred_lo, dd_, bdf_ = _dd_predictor(
                            uN, lo, uN1, lo1, step, bdf2
                        )
                        KN = KN0
                        trip = jnp.zeros_like(pred_hi)
                        if solve_iters is not None:
                            delta = _richardson_solve(
                                KN, Kinv, fN0 - trip, solve_iters,
                                delta0=dprev,
                            )
                        else:
                            delta = _lanes_solve(KN, fN0 - trip, n_real,
                                                 NP)
                        uN_new, lo_new = dd_add_small(
                            pred_hi, pred_lo, delta
                        )
                        probes = jax.lax.dot(
                            VE, uN_new, precision=hi
                        ) + g
                    else:
                        uN_new, lo_new, probes, delta = _bdf_step_merged(
                            tts, Bmk, BmF, BkF, Bf, g, uN, lo, uN1, lo1,
                            step, TQ, VE, b0, dt_c, bdf2, with_trilinear,
                            n_real, NP, km8, kk8, kf8,
                            skip_solve=(ablate == "no_solve"),
                            Kinv=Kinv, solve_iters=solve_iters,
                            dprev=dprev,
                        )
                    pr_s[slot, s] = probes
                    if track_d2:
                        return (uN_new, lo_new, uN, lo, delta, dprev)
                    return (uN_new, lo_new, uN, lo, delta)

                if (paired_lu and paired_lu >= 2 and solve_iters is None
                        and ablate is None):
                    # Paired-step LU reuse: factorize once per group of
                    # `paired_lu` steps (panel-saving blocked LU), solve
                    # the followers by substitution + refinement against
                    # their true KN. Followers are statically unrolled
                    # inside the group body so the panels stay register
                    # values. The FIRST TWO steps of every chunk take
                    # the plain per-step LU: the BDF-1→BDF-2 switch at
                    # global steps 0-1 perturbs a stale factor by 0.5·MN
                    # (ρ ≈ 1/3 — refinement can't absorb it), and
                    # keeping the exception static costs one extra
                    # factorization per chunk (~3% at chunk=30). A
                    # (chunk−2) % G remainder also falls back to the
                    # plain per-step solve.
                    G = paired_lu
                    lead = min(2, chunk)
                    n_groups = (chunk - lead) // G

                    def group_body(t, carry3):
                        if track_d2:
                            uN, lo, uN1, lo1, dprev, dprev2 = carry3
                        else:
                            uN, lo, uN1, lo1, dprev = carry3
                            dprev2 = None
                        s0 = i32(lead) + t * i32(G)
                        step = c * i32(chunk) + s0
                        pan = None
                        for j in range(G):
                            sj = s0 + i32(j)
                            tts_j = th_s[slot, sj]
                            g_j = tts_j[off_g:off_g + PROBE_P]
                            out = _bdf_step_merged(
                                tts_j, Bmk, BmF, BkF, Bf, g_j,
                                uN, lo, uN1, lo1, step + i32(j),
                                TQ, VE, b0, dt_c, bdf2, with_trilinear,
                                n_real, NP, km8, kk8, kf8,
                                save_panels=(j == 0),
                                panels=(None if j == 0 else pan),
                                dprev=dprev, dprev2=dprev2,
                                paired_mode=paired_mode,
                            )
                            if j == 0:
                                uN_new, lo_new, probes, delta, pan = out
                            else:
                                uN_new, lo_new, probes, delta = out
                            dprev, dprev2 = delta, dprev
                            pr_s[slot, sj] = probes
                            uN1, lo1 = uN, lo
                            uN, lo = uN_new, lo_new
                        if track_d2:
                            return (uN, lo, uN1, lo1, dprev, dprev2)
                        return (uN, lo, uN1, lo1, dprev)

                    for s in range(lead):
                        carry2 = step_body(i32(s), carry2)
                    carry2 = jax.lax.fori_loop(i32(0), i32(n_groups),
                                               group_body, carry2)
                    for s in range(lead + n_groups * G, chunk):
                        carry2 = step_body(i32(s), carry2)
                else:
                    carry2 = jax.lax.fori_loop(i32(0), i32(chunk),
                                               step_body, carry2)
                pr_dma(slot, c).start()
                return carry2

            carry_in = ((uN, lo, uN1, lo1, dprev, dprev2) if track_d2
                        else (uN, lo, uN1, lo1, dprev))
            return jax.lax.fori_loop(i32(0), i32(cpw), chunk_body,
                                     carry_in)

        carry0 = (state0_ref[0], state0_ref[1], state0_ref[2],
                  state0_ref[3], jnp.zeros_like(state0_ref[0]))
        if track_d2:
            carry0 = carry0 + (jnp.zeros_like(state0_ref[0]),)
        out = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(W), window_body, carry0
        )
        uN, lo, uN1, lo1 = out[:4]
        i32 = jnp.int32
        nc = i32(n_chunks)

        @pl.when(nc >= i32(2))
        def _():
            pr_dma(jax.lax.rem(nc - i32(2), i32(2)), nc - i32(2)).wait()

        pr_dma(jax.lax.rem(nc - i32(1), i32(2)), nc - i32(1)).wait()
        state_ref[0] = uN
        state_ref[1] = lo
        state_ref[2] = uN1
        state_ref[3] = lo1

    K8 = km8 + kk8 + kf8 + PROBE_P
    scratches = dict(
        th_s=pltpu.VMEM((2, chunk, K8, BLANE), jnp.float32),
        pr_s=pltpu.VMEM((2, chunk, PROBE_P, BLANE), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2,)),
        osems=pltpu.SemaphoreType.DMA((2,)),
    )
    pl.run_scoped(body, **scratches)


def _fused_chunk(width, K8, n_real):
    """Largest divisor of the window width within the VMEM/compile caps.
    The θ slot budget matches the v2 kernels (~44 MB over both slots);
    the step body is a fori_loop so the Mosaic body size is
    chunk-independent at serving N."""
    per_step = 2 * K8 * BLANE * 4
    cap = min(75, max(1, (44 * 1024 * 1024) // per_step),
              _compile_cap_v2(n_real))
    for c in range(min(cap, width), 0, -1):
        if width % c == 0:
            return c
    return 1


@partial(jax.jit, static_argnames=("widths", "dt", "bdf2",
                                   "with_trilinear", "n_real", "km8",
                                   "kk8", "kf8", "interpret", "ablate",
                                   "solve_iters", "paired_lu",
                                   "paired_mode"))
def online_sweep_windowed_fused(TH, Bmk, BmF, BkF, Bf, TQ_p, VE_p, T_p,
                                b0, state0, *, widths, dt, bdf2=True,
                                with_trilinear=True, n_real=15, km8=None,
                                kk8=None, kf8=None, interpret=False,
                                ablate=None, solve_iters=None,
                                paired_lu=None, paired_mode="sub1"):
    """Whole-trajectory windowed serving sweep in ONE pallas launch.

    TH     : (nt, K8, B) merged θ table — [θ_mass | θ_stiff+1 | θ_rhs | g]
             along axis 1 (km8 + kk8 + kf8 + PROBE_P rows, all 8-aligned)
    Bmk    : (W, km8+kk8[+NP], NP·NP) TRANSPOSED FOLDED combine tensors
             [Bm | Bk | T0] (dt folded into the Bk block, identity row
             for the padded diagonal; the T0 block present only when
             with_trilinear) — big axis minor so VMEM residency wastes
             no lane padding; bdf scales the θm rows and dt·b0·u* fills
             the T0 rows at runtime, so ONE output-stream-bound dot
             materializes the full state-dependent solve matrix
    BmF    : (W, NP, km·NP) transposed k-stacked factored mass tensors
             (row (k, n) of the untransposed form is Bm3[n, :, k]) for
             the θ-factored r0 matvecs — REAL k rows only (km ≤ km8);
             the dot streams k·NP output rows, so 8-padding here would
             waste 8/km of the pass
    BkF    : (W, NP, kk·NP) transposed factored stiffness tensors
             (real k rows only, kk ≤ kk8)
    Bf     : (W, kf8, NP) transposed per-window rhs combine (dt folded)
    TQ_p   : (W, NP, NP·NP) [i, (j,k)]-permuted per-window trilinear
             tensors for the quadratic-form residual term
             tri·u* = TQ @ vec(u*⊗u*) (ignored when
             with_trilinear=False — pass a (W, 8, 8) dummy)
    VE_p   : (W, PROBE_P, NP) per-window probe rows
    T_p    : (W, NP, NP) zero-padded boundary transfers; T_p[0] = I
    b0     : (1, B) trilinear μ-coefficient
    state0 : (4, NP, B) dd carry at entry (zeros for a fresh trajectory)
    widths : (W,)-tuple of per-window step counts — must be EQUAL (the
             unequal-width fallback is the chained v2 path)

    Returns (probes (nt, PROBE_P, B), state (4, NP, B)).
    """
    W = Bmk.shape[0]
    n_pad = VE_p.shape[2]
    nt, K8, B = TH.shape
    if B % BLANE:
        raise ValueError(f"batch ({B}) must be a multiple of {BLANE}")
    if len(set(widths)) != 1 or W * widths[0] != nt:
        raise ValueError("fused windowed sweep needs equal window widths")
    width = widths[0]
    if K8 != km8 + kk8 + kf8 + PROBE_P:
        raise ValueError("merged θ table rows do not match k offsets")
    kfold = km8 + kk8 + (n_pad if with_trilinear else 0)
    km = BmF.shape[2] // n_pad
    kk = BkF.shape[2] // n_pad
    if Bmk.shape[1] != kfold or not (1 <= km <= km8) \
            or not (1 <= kk <= kk8) or BmF.shape[2] != km * n_pad \
            or BkF.shape[2] != kk * n_pad:
        raise ValueError("merged/factored combine tensor shapes do not "
                         "match the k offsets")
    for k in (km8, kk8, kf8):
        if k % 8:
            raise ValueError("θ table k dims must be 8-aligned")
    chunk = (_chunk_capped(width, 8) if interpret
             else _fused_chunk(width, K8, n_real))

    if paired_lu and n_real <= GJ_FORI_MIN:
        # Small-N uses the unrolled Gauss-Jordan solve — panel reuse
        # only pays above the blocked-LU threshold.
        paired_lu = None
    kernel = partial(_windowed_fused_kernel, W=W, width=width, chunk=chunk,
                     km8=km8, kk8=kk8, kf8=kf8, dt=dt, bdf2=bdf2,
                     with_trilinear=with_trilinear, n_real=n_real,
                     n_pad=n_pad, ablate=ablate, solve_iters=solve_iters,
                     paired_lu=paired_lu, paired_mode=paired_mode)
    # Per-window mean θ rows for the Richardson preconditioner: K̄_w is
    # built in-kernel from these (one dot per window) and inverted once.
    # The bdf factor (1.5 for BDF-2 — the value at every step but the
    # two BDF-1 start steps) is folded into the mass rows here.
    kmk8 = km8 + kk8
    THbar = TH.reshape(W, width, K8, B)[:, :, :kmk8, :].mean(axis=1)
    bdf_bar = jnp.float32(1.5 if bdf2 else 1.0)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (kmk8, 1), 0)
    THbar = THbar * jnp.where(k_iota < km8, bdf_bar,
                              jnp.float32(1.0))[None]
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    # Per-window constants are whole-array VMEM residents: ~20 MB at the
    # headline W=25/NP=48, loaded once per lane-block program (their minor
    # dims are not 128-aligned, so HBM DMA-slicing them is illegal anyway).
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(B // BLANE,),
        in_specs=[hbm, vmem, vmem, vmem, vmem, vmem, vmem, vmem,
                  pl.BlockSpec((1, BLANE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((W, kmk8, BLANE), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((4, n_pad, BLANE), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((4, n_pad, BLANE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt, PROBE_P, B), jnp.float32),
            jax.ShapeDtypeStruct((4, n_pad, B), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    with jax.enable_x64(False):
        return call(TH, Bmk, BmF, BkF, Bf, TQ_p, VE_p, T_p, b0, THbar,
                    state0)
