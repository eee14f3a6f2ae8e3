"""Compensated (double-word) float arithmetic for the online recursion.

The online reduced BDF loop is a 1500-step recursion; served in float32 its
per-step rounding accumulates into a ~1e-5 relative drift vs the float64
trajectory — above the 1e-6 accuracy target (BASELINE.md). Rather than
paying emulated f64 on TPU, the online engines restructure each step in
**residual form**:

    u_pred = 2·u_n − u_{n-1}                     (BDF-2 extrapolation)
    r0     = M·(u_{n-1} − u_n) + dt·(f − S·u_pred)
    K·δ    = r0,   u = u_pred + δ

which is algebraically identical to solving K·u = M·(2u_n − ½u_{n-1}) + dt·f
with K = bdf·M + dt·S (bdf = 3/2), but every floating-point quantity on the
right is O(dt·‖u‖): the catastrophic cancellation between b and K·u_pred is
performed *symbolically*, so f32 rounding enters only relative to the small
step increment. The state is carried as an unevaluated double-f32 sum
(hi, lo) with error-free transformations (TwoSum, Dekker 1971 / Knuth TAOCP
v2 §4.2.2) so increments below f32 resolution are not lost.

Measured on the synthetic reduced recursion (N=32, nt=1500): plain f32
drift 4.1e-7 → residual-form 1.4e-8; f64 residual-form agrees with plain
f64 to 1.4e-15. On the piston pipeline the same restructuring breaks the
f32 serving floor (see bench.py).

These transformations rely on IEEE-754 rounding of each individual op; XLA
preserves per-op semantics (no fast-math reassociation), and the Mosaic TPU
compiler likewise.
"""

import jax.numpy as jnp


def two_sum(a, b):
    """Error-free transformation: a + b = s + e exactly (branch-free
    Knuth TwoSum; no magnitude ordering required)."""
    s = a + b
    ap = s - b
    bp = s - ap
    return s, (a - ap) + (b - bp)


def dd_add_small(hi, lo, delta):
    """(hi, lo) + delta for |delta| ≲ |hi|, renormalized two-word result."""
    s, e = two_sum(hi, delta)
    return two_sum(s, e + lo)


def dd_bdf2_predict(u_hi, u_lo, u1_hi, u1_lo):
    """Double-word u_pred = 2·u_n − u_{n-1} (2·x is exact in binary fp)."""
    ph, pe = two_sum(2.0 * u_hi, -u1_hi)
    pl = pe + (2.0 * u_lo - u1_lo)
    return two_sum(ph, pl)


def dd_history_diff(u_hi, u_lo, u1_hi, u1_lo):
    """Single-word d = u_{n-1} − u_n including the low words. The hi
    subtraction of two nearby states is (near-)exact (Sterbenz), so the
    result carries the low-word information at full relative accuracy."""
    dh, de = two_sum(u1_hi, -u_hi)
    return dh + (de + (u1_lo - u_lo))


def zeros_like_pair(x):
    z = jnp.zeros_like(x)
    return z, z


def _split_point(dtype):
    """Dekker splitting constant 2^ceil(p/2)+1 for the mantissa width."""
    return 134217729.0 if dtype == jnp.float64 else 4097.0


def two_product(a, b):
    """Error-free transformation: a·b = p + e exactly (Dekker splitting —
    no FMA required, which XLA does not expose portably)."""
    s = jnp.asarray(_split_point(jnp.result_type(a)), a.dtype)
    p = a * b
    ca = s * a
    ah = ca - (ca - a)
    al = a - ah
    cb = s * b
    bh = cb - (cb - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def dd_matvec(T, hi, lo):
    """Double-word matvec: (h, l) ≈ T @ (hi + lo) to ~eps²·log m
    relative, in pure working-precision ops (no float64 — the
    f64-emulation path on TPU is both slow and a compile hazard).

    T : (n, m) exact in working precision; hi, lo : (m, B) dd columns.
    8-column chunks of wide TwoProducts reduced by a pairwise dd tree —
    a scalar column sweep is ~720 one-vreg ops at m=48 and costs ~10%
    of a whole serving sweep in boundary transfers."""
    n, m = T.shape
    B = hi.shape[1]
    CH = 8
    pad = (-m) % CH
    if pad:
        T = jnp.concatenate([T, jnp.zeros((n, pad), T.dtype)], axis=1)
        hi = jnp.concatenate([hi, jnp.zeros((pad, B), hi.dtype)], axis=0)
        lo = jnp.concatenate([lo, jnp.zeros((pad, B), lo.dtype)], axis=0)
        m = m + pad

    def dd_add(ah, al, bh, bl):
        sh, se = two_sum(ah, bh)
        return two_sum(sh, se + al + bl)

    acc_h = jnp.zeros((n, B), hi.dtype)
    acc_l = acc_h
    for c0 in range(0, m, CH):
        Tc = T[:, c0:c0 + CH][:, :, None]        # (n, 8, 1)
        xh = hi[c0:c0 + CH][None, :, :]          # (1, 8, B)
        xl = lo[c0:c0 + CH][None, :, :]
        ph, pe = two_product(Tc, xh)             # exact products
        pl = pe + Tc * xl
        w = CH
        while w > 1:
            h = w // 2
            ph, pl = dd_add(ph[:, :h], pl[:, :h],
                            ph[:, h:w], pl[:, h:w])
            w = h
        acc_h, acc_l = dd_add(acc_h, acc_l, ph[:, 0], pl[:, 0])
    return two_sum(acc_h, acc_l)
