"""Unit tests for the compensated (double-word f32) stepping primitives
(romtime_tpu/ops/compensated.py) and the residual-form recursion they
enable. The end-to-end drift regression lives in
tests/test_hrom.py::test_hrom_piston_pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from romtime_tpu.ops.compensated import (
    dd_add_small,
    dd_bdf2_predict,
    dd_history_diff,
    two_sum,
)


def _f32(x):
    return jnp.asarray(x, jnp.float32)


def test_two_sum_error_free():
    """a + b == s + e exactly (checked in f64 against f32 inputs)."""
    rng = np.random.default_rng(0)
    a = _f32(rng.normal(size=256) * 10.0 ** rng.integers(-6, 6, size=256))
    b = _f32(rng.normal(size=256) * 10.0 ** rng.integers(-6, 6, size=256))
    s, e = jax.jit(two_sum)(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, exact)


def test_dd_add_small_tracks_sub_ulp_increments():
    """Accumulating nt increments of ~1e-3·eps·|hi| must not be lost."""
    hi = _f32(np.ones(8))
    lo = jnp.zeros_like(hi)
    delta = _f32(np.full(8, 1e-10))
    nt = 1000
    for _ in range(nt):
        hi, lo = dd_add_small(hi, lo, delta)
    got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    np.testing.assert_allclose(got, 1.0 + nt * 1e-10, rtol=1e-9)
    # plain f32 accumulation loses every increment
    plain = _f32(np.ones(8))
    for _ in range(nt):
        plain = plain + delta
    assert np.all(np.asarray(plain) == 1.0)


def test_dd_bdf2_predict_and_history_diff():
    rng = np.random.default_rng(1)
    u = rng.normal(size=64)
    u1 = u + 1e-3 * rng.normal(size=64)  # nearby previous state
    u_hi, u_lo = _f32(u), _f32(u - np.asarray(_f32(u), np.float64))
    u1_hi, u1_lo = _f32(u1), _f32(u1 - np.asarray(_f32(u1), np.float64))

    ph, pl = dd_bdf2_predict(u_hi, u_lo, u1_hi, u1_lo)
    pred = np.asarray(ph, np.float64) + np.asarray(pl, np.float64)
    np.testing.assert_allclose(pred, 2 * u - u1, rtol=1e-13, atol=1e-13)

    d = dd_history_diff(u_hi, u_lo, u1_hi, u1_lo)
    np.testing.assert_allclose(
        np.asarray(d, np.float64), u1 - u, rtol=1e-5, atol=1e-12
    )


def test_residual_form_recursion_beats_plain_f32():
    """Synthetic reduced BDF-2 recursion (the ops/compensated.py module
    docstring experiment): residual form + dd state must land at least
    ~10x closer to the f64 trajectory than the plain f32 recursion."""
    rng = np.random.RandomState(0)
    N, nt, dt = 16, 800, 1.0 / 800
    Q = np.linalg.qr(rng.randn(N, N))[0]
    A_ = rng.randn(N, N)
    S_const = A_ @ A_.T / N + np.eye(N)
    S_pert = 0.1 * rng.randn(N, N)
    f0, f1 = rng.randn(N), rng.randn(N)

    def Mt(t):
        L = 1 - 0.12 * (1 - np.cos(17.5 * t))
        return L * (np.eye(N) + 0.1 * np.cos(3 * t) * Q)

    def St(t):
        return 40 * (S_const + np.sin(17.5 * t) * S_pert)

    def ft(t):
        return np.sin(10 * t) * f0 + np.cos(4 * t) * f1

    def run(dtype, mode):
        z = np.zeros(N, dtype)
        u_n, lo_n, u_n1, lo_n1 = z.copy(), z.copy(), z.copy(), z.copy()
        out = []
        for k in range(nt):
            t = (k + 1) * dt
            M = Mt(t).astype(dtype)
            S = St(t).astype(dtype)
            f = ft(t).astype(dtype)
            bdf = dtype(1.0) if k == 0 else dtype(1.5)
            K = bdf * M + dtype(dt) * S
            if mode == "plain":
                combo = u_n if k == 0 else dtype(2) * u_n - dtype(0.5) * u_n1
                u = np.linalg.solve(K, M @ combo + dtype(dt) * f).astype(dtype)
                u_n1, u_n = u_n, u
            else:
                if k == 0:
                    pred_hi, pred_lo = u_n, lo_n
                    d = np.zeros(N, dtype)
                else:
                    ph, pl = dd_bdf2_predict(
                        _j(u_n), _j(lo_n), _j(u_n1), _j(lo_n1)
                    )
                    d = np.asarray(
                        dd_history_diff(_j(u_n), _j(lo_n), _j(u_n1), _j(lo_n1))
                    )
                    pred_hi, pred_lo = np.asarray(ph), np.asarray(pl)
                r0 = M @ d + dtype(dt) * (f - S @ pred_hi)
                delta = np.linalg.solve(K, r0).astype(dtype)
                hi, lo = dd_add_small(_j(pred_hi), _j(pred_lo), _j(delta))
                u_n1, lo_n1 = u_n, lo_n
                u_n, lo_n = np.asarray(hi), np.asarray(lo)
            out.append(
                u_n.astype(np.float64)
                + (lo_n.astype(np.float64) if mode != "plain" else 0.0)
            )
        return np.array(out)

    def _j(x):
        return jnp.asarray(x)

    ref = run(np.float64, "plain")
    plain = run(np.float32, "plain")
    resid = run(np.float32, "resid")
    nrm = np.linalg.norm(ref)
    drift_plain = np.linalg.norm(plain - ref) / nrm
    drift_resid = np.linalg.norm(resid - ref) / nrm
    assert drift_resid < drift_plain / 10, (drift_plain, drift_resid)
    assert drift_resid < 5e-8, drift_resid


def test_two_product_exact():
    from romtime_tpu.ops.compensated import two_product

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=512), jnp.float32)
    b = jnp.asarray(rng.normal(size=512), jnp.float32)
    p, e = two_product(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, exact)


def test_dd_matvec_accuracy():
    """dd matvec in pure f32 must match the f64 matvec to ~dd precision —
    it replaces the emulated-f64 window-boundary transfer on TPU."""
    from romtime_tpu.ops.compensated import dd_matvec

    rng = np.random.default_rng(1)
    n, m, B = 48, 48, 64
    T64 = rng.normal(size=(n, m))
    T = jnp.asarray(np.float32(T64), jnp.float32)  # T exact in f32
    x64 = rng.normal(size=(m, B))
    hi = jnp.asarray(np.float32(x64), jnp.float32)
    lo = jnp.asarray(np.float32(x64 - np.asarray(hi, np.float64)),
                     jnp.float32)

    h, l = dd_matvec(T, hi, lo)
    got = np.asarray(h, np.float64) + np.asarray(l, np.float64)
    want = np.asarray(T, np.float64) @ (
        np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    )
    scale = np.abs(want).max()
    err = np.abs(got - want).max() / scale
    assert err < 1e-13, err
