"""Compute-dtype control.

The offline certification pipeline (POD spectra at 1e-7, DEIM exactness at
1e-15) wants float64; online serving wants float32/bfloat16 on the MXU. The
framework routes every materialization of static numeric data through
:func:`asarray`, so a single knob switches the traced compute precision —
e.g. train in f64 on CPU, serve the batched online sweep in f32 on TPU:

    with compute_dtype_scope(jnp.float32):
        rom.solve_batch(mus)        # traces/compiles in f32
"""

from contextlib import contextmanager

import jax
import jax.numpy as jnp

_COMPUTE_DTYPE = None


def set_compute_dtype(dtype):
    """Set (or clear with None) the framework compute dtype."""
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype


def compute_dtype():
    """Active compute dtype: the explicit setting, else x64-default."""
    if _COMPUTE_DTYPE is not None:
        return _COMPUTE_DTYPE
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


@contextmanager
def compute_dtype_scope(dtype):
    global _COMPUTE_DTYPE
    previous = _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype
    try:
        yield
    finally:
        _COMPUTE_DTYPE = previous


def asarray(x):
    """jnp.asarray pinned to the active compute dtype."""
    return jnp.asarray(x, dtype=compute_dtype())


def scalar(x):
    """Scalar in the active compute dtype."""
    return jnp.asarray(float(x), dtype=compute_dtype())
