"""Test configuration: CPU backend, 8 virtual devices, float64.

The suite certifies numerics (DEIM exactness at 1e-15, golden operator
values), so it runs in float64 on the CPU backend with 8 virtual devices to
exercise the multi-chip sharding paths without TPU hardware. Benchmarks run
separately on the real chip (see bench.py).
"""

import os
import sys

# Must happen before the first JAX backend initialization.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
