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

# Persistent compilation cache: the suite is XLA-compile dominated (CPU
# scan pipelines); repeat runs on one machine skip most of that.
_cache_dir = os.environ.get(
    "ROMTIME_TEST_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"),
)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_enable_xla_caches",
                      "all")
except Exception:
    pass
