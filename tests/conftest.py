"""Test configuration.

Tests run on CPU with 8 virtual devices (to exercise multi-chip sharding
paths without TPU hardware) and with float64 enabled so parity tests against
scipy oracles can demand 1e-6 (BASELINE.md accuracy target).

Note: this environment pre-imports jax at interpreter startup with
JAX_PLATFORMS pointed at a TPU tunnel, so env vars are too late here —
platform/flags must be set through jax.config before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

# persistent compilation cache shared with bench.py: the suite is dominated
# by XLA compiles of scan-heavy programs, which are identical across runs
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
