"""Test harness: force JAX onto a virtual 8-device CPU mesh so multi-chip
sharding paths compile + execute without TPU hardware (SURVEY.md §4 tier d).

Must run before any jax import — pytest loads conftest first.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Persistent compilation cache: XLA-CPU compiles of deep limb-arithmetic
# graphs are expensive; cache them across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fawkes_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
