"""Test harness: force JAX onto a virtual 8-device CPU mesh so multi-chip
sharding paths compile + execute without TPU hardware (SURVEY.md §4 tier d).

Must run before any jax import — pytest loads conftest first.
"""

import os

# Force, don't setdefault: the driver environment exports JAX_PLATFORMS=axon
# (the tunneled TPU); unit tests must be hermetic on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# R1CS-satisfaction sanity checks on every prove() in tests (env-gated
# in production, see backend/groth16/prover.py).
os.environ.setdefault("FAWKES_CHECK_SATISFIED", "1")

# Persistent compilation cache: XLA-CPU compiles of deep limb-arithmetic
# graphs are expensive; cache them across test runs.
import jax  # noqa: E402  (env vars above must be set before this import)

# The axon TPU plugin's sitecustomize registers itself and overrides
# JAX_PLATFORMS before conftest runs; the config update below wins over it.
jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# Heavy end-to-end tests (device-MSM prove, G2 MSM) compile for minutes on
# XLA-CPU; gate them behind an env flag, mirroring the reference's
# `heavy_tests` cargo feature (fawkes-crypto/Cargo.toml:66, SURVEY.md §4.4).
import pytest  # noqa: E402

HEAVY = os.environ.get("FAWKES_HEAVY_TESTS", "") not in ("", "0")
heavy_test = pytest.mark.skipif(
    not HEAVY, reason="set FAWKES_HEAVY_TESTS=1 to run heavy e2e tests"
)
