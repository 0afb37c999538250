"""fawkes-crypto-tpu: TPU-native Groth16/PLONK proving stack (see README.md)."""

import os


def enable_compile_cache():
    """Opt-in persistent XLA compilation cache: prover kernels take minutes
    to compile (Mosaic + remote compiler); cache them across processes.
    Called explicitly by bench.py / tests / entry points — importing the
    package never mutates global JAX config. Respects a pre-set
    jax_compilation_cache_dir."""
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get(
                    "FAWKES_JAX_CACHE",
                    os.path.expanduser("~/.cache/fawkes_jax"),
                ),
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
