"""Persistent XLA compilation cache setup.

Compiles of the fused train-step/synthesis programs take minutes on small
hosts; cache them on disk so repeat invocations (tests, benches, driver
checks) skip recompilation."""

import os


def enable_compilation_cache(cache_dir: str = None) -> None:
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            ".jax_cache",
        )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
