"""Persistent XLA compilation cache for CLI entry points.

The test suite pins its own curated cache (tests/conftest.py ->
.jax_cache/, committed). TPU scripts pay full remote compiles per
process otherwise — the train program alone is 20-40 s over the axon
compile service, and campaign drivers relaunch often. Entry points call
:func:`enable_persistent_cache` before building programs.

Opt out with UTRL_JAX_CACHE=0; relocate with UTRL_JAX_CACHE_DIR.
Eviction stays disabled (jax_compilation_cache_max_size=-1): this
jaxlib's eviction path crashes on cache-dir races (see conftest note).
"""

import os


def enable_persistent_cache(path: str = None):
    if os.environ.get("UTRL_JAX_CACHE", "1") == "0":
        return
    import jax

    d = path or os.environ.get(
        "UTRL_JAX_CACHE_DIR", "/tmp/utrl_jax_cache"
    )
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
