"""Test harness config: run everything on a virtual 8-device CPU platform so
sharding/pjit paths are exercised without TPU hardware (SURVEY.md §4).

Note: this machine's sitecustomize registers a remote TPU ("axon") PJRT
backend whose first initialization dials a tunnel (~minutes). Tests force
the CPU platform via jax.config *before* any backend is initialized; the
env-var route (JAX_PLATFORMS) is overridden by the site registration, so it
must be the config API.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402  (import after env vars)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite compiles a handful of large fused
# programs (env step, PPO iteration); caching them across runs/processes
# cuts repeat wall-clock from ~25 min to ~2 min.
#
# Cache WRITES are disabled by default: jaxlib 0.9.0's XLA:CPU
# LoadedExecutable.serialize() intermittently segfaults/aborts on the large
# training executables (observed twice, both times inside
# compilation_cache.put_executable_and_time), killing the whole test run.
# Reads of previously cached entries are unaffected. To warm the cache
# deliberately, run once with UTRL_CACHE_WRITE=1 on an otherwise idle
# machine.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update(
    "jax_persistent_cache_min_compile_time_secs",
    1.0 if os.environ.get("UTRL_CACHE_WRITE") == "1" else 1e9,
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
