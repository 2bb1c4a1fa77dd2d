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
# cuts repeat wall-clock from ~42 min to ~2 min. A pre-warmed cache for this
# jaxlib (0.9.0, CPU backend, 8 virtual devices) is checked into .jax_cache/
# so even a fresh checkout skips the big compiles.
#
# jaxlib 0.9.0's XLA:CPU LoadedExecutable.serialize() intermittently
# segfaults on the large training executables (observed twice, inside
# compilation_cache.put_executable_and_time). To keep that crash from
# killing the test run, cache WRITES are performed in a detached
# grandchild process (double fork): the grandchild serializes the
# executable and writes the entry atomically (temp file + rename); if it
# segfaults or deadlocks (alarm(300) backstop), only the grandchild dies.
# Set UTRL_CACHE_WRITE=0 to disable writes entirely.
#
# CONSTRAINT (r2 ADVICE): the grandchild bypasses LRUCache.put — no file
# lock, no -atime sidecar, no size accounting — so
# jax_compilation_cache_max_size MUST stay -1 (never enable eviction with
# this writer; its bookkeeping would be inconsistent). Asserted below.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
assert jax.config.jax_compilation_cache_max_size == -1, (
    "the forked cache writer (below) bypasses LRUCache size accounting; "
    "eviction must stay disabled"
)

# stale .{key}.{pid}.tmp files accumulate when alarm(300) kills a mid-write
# grandchild — sweep them at session start (r2 ADVICE)
import glob as _glob  # noqa: E402

for _tmp in _glob.glob(os.path.join(os.path.abspath(_cache_dir), ".*.tmp")):
    try:
        os.unlink(_tmp)
    except OSError:
        pass
jax.config.update(
    "jax_persistent_cache_min_compile_time_secs",
    1e9 if os.environ.get("UTRL_CACHE_WRITE") == "0" else 1.0,
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import signal  # noqa: E402

import jax._src.compilation_cache as _cc  # noqa: E402


def _forked_put_executable_and_time(
    cache_key, module_name, executable, backend, compile_time
):
    try:
        pid = os.fork()
    except OSError:
        return
    if pid != 0:
        os.waitpid(pid, 0)  # intermediate child exits immediately
        return
    # Intermediate child: fork again so the writer is reparented to init
    # (no zombie, and subprocess-based tests never see its SIGCHLD).
    try:
        if os.fork() != 0:
            os._exit(0)
    except OSError:
        os._exit(0)
    # Grandchild: do the dangerous serialize + atomic write, then vanish.
    try:
        signal.alarm(300)  # backstop for fork-inherited-lock deadlocks
        cache = _cc._get_cache(backend)
        if cache is not None:
            blob = _cc.compress_executable(
                _cc.combine_executable_and_time(
                    executable.serialize(), int(compile_time)
                )
            )
            final = cache.path / f"{cache_key}-cache"
            if not final.exists():
                tmp = cache.path / f".{cache_key}.{os.getpid()}.tmp"
                tmp.write_bytes(blob)
                os.replace(tmp, final)
    except BaseException:
        pass
    finally:
        os._exit(0)


_cc.put_executable_and_time = _forked_put_executable_and_time
# The compiler module binds the name at call time via module attribute in
# some versions and from-imports it in others; patch both.
import jax._src.compiler as _compiler  # noqa: E402

if hasattr(_compiler, "put_executable_and_time"):
    _compiler.put_executable_and_time = _forked_put_executable_and_time
