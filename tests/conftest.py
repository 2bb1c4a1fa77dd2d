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
