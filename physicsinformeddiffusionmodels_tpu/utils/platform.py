"""Platform selection + persistent compilation cache.

In this environment a sitecustomize hook registers the TPU backend with
explicit priority, so the ``JAX_PLATFORMS`` env var alone does not switch
platforms. Entry points call :func:`apply_platform_env` to make the env var
authoritative again (needed for CPU smoke runs and the virtual-device mesh
tests).

The persistent compilation cache is opt-in via ``PIDM_COMPILE_CACHE=<dir>``.
It is NOT enabled by default: executable serialization stalls indefinitely
on tunneled/proxied TPU backends (measured: bench.py train-step compile
blocks >10 min with the cache on, ~40 s with it off), and XLA:CPU AOT cache
entries pin the compile machine's ISA features and can SIGILL on a
different host."""

from __future__ import annotations

import os


def apply_platform_env():
    import jax

    requested = os.environ.get("JAX_PLATFORMS")
    if requested:
        jax.config.update("jax_platforms", requested)

    cache = os.environ.get("PIDM_COMPILE_CACHE", "")
    if cache not in ("0", "", "off"):
        # gate on the RESOLVED backend, not just the env var: on a CPU-only
        # host with JAX_PLATFORMS unset the cache would otherwise still be
        # enabled — exactly the XLA:CPU AOT/SIGILL hazard above
        if requested == "cpu" or jax.default_backend() == "cpu":
            return
        jax.config.update("jax_compilation_cache_dir", os.path.expanduser(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def device_kind() -> str:
    import jax

    return jax.devices()[0].platform
