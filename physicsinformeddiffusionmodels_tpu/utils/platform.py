"""Platform selection helper.

In this environment a sitecustomize hook registers the TPU backend with
explicit priority, so the ``JAX_PLATFORMS`` env var alone does not switch
platforms. Entry points call :func:`apply_platform_env` to make the env var
authoritative again (needed for CPU smoke runs and the virtual-device mesh
tests)."""

from __future__ import annotations

import os


def apply_platform_env():
    requested = os.environ.get("JAX_PLATFORMS")
    if requested:
        import jax

        jax.config.update("jax_platforms", requested)


def device_kind() -> str:
    import jax

    return jax.devices()[0].platform
