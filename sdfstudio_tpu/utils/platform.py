"""Explicit JAX platform pinning for CLI entry points.

This deployment's interpreter boot (sitecustomize) force-registers the
axon TPU backend and re-exports ``JAX_PLATFORMS=axon``, so the standard
environment variable CANNOT pin a child process to CPU — verified:
``JAX_PLATFORMS=cpu python -c 'import jax; print(jax.default_backend())'``
prints ``tpu`` on this box. The only reliable override is
``jax.config.update("jax_platforms", ...)`` before the first backend use
(same trick as tests/conftest.py).

``SST_JAX_PLATFORM`` gives scripts that need it (hermetic tests, CPU-side
compile analysis, CI on TPU-equipped boxes) an honored pin. Call
``apply_platform_env()`` first thing in a CLI entry point.
"""
from __future__ import annotations

import os


def apply_platform_env() -> None:
    plat = os.environ.get("SST_JAX_PLATFORM")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except Exception as e:  # backend already initialized — pin came too late
        print(f"[platform] could not pin jax to {plat!r}: {e}", flush=True)
