"""JAX persistent compilation cache, gated to the TPU backend.

In this deployment the TPU compiler runs behind a remote-compile service
where EVERY program — including the tiny transfer programs jax emits for
device->host fetches — costs minutes to compile (measured: one 9-float
metrics fetch took 11 minutes uncached). The on-disk cache makes each
program compile once per machine instead of once per process.

Gated to non-CPU backends: caching XLA:CPU AOT results across machines with
different CPU features triggers SIGILL-risk warnings at load.
"""
from __future__ import annotations

import os

_enabled = False


def enable_persistent_cache(cache_dir: str | None = None) -> bool:
    global _enabled
    if _enabled:
        return True
    import jax

    try:
        if jax.default_backend() == "cpu":
            return False
        cache_dir = cache_dir or os.environ.get(
            "SST_JAX_CACHE", os.path.expanduser("~/.cache/sdfstudio_tpu_jax")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
        return True
    except Exception:
        return False
