"""Persistent XLA compilation cache setup.

First compiles of the ViT-B programs take tens of seconds (minutes over
remote relays); the persistent cache makes every later process start warm.
Call early, before the first jit executes. Opt out with
``MAEST_TPU_NO_COMPILE_CACHE=1``; relocate with ``JAX_COMPILATION_CACHE_DIR``.
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_compilation_cache(path: str | None = None) -> str | None:
    if os.environ.get("MAEST_TPU_NO_COMPILE_CACHE"):
        return None
    import jax

    cache_dir = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or str(Path.home() / ".cache" / "maest_tpu" / "xla_cache")
    )
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except AttributeError:  # older jax
        pass
    return cache_dir
