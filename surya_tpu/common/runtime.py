"""JAX runtime setup shared by all predictors."""

from __future__ import annotations

import os
from pathlib import Path

_configured = False


def setup_jax():
    """Enable the persistent compilation cache (first compile of each program
    shape is 20s-minutes on TPU; the cache makes every later process fast)."""
    global _configured
    if _configured:
        return
    _configured = True

    import jax

    from surya_tpu.settings import settings

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") or str(
        Path(settings.MODEL_CACHE_DIR).parent / "jax_cache"
    )
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these flags
        pass
