"""JAX runtime setup shared by all predictors."""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

_configured = False


def _machine_fingerprint() -> str:
    """Hash of the CPU feature set + jax version.

    The persistent cache stores XLA AOT results; loading one compiled under a
    different CPU feature set (VM boots migrate across hosts) logs
    "machine type ... doesn't match" and can fail at execution with buffer
    mismatches (observed: "supplied 83 buffers but compiled program expected
    86"). Salting the cache dir per machine profile makes such entries
    unreachable instead of latent."""
    import jax

    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        # no /proc/cpuinfo (macOS etc.): fall back to the coarse platform
        # identity so the fingerprint never degrades to jax-version-only
        flags = f"{platform.machine()}|{platform.platform()}"
    return hashlib.sha1(f"{jax.__version__}|{flags}".encode()).hexdigest()[:12]


def _reap_stale_caches(current: Path, keep: int = 3) -> None:
    """Fingerprinted cache dirs accumulate across VM migrations (each can be
    GBs of XLA AOT artifacts). Keep the current dir plus the `keep` most
    recently used siblings; delete the rest, best-effort."""
    import shutil

    try:
        siblings = [
            d for d in current.parent.glob("jax_cache-*")
            if d.is_dir() and d.name != current.name
        ]
        siblings.sort(key=lambda d: d.stat().st_mtime, reverse=True)
        for stale in siblings[keep:]:
            shutil.rmtree(stale, ignore_errors=True)
    except OSError:
        pass


def invalidate_compilation_cache() -> None:
    """Wipe the persistent compilation cache. Called when a cached program
    fails at execution with INVALID_ARGUMENT / buffer-count mismatch — a
    poisoned artifact (serialized during a degraded tunnel window, or
    compiled under a different attachment) keeps failing every process that
    loads it; recompiling is the fix. The current process's backend may
    already be unusable, but the next one starts clean."""
    import shutil

    try:
        import jax

        d = jax.config.jax_compilation_cache_dir
        if d and Path(d).is_dir():
            shutil.rmtree(d, ignore_errors=True)
            Path(d).mkdir(parents=True, exist_ok=True)
    except Exception:
        pass


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
        Path(settings.MODEL_CACHE_DIR).parent / f"jax_cache-{_machine_fingerprint()}"
    )
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    _reap_stale_caches(Path(cache_dir))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these flags
        pass
