"""JAX runtime setup shared by all predictors."""

from __future__ import annotations

import hashlib
import os
import time
from pathlib import Path

_configured = False


def _machine_fingerprint() -> str:
    """Hash of the CPU feature set + jax version.

    The persistent cache stores XLA AOT results; loading one compiled under a
    different CPU feature set (VM boots migrate across hosts) logs
    "machine type ... doesn't match" and can fail at execution. Salting the
    cache dir per machine profile makes such entries unreachable instead of
    latent. (The "supplied N buffers but compiled program expected M" error
    once attributed to this turned out to be in-process dispatch corruption —
    see _patch_fastpath_const_separation.)"""
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
        pass
    if not flags:
        # no /proc/cpuinfo (macOS), or one without a "flags" line (ARM uses
        # "Features"): fall back to the coarse platform identity so the
        # fingerprint never degrades to jax-version-only
        flags = f"{platform.machine()}|{platform.platform()}"
    # platform selection changes XLA's CPU target preferences (observed:
    # tunnel-attached vs forced-cpu processes on one host produce AOT
    # artifacts with mismatched +prefer-no-scatter/gather machine features,
    # logging "machine type ... doesn't match ... could lead to SIGILL" when
    # they share a dir) — salt the fingerprint with it
    try:
        platforms = jax.config.jax_platforms or "auto"
    except Exception:
        platforms = "auto"
    plugin = bool(os.environ.get("PALLAS_AXON_POOL_IPS"))
    return hashlib.sha1(
        f"{jax.__version__}|{flags}|{platforms}|{plugin}".encode()
    ).hexdigest()[:12]


def _reap_stale_caches(current: Path, keep: int = 3) -> None:
    """Fingerprinted cache dirs accumulate across VM migrations (each can be
    GBs of XLA AOT artifacts). Keep the current dir plus the `keep` most
    recently used siblings; delete the rest, best-effort. Recency is the
    newest file mtime INSIDE each dir (an all-hits read-only cache never
    updates its own dir mtime), and the current dir is touched on startup so
    concurrent processes see it as live."""
    import shutil

    def last_used(d: Path) -> float:
        newest = d.stat().st_mtime
        try:
            for f in d.iterdir():
                newest = max(newest, f.stat().st_mtime)
        except OSError:
            pass
        return newest

    try:
        os.utime(current)
        siblings = [
            d for d in current.parent.glob("jax_cache-*")
            if d.is_dir() and d.name != current.name
        ]
        siblings.sort(key=last_used, reverse=True)
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


# Errors that have actually meant "the loaded cache artifact is bad", vs the
# many other runtime errors whose strings can mention buffers (allocation,
# donation). Kept tight on purpose: wiping the cache on a transient relay
# blip costs minutes of recompiles for every later process (ADVICE r3).
_POISON_MARKERS = (
    "buffers but compiled program expected",
    "machine type",
)
_failure_count = 0


def note_execution_failure(err: BaseException | str) -> bool:
    """Record a device-execution failure and decide whether to wipe the
    persistent compilation cache.

    Measured history (ROADMAP item 11): most INVALID_ARGUMENT failures are
    transient relay degradation that clears on its own — wiping the cache for
    those only adds recompile time. A truncated/poisoned artifact, by
    contrast, fails EVERY process deterministically. Policy: wipe immediately
    on the artifact-specific phrasings (buffer-count / machine-type
    mismatch), or on the 2nd generic INVALID_ARGUMENT in this process.
    Returns True if the cache was invalidated."""
    global _failure_count
    msg = str(err)
    if any(m in msg for m in _POISON_MARKERS):
        invalidate_compilation_cache()
        return True
    if "INVALID_ARGUMENT" in msg:
        _failure_count += 1
        if _failure_count >= 2:
            _failure_count = 0
            invalidate_compilation_cache()
            return True
    return False


def _patch_atomic_cache_writes() -> None:
    """Make jax's persistent-cache writes atomic (temp file + os.replace).

    jax 0.9.0's LRUCache.put writes entries with a bare write_bytes
    (jax/_src/lru_cache.py:152): a process killed mid-write leaves a
    TRUNCATED `<key>-cache` file, and since the key is the program hash,
    every later process loads the truncated artifact and fails until
    something wipes the dir. An atomic rename makes a partial write invisible
    instead of poisonous. (Defense in depth: the buffer-count mismatch once
    blamed on truncation was actually in-process dispatch corruption — see
    _patch_fastpath_const_separation — but kill-mid-write truncation is still
    real and cheap to prevent.)"""
    try:
        import warnings

        from jax._src import lru_cache as _lru

        if getattr(_lru.LRUCache, "_surya_atomic", False):
            return

        def put(self, key: str, val: bytes) -> None:
            # same contract and bookkeeping as jax 0.9.0's LRUCache.put
            # (jax/_src/lru_cache.py:121-161), with the two write_bytes
            # calls replaced by temp-file + os.replace
            if not key:
                raise ValueError("key cannot be empty")
            if self.eviction_enabled and len(val) > self.max_size:
                warnings.warn(
                    f"Cache value for key {key!r} of size {len(val)} bytes "
                    f"exceeds the maximum cache size of {self.max_size} bytes"
                )
                return

            cache_path = self.path / f"{key}{_lru._CACHE_SUFFIX}"
            if self.eviction_enabled:
                self.lock.acquire(timeout=self.lock_timeout_secs)
            try:
                if cache_path.exists():
                    return
                self._evict_if_needed(additional_size=len(val))
                _atomic_write(cache_path, val)
                if self.eviction_enabled:
                    timestamp = time.time_ns().to_bytes(8, "little")
                    _atomic_write(self.path / f"{key}{_lru._ATIME_SUFFIX}", timestamp)
            finally:
                if self.eviction_enabled:
                    self.lock.release()

        def _atomic_write(path, val: bytes) -> None:
            tmp = path.parent / f"{path.name}.tmp-{os.getpid()}-{time.time_ns()}"
            try:
                tmp.write_bytes(val)
                os.replace(tmp, path)
            except BaseException:
                try:
                    tmp.unlink()
                except OSError:
                    pass
                raise

        _lru.LRUCache.put = put
        _lru.LRUCache._surya_atomic = True
    except Exception:
        # jax internals moved: fail open (non-atomic writes, pre-patch
        # behavior) rather than break cache setup
        pass


def _patch_fastpath_const_separation() -> None:
    """Refuse to install a C++ jit fastpath entry for a program whose closure
    constants were separated into runtime arguments.

    jax 0.9.0's pjit separates a traced program's consts into prepended
    runtime args when any const is a Tracer or has quasi-dynamic data
    (jax/_src/pjit.py:555), and its own TODO says such programs "*must* fall
    off the C++ dispatch fast path for correctness. Ensure that happens." —
    but nothing ensures it. Reproduced consequence (bisected locally, and the
    likely cause of the r2/r3 TPU bench INVALID_ARGUMENT deaths): a stale
    tracer from an earlier trace leaks into a later trace's consts via a jax
    internal cache, the program compiles with N+k parameters, a fastpath
    entry is installed anyway, and every later dispatch supplies N buffers —
    "INVALID_ARGUMENT: Execution supplied 83 buffers but compiled program
    expected 86" — sticking until jax.clear_caches(). Returning None from
    _get_fastpath_data for exactly these programs keeps them on the python
    dispatch path, which supplies consts correctly every call. Programs with
    ordinary (np-typed) consts keep the fastpath — zero cost on clean traces."""
    try:
        import threading

        from jax._src import pjit as _pjit

        if getattr(_pjit, "_surya_const_guard", False):
            return

        # _trace_for_jit is the only place that sees the separated consts
        # (they are folded into args_flat before _get_fastpath_data runs, and
        # the jaxpr's own .consts is empty after separation), so pair the two
        # within one cache_miss invocation via a thread-local. Nested jits
        # traced during an outer trace take the bind path (executable=None →
        # no fastpath entry), and each cache_miss consumes its own flag
        # before the outer one reads its own, so pairing stays correct.
        local = threading.local()
        orig_trace = _pjit._trace_for_jit
        orig_fp = _pjit._get_fastpath_data

        def trace_for_jit(fun, jit_info, args, kwargs):
            p, args_flat = orig_trace(fun, jit_info, args, kwargs)
            local.consts_separated = bool(p.consts)
            return p, args_flat

        def get_fastpath_data(*args, **kwargs):
            if getattr(local, "consts_separated", False):
                local.consts_separated = False
                return None
            return orig_fp(*args, **kwargs)

        _pjit._trace_for_jit = trace_for_jit
        _pjit._get_fastpath_data = get_fastpath_data
        _pjit._surya_const_guard = True
    except Exception:
        # jax internals moved: fail open. recover_from_dispatch_corruption()
        # remains as the runtime backstop for this failure mode.
        pass


def recover_from_dispatch_corruption(err: BaseException | str) -> bool:
    """If `err` is the buffer-count dispatch corruption (see
    _patch_fastpath_const_separation), clear jax's in-process caches so the
    next call re-traces and recompiles cleanly, and report True (caller
    should retry once). Persistent-cache artifacts are unaffected."""
    msg = str(err)
    if "buffers but compiled program expected" not in msg:
        return False
    import jax

    jax.clear_caches()
    return True


def setup_jax():
    """Enable the persistent compilation cache (first compile of each program
    shape is 20s-minutes on TPU; the cache makes every later process fast)."""
    global _configured
    if _configured:
        return
    _configured = True

    import jax

    from surya_tpu.settings import settings

    _patch_fastpath_const_separation()

    if os.environ.get("SURYA_DISABLE_COMPILATION_CACHE", "").lower() in ("1", "true"):
        return
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") or str(
        Path(settings.MODEL_CACHE_DIR).parent / f"jax_cache-{_machine_fingerprint()}"
    )
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    _reap_stale_caches(Path(cache_dir))
    _patch_atomic_cache_writes()
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these flags
        pass
