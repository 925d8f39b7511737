"""Tracing/profiling: per-stage timers + jax.profiler integration.

The reference has nothing beyond tqdm bars (SURVEY.md §5.1); here profiling
is first-class:

  - `stage(name)` context manager accumulates wall time per stage into a
    process-wide registry (`report()` prints/clears it)
  - setting SURYA_PROFILE_DIR makes `stage` also emit a jax.profiler
    TraceAnnotation and, for the outermost stage, a full device trace
    viewable in TensorBoard/Perfetto
"""

from __future__ import annotations

import os
import threading
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict

from surya_tpu.logging import get_logger

logger = get_logger()

_lock = threading.Lock()
_stats: Dict[str, list] = defaultdict(lambda: [0.0, 0])
_trace_depth = threading.local()


def profile_dir():
    return os.environ.get("SURYA_PROFILE_DIR")


@contextmanager
def stage(name: str):
    """Time a pipeline stage; nests freely. With SURYA_PROFILE_DIR set, the
    outermost stage captures a full jax.profiler device trace."""
    depth = getattr(_trace_depth, "d", 0)
    _trace_depth.d = depth + 1

    tracing = profile_dir() and depth == 0
    if tracing:
        import jax

        jax.profiler.start_trace(profile_dir())
    try:
        import jax

        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            try:
                yield
            finally:
                dt = time.perf_counter() - t0
                with _lock:
                    _stats[name][0] += dt
                    _stats[name][1] += 1
    finally:
        _trace_depth.d = depth
        if tracing:
            import jax

            jax.profiler.stop_trace()
            logger.info("wrote device trace to %s", profile_dir())


def report(reset: bool = True) -> Dict[str, dict]:
    """Return {stage: {total_s, calls, mean_s}} and optionally clear."""
    with _lock:
        out = {
            name: {"total_s": total, "calls": calls, "mean_s": total / calls if calls else 0}
            for name, (total, calls) in _stats.items()
        }
        if reset:
            _stats.clear()
    return out
