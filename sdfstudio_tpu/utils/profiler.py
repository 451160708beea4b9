"""Wall-clock section profiler + optional jax trace.

Functional spec: reference nerfstudio/utils/profiler.py:38-96
(@time_function decorator accumulating running-average durations per
qualified name, table printed at exit). Adds a jax.profiler trace helper —
the TPU-native analog of torch profiler runs.
"""
from __future__ import annotations

import atexit
import functools
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict

PROFILER_ENABLED = False
_STATS: Dict[str, list] = defaultdict(lambda: [0.0, 0])


def enable():
    global PROFILER_ENABLED
    PROFILER_ENABLED = True


def time_function(fn):
    """Decorator: accumulate running-average wall time per qualname."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if not PROFILER_ENABLED:
            return fn(*args, **kwargs)
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        dt = time.perf_counter() - t0
        s = _STATS[fn.__qualname__]
        s[0] += dt
        s[1] += 1
        return out

    return wrapper


@contextmanager
def time_section(name: str):
    if not PROFILER_ENABLED:
        yield
        return
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    s = _STATS[name]
    s[0] += dt
    s[1] += 1


def flush_profiler():
    """Print the sorted per-section table (reference profiler.py:52)."""
    if not PROFILER_ENABLED or not _STATS:
        return
    rows = sorted(_STATS.items(), key=lambda kv: -kv[1][0] / max(kv[1][1], 1))
    print("\n== profiler (avg seconds per call) ==")
    for name, (total, count) in rows:
        print(f"  {name:50s} {total / max(count, 1):10.4f}s x {count}")


atexit.register(flush_profiler)


@contextmanager
def jax_trace(log_dir: str):
    """Capture a jax profiler trace viewable in tensorboard/xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
