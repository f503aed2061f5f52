"""Function-timing profiler (ref: utils/profiler.py).

``@time_function`` keeps running averages per function; ``flush`` prints a
sorted table (ref: utils/profiler.py:38-96).  For deep kernel-level traces
use ``jax.profiler.trace`` via the ``jax_trace`` context below — the TPU
analog of the torch profiler the reference never had.
"""
from __future__ import annotations

import contextlib
import functools
import time
from typing import Dict

_ENABLED = False
_STATS: Dict[str, tuple] = {}


def setup_profiler(enabled: bool):
    global _ENABLED
    _ENABLED = enabled


def time_function(fn):
    """(ref: utils/profiler.py:38-60)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if not _ENABLED:
            return fn(*args, **kwargs)
        start = time.time()
        out = fn(*args, **kwargs)
        dt = time.time() - start
        name = getattr(fn, "__qualname__", fn.__name__)
        prev_avg, prev_n = _STATS.get(name, (0.0, 0))
        _STATS[name] = ((prev_avg * prev_n + dt) / (prev_n + 1), prev_n + 1)
        return out

    return wrapper


def flush_profiler():
    """Print the running-average table (ref: utils/profiler.py:64-96)."""
    if not _ENABLED or not _STATS:
        return
    print("\n[profiler] average call times:")
    for name, (avg, n) in sorted(_STATS.items(), key=lambda kv: -kv[1][0]):
        print(f"  {name:<60s} {avg * 1000:10.2f} ms  (n={n})")


@contextlib.contextmanager
def jax_trace(log_dir: str):
    """Capture an XLA/TPU trace viewable in TensorBoard's profiler."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
