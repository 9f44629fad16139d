"""Profiling / tracing hooks (SURVEY.md §5.1).

The reference's observability is wall-clock only (MetricLogger iter/data
time + CUDA max-mem). The TPU equivalent adds optional xplane traces via
jax.profiler that open in TensorBoard / Perfetto, plus a step-time
annotation helper.
"""

import contextlib
import os
from typing import Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace into log_dir (no-op if None)."""
    if not log_dir:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named trace span for host-side phases (shows up in the xplane)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
