"""Profiling / tracing hooks (SURVEY §5.1: the reference has none).

``trace(dir)`` wraps a region in a jax.profiler trace viewable in
TensorBoard/Perfetto; ``annotate(name)`` marks sub-regions. Both degrade to
no-ops where the backend does not support profiling (e.g. tunneled devices).
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str = "./profile"):
    import jax

    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:
        print(f"[tinyvc_tpu] profiler unavailable: {e}")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def annotate(name: str):
    """Named sub-region (TraceAnnotation) usable as a context manager."""
    import jax

    try:
        return jax.profiler.TraceAnnotation(name)
    except Exception:
        return contextlib.nullcontext()
