"""Trace-time kernel dispatch overrides.

``force_xla()`` disables backend-gated Pallas lowerings for code traced
inside the context. Needed where a surrounding transform cannot batch a
manual-DMA Pallas kernel: ``jax.vmap`` over the chunk axis of
`parallel/time_shard.py::time_batched_convert` adds a leading dim to every
inner op, and Mosaic only supports ANY-memory-space blocks that cover the
whole array (the energy upsampler's pallas_call fails to lower — found on
chip by bench config 4c). The XLA forms batch fine, and the chunk batch
itself amortises their dispatch cost.
"""

from __future__ import annotations

from contextlib import contextmanager

_FORCE_XLA = False


def xla_forced() -> bool:
    return _FORCE_XLA


@contextmanager
def force_xla():
    global _FORCE_XLA
    old = _FORCE_XLA
    _FORCE_XLA = True
    try:
        yield
    finally:
        _FORCE_XLA = old
