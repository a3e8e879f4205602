"""Jaxpr gather/scatter census for hot-path regression tests.

The repo's two biggest round-2 performance wins came from profiler-found
gather/scatter ops (a fancy-index gather runs ~600 MB/s on TPU; a strided
slice lowers to gather and its transpose to scatter — see
NOTES_NEXT_ROUND.md "Measured TPU facts"). This module walks a traced
jaxpr (recursively, through pjit/scan/cond/custom_vjp sub-jaxprs) and
returns every gather/scatter equation with enough metadata to classify it,
so tests can fail the build when a stray gather lands in the serving
convert, stream step, or GAN train step.

Classification ("cheap" = allowed without an explicit allowlist entry):

- ``gather``: cheap when the gathered output is small (< ``cheap_bytes``).
  Big monotonic index maps (frame->waveform linear interp) must use the
  tent-conv forms in ``dsp/interp.py`` or the Pallas kernels instead.
- ``scatter`` / ``scatter-add``: cheap when the scatter writes one
  statically-indexed slice (index operand has a single row) — XLA lowers
  that to pad+add / dynamic-update-slice, the shifted-view overlap-add
  pattern used by istft and the chain vjps. Everything else is flagged.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, List

_SCATTERISH = ("scatter", "scatter-add", "scatter-mul", "scatter-min",
               "scatter-max")


@dataclass
class Finding:
    prim: str
    out_shape: tuple
    out_bytes: int
    idx_rows: int
    operand_shapes: tuple

    def __str__(self) -> str:  # pragma: no cover - debugging aid
        return (
            f"{self.prim} out={self.out_shape} ({self.out_bytes} B) "
            f"idx_rows={self.idx_rows} operands={self.operand_shapes}"
        )


def _walk(jaxpr, out: List[Finding]):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "gather" or name in _SCATTERISH:
            aval = eqn.outvars[0].aval
            out_bytes = int(
                math.prod(aval.shape) * aval.dtype.itemsize
            ) if aval.shape else aval.dtype.itemsize
            # operand 1 is the index array for both gather and scatter
            idx_aval = eqn.invars[1].aval
            idx_rows = int(
                math.prod(idx_aval.shape[:-1]) if idx_aval.shape else 1
            )
            out.append(
                Finding(
                    prim=name,
                    out_shape=tuple(aval.shape),
                    out_bytes=out_bytes,
                    idx_rows=idx_rows,
                    operand_shapes=tuple(
                        tuple(v.aval.shape) for v in eqn.invars
                    ),
                )
            )
        for v in eqn.params.values():
            items = v if isinstance(v, (list, tuple)) else [v]
            for item in items:
                inner = getattr(item, "jaxpr", None)
                if inner is not None and hasattr(inner, "eqns"):
                    _walk(inner, out)
                elif hasattr(item, "eqns"):
                    _walk(item, out)
    return out


def gather_census(traced: Any) -> List[Finding]:
    """``traced`` is the result of ``jax.make_jaxpr(f)(*args)``."""
    jaxpr = getattr(traced, "jaxpr", traced)
    return _walk(jaxpr, [])


def expensive(
    findings: List[Finding], cheap_bytes: int = 1 << 20
) -> List[Finding]:
    """Filter to the findings that need an explicit allowlist entry."""
    bad = []
    for f in findings:
        if f.prim == "gather":
            if f.out_bytes >= cheap_bytes:
                bad.append(f)
        else:  # scatter family
            if f.idx_rows > 1:
                bad.append(f)
    return bad
