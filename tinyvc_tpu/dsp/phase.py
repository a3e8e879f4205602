"""Long-horizon phase-prefix numerics.

The harmonic oscillator integrates per-frame phase increments with an
exclusive prefix sum that is only ever used mod 1 (integer harmonics).
A flat fp32 cumsum loses mod-1 precision once the running total grows —
at ~30k frames (~10 min of audio) the ulp reaches ~1e-3 cycles and the
synthesis audibly detunes (the reference's unbounded cumsum,
`module/tinyvc/decoder.py:50`, drifts the same way much earlier).

:func:`wrapped_exclusive_prefix` keeps every accumulator small with a
two-level mod-1 wrap: plain prefix within fixed groups (running value
<= GROUP, ulp ~3e-5 cycles), group totals wrapped mod 1 before the outer
prefix (running value <= n_groups). Within the first group the result is
bit-identical to the flat ``cumsum(x) - x`` form, which the time-sharded
path's seed-cancellation relies on (`parallel/time_shard.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

GROUP = 64


def _wrapped_scan_prefix(x: jnp.ndarray):
    """Sequential exclusive prefix over the last axis with the running total
    wrapped mod 1 after every add — the accumulator never exceeds ~1, so
    each step rounds at ulp(1) ~ 1e-7 cycles regardless of length. Returns
    (exclusive prefix [..., n], wrapped totals [...])."""
    xs = jnp.moveaxis(x, -1, 0)

    def step(carry, v):
        out = carry
        carry = carry + v
        carry = carry - jnp.floor(carry)
        return carry, out

    total, outs = jax.lax.scan(step, jnp.zeros(xs.shape[1:], x.dtype), xs)
    return jnp.moveaxis(outs, 0, -1), total


def wrapped_exclusive_prefix(x: jnp.ndarray, group: int = GROUP) -> jnp.ndarray:
    """Exclusive prefix sum over the last axis, accurate mod 1 for
    arbitrarily long sequences. ``x``: [..., F] non-negative per-frame
    increments (callers pass values already wrapped mod 1).

    Hierarchical wrapped scan: a ``group``-step wrapped scan within groups
    (vectorised over groups), wrapped group totals prefixed by recursion.
    Every accumulator at every level stays <= 1, so the error is a few
    ulp(1) per level — no magnitude-dependent drift, for any F — while no
    scan is longer than ``group`` steps (a flat F-step scan would serialise
    on TPU).

    NOTE: the first ``group`` frames use exactly one `_wrapped_scan_prefix`
    pass; the time-sharded path's phase-seed cancellation replicates its
    margin frames (< group) through this same function to stay bit-exact
    (`parallel/time_shard.py`)."""
    F = x.shape[-1]
    if F <= group:
        return _wrapped_scan_prefix(x)[0]
    pad = (-F) % group
    if pad:
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    else:
        xp = x
    nb = (F + pad) // group
    xb = xp.reshape(x.shape[:-1] + (nb, group))
    inner, totals = _wrapped_scan_prefix(xb)  # [..., nb, group], [..., nb]
    outer = wrapped_exclusive_prefix(totals, group)  # recurse over groups
    off = inner + outer[..., None]
    off = off - jnp.floor(off)
    return off.reshape(x.shape[:-1] + (F + pad,))[..., :F]
