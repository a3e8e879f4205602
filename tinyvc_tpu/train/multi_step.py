"""K-steps-per-dispatch training: an on-device ``lax.scan`` over the
HBM-resident dataset cache.

Per-step host dispatch is the composed loop's bottleneck on a relayed TPU
backend (round-4 measurement: the encoder loop ran at ~7% of its own
device step rate — 38 vs 540 steps/s — purely on dispatch/relay overhead;
the decoder loop at 85-91%). With ``--device-data`` the whole chunk cache
already lives in HBM, so there is no reason to return to the host between
steps at all: scan K jitted steps per dispatch, feeding each inner step an
on-device row gather of the cache. Per dispatch the host sends K*B int32
sample indices and K PRNG keys (a few KB) and fetches one metrics tree —
everything else stays on device.

Sampling semantics are IDENTICAL to the single-step device-data loop: the
host draws the same per-step index batches (``rng.choice`` without
replacement within a batch) and ships them as a [K, B] array, so a
multi-step trajectory with the same indices/keys is bit-for-bit the same
computation as K single steps (enforced by tests/test_multi_step.py).

The reference has no analogue (its loops are host-Python per step,
`train_encoder.py:69-118`, `train_decoder.py:85-170`); this is the
TPU-native shape of a training loop: dispatch boundaries only where the
host genuinely needs data (logging, checkpoints, the discriminator join).
"""

from __future__ import annotations

import math

import jax

from ..config import TinyVCConfig
from . import decoder_train, encoder_train


def effective_k(requested: int, *boundaries: int) -> int:
    """Largest K <= requested that divides every host-visible boundary
    (log/save intervals, discriminator join, max_steps), so a dispatch
    never needs to stop mid-window. Degrades to 1 when incompatible."""
    k = max(int(requested), 1)
    for b in boundaries:
        if b and b > 0:
            k = math.gcd(k, int(b))
    return max(k, 1)


def _squash_metrics(ms):
    """[K]-stacked metrics -> one tree: last value for losses, SUM for the
    nonfinite-skip counters (a skip anywhere in the window must surface)."""
    return {
        k: (v.sum(axis=0) if k.startswith("skipped") else v[-1])
        for k, v in ms.items()
    }


def make_encoder_multi_step(cfg: TinyVCConfig, distill: bool):
    """Returns ``fn(state, waves, f0s, teacher, idx_kb, keys) -> (state,
    metrics)`` scanning K = idx_kb.shape[0] encoder steps on device.

    waves [n, L] / f0s [n, F] / teacher [n, Ft, D] are the HBM-resident
    cache (teacher ignored when ``distill=False`` — pass a [n, 1, D]
    placeholder); idx_kb [K, B] int32; keys [K] PRNG keys.
    """
    step_fn = encoder_train.make_train_step(cfg, distill=distill)

    @jax.jit
    def multi(state, waves, f0s, teacher, idx_kb, keys):
        def body(st, xs):
            idx, key = xs
            st, metrics = step_fn(st, waves[idx], f0s[idx], teacher[idx], key)
            return st, metrics

        state, ms = jax.lax.scan(body, state, (idx_kb, keys))
        return state, _squash_metrics(ms)

    return multi


def make_decoder_multi_step(
    cfg: TinyVCConfig, d_join: bool, spec_loss_type: str = "ms-stft"
):
    """Returns ``fn(state, enc_params, waves, idx_kb, keys) -> (state,
    metrics)`` scanning K GAN steps on device (one compiled program per
    join phase, mirroring the single-step pre/post split)."""
    step_fn = decoder_train.make_train_step(
        cfg, d_join=d_join, spec_loss_type=spec_loss_type
    )

    @jax.jit
    def multi(state, enc_params, waves, idx_kb, keys):
        def body(st, xs):
            idx, key = xs
            st, metrics = step_fn(st, enc_params, waves[idx], key)
            return st, metrics

        state, ms = jax.lax.scan(body, state, (idx_kb, keys))
        return state, _squash_metrics(ms)

    return multi
