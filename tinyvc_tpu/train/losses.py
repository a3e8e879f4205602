"""Training losses.

Behavioural spec: `module/utils/loss.py:11-68` (multi-scale STFT and log-mel
reconstruction losses) and the LSGAN/feature-matching terms inlined in
`train_decoder.py:113-154`. The reference zeroes NaN/Inf spectrogram entries
(`loss.py:32-35,63-66`); finite inputs never produce them here, but
``nan_to_num`` keeps the same guard semantics under bf16 experiments.
"""

from __future__ import annotations

import functools

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.mel import mel_spectrogram
from ..dsp.stft import stft_magnitude, stft_magnitude_matmul


def _safe_log(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    return jnp.log(x + eps)


def multi_scale_stft_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    scales: Sequence[int] = (16, 32, 64, 128, 256, 512),
    impl: str = "auto",
) -> jnp.ndarray:
    """L2 on magnitude + L1 on log magnitude, averaged over scales
    (reference `loss.py:11-38`; hop = s, n_fft = 4 s, frame 0 kept).

    ``impl='auto'`` uses the bf16 windowed-DFT-matmul magnitude on TPU
    (MXU; rfft + its transpose dominated the loss's step time) and the
    exact fp32 rfft elsewhere — parity tests run on CPU and stay exact.
    """
    if impl == "auto":
        impl = "rfft" if jax.default_backend() in ("cpu", "gpu") else "matmul"
    mag = (
        functools.partial(stft_magnitude, grad_safe=True)
        if impl == "rfft"
        else stft_magnitude_matmul
    )
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    loss = 0.0
    for s in scales:
        xs = jnp.nan_to_num(mag(x, s * 4, s))
        ys = jnp.nan_to_num(mag(y, s * 4, s))
        loss += jnp.mean((xs - ys) ** 2) + jnp.mean(
            jnp.abs(_safe_log(xs) - _safe_log(ys))
        )
    return loss / len(scales)


def log_mel_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    sample_rate: int = 24000,
    n_fft: int = 1024,
    hop: int = 256,
    n_mels: int = 80,
) -> jnp.ndarray:
    """L1 between log power-mel spectrograms (reference `loss.py:41-68`)."""
    xm = _safe_log(mel_spectrogram(x.astype(jnp.float32), sample_rate, n_fft, hop, n_mels))
    ym = _safe_log(mel_spectrogram(y.astype(jnp.float32), sample_rate, n_fft, hop, n_mels))
    return jnp.mean(jnp.abs(jnp.nan_to_num(xm) - jnp.nan_to_num(ym)))


def _mean_sq(x: jnp.ndarray, count) -> jnp.ndarray:
    """mean(x**2) over valid positions. ``count`` (static int) = valid
    positions per [batch, channel] slice for plane-major fused-MRD outputs
    (invalid positions are exactly zero, so only the divisor changes);
    None = dense tensor, plain mean."""
    if count is None:
        return jnp.mean(x.astype(jnp.float32) ** 2)
    B, c = x.shape[0], x.shape[1]
    return jnp.sum(x.astype(jnp.float32) ** 2) / (B * c * count)


def _mean_sq_minus1(x: jnp.ndarray, count) -> jnp.ndarray:
    """mean((x-1)**2) over valid positions. Invalid positions hold exactly
    0 and would each contribute 1 to the sum — subtract them in closed
    form instead of carrying a mask array."""
    if count is None:
        return jnp.mean((x.astype(jnp.float32) - 1.0) ** 2)
    B, c = x.shape[0], x.shape[1]
    total = int(np.prod(x.shape[2:]))
    s = jnp.sum((x.astype(jnp.float32) - 1.0) ** 2) - B * c * (total - count)
    return s / (B * c * count)


def generator_adversarial_loss(
    logits: List[jnp.ndarray], valid_counts=None
) -> jnp.ndarray:
    """LSGAN generator loss: push fake logits to 0 (the reference's inverted
    label convention, `train_decoder.py:116-118`). ``valid_counts``: per
    logit, None (dense) or the static valid-position count (plane-major
    fused-MRD outputs, `ops/mrd_planes.py`)."""
    counts = valid_counts or [None] * len(logits)
    loss = 0.0
    for logit, cnt in zip(logits, counts):
        loss += _mean_sq(logit, cnt) / len(logits)
    return loss


def discriminator_adversarial_loss(
    real_logits: List[jnp.ndarray],
    fake_logits: List[jnp.ndarray],
    valid_counts=None,
) -> jnp.ndarray:
    """LSGAN discriminator loss: real -> 0, fake -> 1
    (reference `train_decoder.py:140-149`)."""
    counts = valid_counts or [None] * len(real_logits)
    loss = 0.0
    for logit, cnt in zip(real_logits, counts):
        loss += _mean_sq(logit, cnt) / len(real_logits)
    for logit, cnt in zip(fake_logits, counts):
        loss += _mean_sq_minus1(logit, cnt) / len(fake_logits)
    return loss


def feature_matching_loss(
    real_feats: List[jnp.ndarray],
    fake_feats: List[jnp.ndarray],
    valid_counts=None,
) -> jnp.ndarray:
    """L1 between discriminator feature maps (reference
    `train_decoder.py:119-121`). Plane-major fused-MRD maps hold exact
    zeros at invalid positions in BOTH operands, so only the mean's
    divisor changes (``valid_counts`` entries, static ints)."""
    counts = valid_counts or [None] * len(real_feats)
    loss = 0.0
    for r, f, cnt in zip(real_feats, fake_feats, counts):
        if cnt is None:
            loss += jnp.mean(jnp.abs(r - f)) / len(real_feats)
        else:
            B, c = r.shape[0], r.shape[1]
            loss += jnp.sum(
                jnp.abs(r.astype(jnp.float32) - f.astype(jnp.float32))
            ) / (B * c * cnt) / len(real_feats)
    return loss
