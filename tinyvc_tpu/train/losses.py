"""Training losses.

Behavioural spec: `module/utils/loss.py:11-68` (multi-scale STFT and log-mel
reconstruction losses) and the LSGAN/feature-matching terms inlined in
`train_decoder.py:113-154`. The reference zeroes NaN/Inf spectrogram entries
(`loss.py:32-35,63-66`); finite inputs never produce them here, but
``nan_to_num`` keeps the same guard semantics under bf16 experiments.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

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
    mag = stft_magnitude if impl == "rfft" else stft_magnitude_matmul
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


def generator_adversarial_loss(logits: List[jnp.ndarray]) -> jnp.ndarray:
    """LSGAN generator loss: push fake logits to 0 (the reference's inverted
    label convention, `train_decoder.py:116-118`)."""
    loss = 0.0
    for logit in logits:
        loss += jnp.mean(logit**2) / len(logits)
    return loss


def discriminator_adversarial_loss(
    real_logits: List[jnp.ndarray], fake_logits: List[jnp.ndarray]
) -> jnp.ndarray:
    """LSGAN discriminator loss: real -> 0, fake -> 1
    (reference `train_decoder.py:140-149`)."""
    loss = 0.0
    for logit in real_logits:
        loss += jnp.mean(logit**2) / len(real_logits)
    for logit in fake_logits:
        loss += jnp.mean((logit - 1.0) ** 2) / len(fake_logits)
    return loss


def feature_matching_loss(
    real_feats: List[jnp.ndarray], fake_feats: List[jnp.ndarray]
) -> jnp.ndarray:
    """L1 between discriminator feature maps (reference `train_decoder.py:119-121`)."""
    loss = 0.0
    for r, f in zip(real_feats, fake_feats):
        loss += jnp.mean(jnp.abs(r - f)) / len(real_feats)
    return loss
