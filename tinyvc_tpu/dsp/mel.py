"""Log-mel spectrogram — the parity metric of this framework.

Spec: the reference's ``torchaudio.transforms.MelSpectrogram`` with sr 24000,
n_fft 1024, hop 256, 80 mels (`module/utils/loss.py:41-54`) and torchaudio
defaults: power 2.0, HTK mel scale, no filterbank norm, centre/reflect
padding, periodic hann window, frame 0 *kept*.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .stft import stft_magnitude


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    sample_rate: int = 24000,
    n_fft: int = 1024,
    n_mels: int = 80,
    f_min: float = 0.0,
    f_max: float | None = None,
) -> np.ndarray:
    """Triangular HTK filterbank ``[n_fft//2+1, n_mels]`` (torchaudio-compatible)."""
    if f_max is None:
        f_max = sample_rate / 2.0
    n_bins = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sample_rate // 2, n_bins)
    m_pts = np.linspace(_hz_to_mel(f_min), _hz_to_mel(f_max), n_mels + 2)
    f_pts = _mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_bins, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def mel_spectrogram(
    wave: jnp.ndarray,
    sample_rate: int = 24000,
    n_fft: int = 1024,
    hop: int = 256,
    n_mels: int = 80,
) -> jnp.ndarray:
    """wave ``[B, L]`` -> power mel ``[B, F, n_mels]`` (F = L//hop + 1)."""
    mag = stft_magnitude(wave, n_fft, hop, drop_first=False, grad_safe=True)
    power = mag * mag
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels))
    return power @ fb


def log_mel_spectrogram(
    wave: jnp.ndarray,
    sample_rate: int = 24000,
    n_fft: int = 1024,
    hop: int = 256,
    n_mels: int = 80,
    eps: float = 1e-6,
) -> jnp.ndarray:
    return jnp.log(
        mel_spectrogram(wave, sample_rate, n_fft, hop, n_mels) + eps
    )
