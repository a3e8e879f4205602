"""Polyphase sample-rate conversion.

TPU-native replacement for ``torchaudio.functional.resample`` (used by the
reference at `preprocess.py:47-49`, `train_encoder.py:79`,
`infer.py:44,62`): windowed-sinc low-pass at the rational ratio L/M,
expressed as a strided conv so XLA can fuse/tile it. Defaults mirror
torchaudio's (lowpass_filter_width=6, rolloff 0.99, Hann window).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _kernel(
    orig_freq: int, new_freq: int, lowpass_filter_width: int = 6, rolloff: float = 0.99
):
    """Polyphase filter bank [L_out_phases, width] (numpy, cached)."""
    gcd = math.gcd(orig_freq, new_freq)
    orig = orig_freq // gcd
    new = new_freq // gcd
    base_freq = min(orig, new) * rolloff / 2.0  # cutoff in cycles/sample @ orig rate?
    # torchaudio: base_freq = min(orig_freq, new_freq) * rolloff / 2 in Hz with
    # freqs normalised by orig_freq; reproduce its construction:
    width = int(math.ceil(lowpass_filter_width * orig / (min(orig, new) * rolloff)))
    idx = np.arange(-width, width + orig, dtype=np.float64)[None] / orig
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx
    cutoff = min(orig, new) * rolloff / 2.0
    t = t * 2 * cutoff  # normalised to cutoff
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    scale = 2 * cutoff / orig
    with np.errstate(invalid="ignore"):
        sinc = np.where(t == 0, 1.0, np.sin(np.pi * t) / (np.pi * t))
    kernels = sinc * window * scale
    return kernels.astype(np.float32), orig, new, width


def resample(x: jnp.ndarray, orig_freq: int, new_freq: int) -> jnp.ndarray:
    """x: [..., T] -> [..., ceil(T * new / orig)] (torchaudio-compatible)."""
    if orig_freq == new_freq:
        return x
    kernels, orig, new, width = _kernel(orig_freq, new_freq)
    shape = x.shape
    T = shape[-1]
    x2 = x.reshape(-1, T).astype(jnp.float32)
    x2 = jnp.pad(x2, ((0, 0), (width, width + orig)))
    # conv with stride `orig`; each of the `new` phases is an output channel
    k = jnp.asarray(kernels)[:, None, :]  # [new, 1, W] OIH
    y = jax.lax.conv_general_dilated(
        x2[:, None, :],  # NCH
        k,
        window_strides=(orig,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # [B, new, T//orig + 1]
    y = jnp.swapaxes(y, 1, 2).reshape(x2.shape[0], -1)
    target_len = int(math.ceil(T * new / orig))
    y = y[:, :target_len]
    return y.reshape(*shape[:-1], target_len).astype(x.dtype)
