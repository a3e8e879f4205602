"""STFT / ISTFT built for XLA on TPU.

Behavioural spec is the reference's use of ``torch.stft`` / ``torch.istft``:

- `module/utils/spectrogram.py:8-15`: hann window (periodic), ``center=True``
  with reflect padding, magnitude, computed in fp32, and **frame 0 dropped**
  so a length-L waveform yields exactly ``L // hop`` frames.
- `module/tinyvc/decoder.py:63-85`: ``torch.istft(n_fft=1920, hop=480)`` for
  the noise branch (hann synthesis window, centre-trimmed, window-envelope
  normalised).

Design: every STFT in this framework has ``n_fft == 4 * hop`` (main 1920/480,
mel 1024/256, multi-scale loss 4s/s, MRD 4r/r). Framing is therefore a
reshape into hop-sized blocks plus a stack of 4 shifted views, and
overlap-add is 4 shifted adds — no gathers, no scatters, fully fusable by
XLA. Layout is time-major: frames are ``[B, F, n_fft]`` and spectra
``[B, F, n_fft//2+1]`` so the FFT axis rides the TPU lane dimension.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def hann_window(n_fft: int) -> np.ndarray:
    """Periodic hann window, identical to ``torch.hann_window(n_fft)``."""
    n = np.arange(n_fft)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))).astype(np.float32)


def _frame(x: jnp.ndarray, n_fft: int, hop: int, drop_first: bool) -> jnp.ndarray:
    """Frame ``[B, L]`` into ``[B, F, n_fft]`` with centre (reflect) padding.

    With ``center=True`` torch produces ``1 + L // hop`` frames; ``drop_first``
    removes frame 0 (the reference's `spec[:, :, 1:]` convention,
    `module/utils/spectrogram.py:13`).
    """
    assert n_fft % hop == 0, "framework invariant: n_fft must be a multiple of hop"
    ratio = n_fft // hop
    B, L = x.shape
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    # pad tail with zeros to a whole number of hop blocks
    total = x.shape[1]
    rem = (-total) % hop
    if rem:
        x = jnp.pad(x, ((0, 0), (0, rem)))
    blocks = x.reshape(B, -1, hop)  # [B, nb, hop]
    n_frames = 1 + L // hop
    start = 1 if drop_first else 0
    f = n_frames - start
    # frame t (t counted after start) covers blocks [start+t : start+t+ratio]
    views = [blocks[:, start + r : start + r + f] for r in range(ratio)]
    return jnp.concatenate(views, axis=-1).reshape(B, f, n_fft)


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop: int,
    drop_first: bool = False,
) -> jnp.ndarray:
    """Complex STFT of ``[B, L]`` -> ``[B, F, n_fft//2+1]`` (fp32 internally)."""
    frames = _frame(x.astype(jnp.float32), n_fft, hop, drop_first)
    frames = frames * jnp.asarray(hann_window(n_fft))
    return jnp.fft.rfft(frames, axis=-1)


_MAG_EPS = 1e-24  # inside the sqrt: shifts magnitudes by <= 1e-12 absolute


def _safe_magnitude(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    """sqrt(re^2 + im^2 + eps): gradient-safe at silence.

    The bare sqrt's gradient is re/|y|. TPUs flush subnormals to zero, so a
    quiet frame with |re|,|im| < ~1e-19 squares to EXACT zero and the
    gradient is re/0 = inf — one silent-learned frame then NaNs the whole
    step through clip_by_global_norm (round-4 burn-in: all 4.66M generator
    params NaN'd between steps 10-30, TPU-only, exactly when the dsp loss
    got small; confirmed by per-subtree grad instrumentation — filter_net
    AND source_net went nonfinite in the same step while both losses were
    still finite). CPU honours subnormals, which is why the parity suite
    never sees it. The reference hits the same class of issue and zeroes
    NaN/Inf magnitudes after the fact (`module/utils/loss.py:32-35`); an
    epsilon inside the sqrt fixes the gradient itself.

    Used at GRADIENT-BEARING magnitude sites only (training losses,
    discriminator spectrograms): the serving/encoder-input `spectrogram`
    keeps the exact bare magnitude — no gradients flow there, and the
    ~1e-12 shift is enough to flip a kNN neighbour on near-tied frames
    (the retrieval path is deliberately bit-stable)."""
    return jnp.sqrt(re * re + im * im + _MAG_EPS)


def stft_magnitude(
    x: jnp.ndarray, n_fft: int, hop: int, drop_first: bool = False,
    grad_safe: bool = False,
) -> jnp.ndarray:
    y = stft(x, n_fft, hop, drop_first=drop_first)
    if grad_safe:
        return _safe_magnitude(jnp.real(y), jnp.imag(y))
    return jnp.abs(y)


@functools.lru_cache(maxsize=None)
def _windowed_dft(n_fft: int) -> np.ndarray:
    """``[n_fft, 2*bins]`` (cos | -sin) real-DFT matrix with the hann
    window folded in: ``|rfft(w * f)| == mag(f @ D)``."""
    bins = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(bins, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    d = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1)
    return (hann_window(n_fft)[:, None].astype(np.float64) * d).astype(
        np.float32
    )


def stft_magnitude_matmul(
    x: jnp.ndarray,
    n_fft: int,
    hop: int,
    drop_first: bool = False,
    dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """Magnitude STFT as frames @ windowed-DFT matrix (fp32 accumulation).

    On TPU this lands on the MXU and differentiates into two more matmuls,
    where ``jnp.fft.rfft`` + its transpose dominated the GAN step's loss
    time (multi-scale loss: 7.2 of 46 ms, profiled). bf16 operands cost
    ~3 decimal digits on a GAN training loss; parity tests use the exact
    rfft path."""
    frames = _frame(x.astype(jnp.float32), n_fft, hop, drop_first)
    d = jnp.asarray(_windowed_dft(n_fft))
    y = jnp.einsum(
        "bfn,nk->bfk",
        frames.astype(dtype),
        d.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    bins = n_fft // 2 + 1
    re, im = y[..., :bins], y[..., bins:]
    return _safe_magnitude(re, im)


def spectrogram(x: jnp.ndarray, n_fft: int = 1920, hop: int = 480) -> jnp.ndarray:
    """Magnitude spectrogram with the reference's dropped-frame-0 convention.

    x: ``[B, L]`` with L a multiple of ``hop``. Returns ``[B, L//hop, fft_bin]``
    cast back to the input dtype (reference computes in fp32 then casts back,
    `module/utils/spectrogram.py:9-14`).
    """
    dtype = x.dtype
    return stft_magnitude(x, n_fft, hop, drop_first=True).astype(dtype)


def istft(spec: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Inverse STFT matching ``torch.istft(..., center=True, length=None)``.

    spec: complex ``[B, F, n_fft//2+1]``. Returns ``[B, (F-1)*hop]`` fp32.
    Hann synthesis window, overlap-add, window-envelope normalisation, and
    centre trim of ``n_fft//2`` per side.
    """
    assert n_fft % hop == 0
    ratio = n_fft // hop
    B, F, _ = spec.shape
    win = jnp.asarray(hann_window(n_fft))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * win  # [B, F, n_fft]
    frames = frames.reshape(B, F, ratio, hop)

    # overlap-add: output block j receives frame i's sub-block (j - i) for
    # j - i in [0, ratio). Four shifted adds instead of a scatter.
    nb = F + ratio - 1
    out = jnp.zeros((B, nb, hop), dtype=frames.dtype)
    for r in range(ratio):
        out = out.at[:, r : r + F].add(frames[:, :, r])
    y = out.reshape(B, nb * hop)

    # window envelope (sum of squared windows), same overlap-add on a [1,...]
    w2 = (win * win).reshape(1, 1, ratio, hop)
    env = jnp.zeros((1, nb, hop), dtype=frames.dtype)
    for r in range(ratio):
        env = env.at[:, r : r + F].add(jnp.broadcast_to(w2[:, 0, r], (1, F, hop)))
    env = env.reshape(1, nb * hop)

    pad = n_fft // 2
    length = (F - 1) * hop
    y = y[:, pad : pad + length]
    env = env[:, pad : pad + length]
    return y / jnp.maximum(env, 1e-11)
