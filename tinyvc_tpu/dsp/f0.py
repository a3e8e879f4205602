"""Fundamental-frequency estimation, batched on device.

The reference labels training data with WORLD (dio/harvest via pyworld C++)
or a pretrained torchfcpe net — per-utterance CPU/numpy round-trips
(`module/utils/f0_estimation.py:12-74`). The TPU-native default here is a
batched YIN (de Cheveigné & Kawahara 2002): FFT-based difference function,
cumulative-mean normalisation, absolute threshold with parabolic refinement
— the whole batch in one jitted program, no host round-trips.

F0 labels only affect training; the inference parity path never calls this
(f0 always comes from the encoder's pitch head, `module/infer/generator.py`).
The dispatcher keeps the reference's algorithm names: 'dio'/'harvest' route
to pyworld when installed, 'fcpe' to torchfcpe when installed, otherwise a
clear error pointing at 'yin'.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .interp import linear_interp_last


def _frame_centered(x: jnp.ndarray, window: int, hop: int) -> jnp.ndarray:
    """[B, L] -> [B, F, window] frames centred every ``hop`` (reflect-padded).

    Gather-free: a fancy-index gather runs ~600 MB/s on TPU (the repo's #1
    measured pathology); instead drop the first ``hop // 2`` samples of the
    padded signal so frame ``i`` starts at ``i * hop`` exactly, reshape into
    hop-sized blocks, and build frames from ``ceil(window / hop)`` shifted
    unit-step block views (same trick as ``dsp/stft.py::_frame``).
    """
    B, L = x.shape
    F = L // hop
    pad = window // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    # frame centres at (i + 0.5) * hop -> starts at i * hop after this shift
    xp = xp[:, hop // 2 :]
    ratio = -(-window // hop)  # ceil: blocks each frame spans
    need = (F - 1 + ratio) * hop
    if xp.shape[1] < need:
        xp = jnp.pad(xp, ((0, 0), (0, need - xp.shape[1])))
    blocks = xp[:, :need].reshape(B, -1, hop)  # [B, F-1+ratio, hop]
    views = [blocks[:, r : r + F] for r in range(ratio)]
    frames = jnp.concatenate(views, axis=-1).reshape(B, F, ratio * hop)
    return frames[:, :, :window]


@functools.partial(
    jax.jit, static_argnames=("sample_rate", "hop", "window", "fmin", "fmax")
)
def yin(
    wf: jnp.ndarray,
    sample_rate: int = 24000,
    hop: int = 480,
    window: int = 2048,
    fmin: float = 20.0,
    fmax: float = 1500.0,
    threshold: float = 0.15,
) -> jnp.ndarray:
    """wf [B, L] -> f0 [B, L // hop] in Hz (0 where unvoiced)."""
    tau_max = int(sample_rate / fmin)
    tau_min = max(int(sample_rate / fmax), 2)
    assert window > tau_max, "window must exceed the largest lag"

    frames = _frame_centered(wf.astype(jnp.float32), window, hop)  # [B,F,W]
    B, F, W = frames.shape

    # difference function via FFT autocorrelation:
    # d(tau) = e(0) + e(tau) - 2 acf(tau), restricted to the first W-tau_max
    # samples so every lag sums the same number of terms.
    n = W
    sub = frames[:, :, : n - tau_max]
    # energy terms
    csum = jnp.cumsum(frames * frames, axis=-1)
    e0 = csum[:, :, n - tau_max - 1]  # sum_{0..n-tau_max-1} x^2
    # e(tau) = sum_{tau .. tau + n - tau_max - 1} x^2
    total = jnp.pad(csum, ((0, 0), (0, 0), (1, 0)))
    taus = jnp.arange(tau_max + 1)
    e_tau = (
        total[:, :, taus + (n - tau_max)] - total[:, :, taus]
    )  # [B,F,tau_max+1]
    # cross term via FFT correlation of sub against full frame
    fft_len = 2 * n
    Fsub = jnp.fft.rfft(sub, fft_len)
    Ffull = jnp.fft.rfft(frames, fft_len)
    corr = jnp.fft.irfft(jnp.conj(Fsub) * Ffull, fft_len)[:, :, : tau_max + 1]
    d = e0[..., None] + e_tau - 2.0 * corr  # [B, F, tau_max+1]

    # cumulative mean normalised difference
    cum = jnp.cumsum(d[:, :, 1:], axis=-1)
    cmndf = d[:, :, 1:] * jnp.arange(1, tau_max + 1) / jnp.maximum(cum, 1e-9)
    cmndf = jnp.concatenate([jnp.ones((B, F, 1)), cmndf], axis=-1)
    # mask out lags below tau_min
    lag_mask = jnp.arange(tau_max + 1) >= tau_min
    cmndf = jnp.where(lag_mask, cmndf, jnp.inf)

    below = cmndf < threshold
    any_below = jnp.any(below, axis=-1)
    first_below = jnp.argmax(below, axis=-1)
    # descend from the threshold crossing to the local minimum: the first lag
    # >= first_below where cmndf stops decreasing (canonical YIN step 4)
    rising = jnp.concatenate(
        [
            cmndf[:, :, 1:] >= cmndf[:, :, :-1],
            jnp.ones((B, F, 1), dtype=bool),
        ],
        axis=-1,
    )
    after = jnp.arange(tau_max + 1) >= first_below[..., None]
    local_min = jnp.argmax(rising & after, axis=-1)
    best = jnp.argmin(cmndf, axis=-1)
    tau0 = jnp.where(any_below, local_min, best)

    # local minimum refinement: from the first-below point walk to the local
    # minimum (approximate: take min of the 3 neighbours), then parabolic fit
    def gather(off):
        return jnp.take_along_axis(
            cmndf, jnp.clip(tau0 + off, 0, tau_max)[..., None], axis=-1
        )[..., 0]

    dm1, d0, dp1 = gather(-1), gather(0), gather(1)
    denom = dm1 + dp1 - 2.0 * d0
    delta = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (dm1 - dp1) / denom, 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    tau = tau0.astype(jnp.float32) + delta

    f0 = sample_rate / jnp.maximum(tau, 1.0)
    voiced = any_below & (f0 >= fmin) & (f0 <= fmax)
    # silence gate: tiny frames are unvoiced
    frame_rms = jnp.sqrt(jnp.mean(frames * frames, axis=-1))
    voiced = voiced & (frame_rms > 1e-4)
    return jnp.where(voiced, f0, 0.0)


def estimate_f0(
    wf: jnp.ndarray,
    sample_rate: int = 24000,
    segment_size: int = 480,
    algorithm: str = "yin",
) -> jnp.ndarray:
    """wf [B, L] -> f0 [B, L // segment_size] (API shape mirrors
    `module/utils/f0_estimation.py:66-74`)."""
    L = wf.shape[-1]
    frames = L // segment_size
    if algorithm == "yin":
        f0 = yin(wf, sample_rate=sample_rate, hop=segment_size)
        return linear_interp_last(f0, frames)
    if algorithm in ("dio", "harvest"):
        try:
            import pyworld as pw  # noqa: F401
        except ImportError as e:
            raise ImportError(
                f"algorithm={algorithm!r} needs pyworld (not installed); "
                "use algorithm='yin' (TPU-native, batched) instead"
            ) from e
        return _estimate_f0_pyworld(wf, sample_rate, segment_size, algorithm)
    if algorithm == "fcpe":
        try:
            from torchfcpe import spawn_bundled_infer_model  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "algorithm='fcpe' needs torchfcpe (not installed); "
                "use algorithm='yin' instead"
            ) from e
        return _estimate_f0_fcpe(wf, sample_rate, segment_size)
    raise ValueError(f"unknown f0 algorithm {algorithm!r}")


def _estimate_f0_pyworld(wf, sample_rate, segment_size, algorithm):
    """Host fallback matching `module/utils/f0_estimation.py:12-48`."""
    import pyworld as pw

    out = []
    arr = np.asarray(wf, dtype=np.float64)
    for sig in arr:
        if algorithm == "dio":
            _f0, t = pw.dio(sig, sample_rate, f0_floor=20, f0_ceil=20000)
            f0 = pw.stonemask(sig, _f0, t, sample_rate)
        else:
            f0, _ = pw.harvest(sig, sample_rate, f0_floor=20, f0_ceil=20000)
        out.append(f0.astype(np.float32))
    f0 = jnp.asarray(np.stack(out))
    return linear_interp_last(f0, wf.shape[-1] // segment_size)


_fcpe_model = None


def _estimate_f0_fcpe(wf, sample_rate, segment_size):
    """Host fallback matching `module/utils/f0_estimation.py:51-63`."""
    global _fcpe_model
    import torch
    from torchfcpe import spawn_bundled_infer_model

    if _fcpe_model is None:
        _fcpe_model = spawn_bundled_infer_model(torch.device("cpu"))
    t = torch.from_numpy(np.asarray(wf, dtype=np.float32))
    f0 = _fcpe_model.infer(t.unsqueeze(2), sample_rate).transpose(1, 2)
    f0 = jnp.asarray(f0.numpy()[:, 0, :])
    return linear_interp_last(f0, wf.shape[-1] // segment_size)
