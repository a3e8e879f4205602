"""YIN F0 estimator accuracy tests (the TPU-native labeller; reference
counterpart: `module/utils/f0_estimation.py` via pyworld/fcpe)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tinyvc_tpu.dsp.f0 import estimate_f0, yin


SR = 24000


def _tone(freq, seconds=2.0, amp=0.3):
    t = np.arange(int(SR * seconds)) / SR
    return (np.sin(2 * np.pi * freq * t) * amp).astype(np.float32)


@pytest.mark.parametrize("freq", [80.0, 150.0, 440.0, 800.0])
def test_yin_pure_tone(freq):
    f0 = np.asarray(yin(jnp.asarray(_tone(freq)[None]), SR))
    voiced = f0[0, 5:-5]
    assert (voiced > 0).mean() > 0.95
    est = np.median(voiced[voiced > 0])
    assert abs(est - freq) / freq < 0.01, est


def test_yin_harmonic_rich_tone():
    """Sawtooth-ish signal: strong harmonics must not fool the estimator
    into octave errors."""
    t = np.arange(SR * 2) / SR
    f = 140.0
    x = sum(np.sin(2 * np.pi * f * k * t) / k for k in range(1, 8))
    x = (x / np.abs(x).max() * 0.4).astype(np.float32)
    f0 = np.asarray(yin(jnp.asarray(x[None]), SR))
    est = np.median(f0[0][f0[0] > 0])
    assert abs(est - f) / f < 0.02, est


def test_yin_silence_and_noise_unvoiced(rng):
    silence = np.zeros(SR, np.float32)
    noise = (rng.standard_normal(SR) * 0.1).astype(np.float32)
    batch = np.stack([silence, noise])
    f0 = np.asarray(yin(jnp.asarray(batch), SR))
    assert (f0[0] == 0).all()  # silence entirely unvoiced
    assert (f0[1] == 0).mean() > 0.8  # white noise mostly unvoiced


def test_yin_chirp_tracking():
    L = SR * 2
    f_true = np.linspace(100, 300, L)
    phase = np.cumsum(f_true / SR)
    x = (np.sin(2 * np.pi * phase) * 0.3).astype(np.float32)
    f0 = np.asarray(estimate_f0(jnp.asarray(x[None]), SR, 480))
    frames = np.arange(f0.shape[1])
    f_at_frames = f_true[np.minimum(frames * 480, L - 1)]
    sel = slice(5, -5)
    rel = np.abs(f0[0, sel] - f_at_frames[sel]) / f_at_frames[sel]
    assert np.median(rel) < 0.02


def test_estimate_f0_output_shape_matches_reference_convention(rng):
    # API contract: [B, L] -> [B, L // segment_size]
    # (reference `module/utils/f0_estimation.py:66-74`)
    wf = (rng.standard_normal((3, 48000)) * 0.1).astype(np.float32)
    f0 = estimate_f0(jnp.asarray(wf), SR, 480)
    assert f0.shape == (3, 100)


def test_estimate_f0_unknown_algorithm():
    with pytest.raises(ValueError):
        estimate_f0(jnp.zeros((1, 4800)), SR, 480, algorithm="nope")
