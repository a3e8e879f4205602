"""Parity tests for the DSP layer against PyTorch op semantics.

Each test implements the reference behaviour directly with torch primitives
(the same calls the reference makes) and checks our JAX implementation
matches. The tricky conventions covered: torch.stft centre/reflect padding +
dropped frame 0, torch.istft synthesis normalisation, interpolate
align_corners=False, max_pool1d -inf padding.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from tinyvc_tpu.dsp import (
    estimate_energy,
    istft,
    linear_interp_last,
    mel_filterbank,
    shift_frequency,
    spectrogram,
    stft_magnitude,
    upsample_frames_to_samples,
)


def test_spectrogram_matches_torch_stft(rng):
    L = 4800
    x = rng.standard_normal((2, L)).astype(np.float32)
    # oracle: module/utils/spectrogram.py:8-15
    w = torch.hann_window(1920)
    ref = torch.stft(
        torch.from_numpy(x), 1920, 480, window=w, return_complex=True
    ).abs()[:, :, 1:]
    ours = spectrogram(jnp.asarray(x), 1920, 480)
    ref_ntc = np.transpose(ref.numpy(), (0, 2, 1))  # [B, F, bins]
    assert ours.shape == ref_ntc.shape == (2, 10, 961)
    np.testing.assert_allclose(np.asarray(ours), ref_ntc, atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize("n_fft,hop", [(1024, 256), (128, 32), (2048, 512)])
def test_stft_magnitude_no_drop(rng, n_fft, hop):
    L = hop * 20
    x = rng.standard_normal((1, L)).astype(np.float32)
    w = torch.hann_window(n_fft)
    ref = torch.stft(
        torch.from_numpy(x), n_fft, hop, window=w, return_complex=True
    ).abs()
    ours = stft_magnitude(jnp.asarray(x), n_fft, hop, drop_first=False)
    np.testing.assert_allclose(
        np.asarray(ours), np.transpose(ref.numpy(), (0, 2, 1)), atol=2e-3, rtol=1e-4
    )


def test_istft_matches_torch(rng):
    # oracle: the exact call in module/tinyvc/decoder.py:82 (torch.istft)
    B, F, bins = 2, 11, 961
    re = rng.standard_normal((B, F, bins)).astype(np.float32)
    im = rng.standard_normal((B, F, bins)).astype(np.float32)
    spec = re + 1j * im
    w = torch.hann_window(1920)
    t_spec = torch.from_numpy(np.transpose(spec, (0, 2, 1)))  # [B, bins, F]
    ref = torch.istft(t_spec, 1920, 480, window=w)
    ours = istft(jnp.asarray(spec), 1920, 480)
    assert ours.shape == tuple(ref.shape) == (B, (F - 1) * 480)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("li,lo", [(10, 4800), (10, 100), (100, 10), (7, 13)])
def test_linear_interp_matches_torch(rng, li, lo):
    x = rng.standard_normal((2, 3, li)).astype(np.float32)
    ref = TF.interpolate(torch.from_numpy(x), lo, mode="linear")
    ours = linear_interp_last(jnp.asarray(x), lo)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5, rtol=1e-5)


def test_upsample_frames_matches_torch_scale_factor(rng):
    x = rng.standard_normal((2, 15, 10)).astype(np.float32)  # [B, C, F] torch side
    ref = TF.interpolate(torch.from_numpy(x), scale_factor=480, mode="linear")
    ours = upsample_frames_to_samples(jnp.asarray(np.transpose(x, (0, 2, 1))), 480)
    np.testing.assert_allclose(
        np.asarray(ours), np.transpose(ref.numpy(), (0, 2, 1)), atol=1e-5, rtol=1e-5
    )


def test_estimate_energy_matches_torch(rng):
    # oracle: module/utils/energy_estimation.py:9-14
    L = 4800
    x = rng.standard_normal((2, L)).astype(np.float32)
    t = torch.from_numpy(x)
    ref = TF.max_pool1d(t.abs().unsqueeze(1), 128, 64, 32)
    ref = TF.interpolate(ref, L, mode="linear").squeeze(1)
    ours = estimate_energy(jnp.asarray(x), 64)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5, rtol=1e-5)


def test_shift_frequency_matches_torch(rng):
    # oracle: module/utils/pitch_shift.py:5-15
    f0 = np.abs(rng.standard_normal((2, 10)).astype(np.float32)) * 200
    f0[0, :3] = 0.0  # unvoiced
    t = torch.from_numpy(f0)
    pitch = torch.log2(TF.relu(t / 440) + 1e-6) * 12 + 69
    ref = 440 * 2 ** ((pitch + 12) - 69) / 2 ** 0  # shift 12
    ref = 440 * 2 ** (((pitch + 12) - 69) / 12)
    ours = shift_frequency(jnp.asarray(f0), 12.0)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4)
    # unvoiced stays ~0
    assert np.all(np.asarray(ours)[0, :3] < 1e-3)


def test_mel_filterbank_htk_shape_and_partition():
    fb = mel_filterbank(24000, 1024, 80)
    assert fb.shape == (513, 80)
    # every mel filter has positive mass; interior bins are covered
    assert (fb.sum(axis=0) > 0).all()
    assert fb.min() >= 0.0


def test_hierarchical_phase_prefix_long_utterance(rng):
    """>10-minute utterances must not detune: the two-level mod-1 prefix
    stays within ~1e-4 cycles of a float64 oracle where a flat fp32 cumsum
    drifts orders of magnitude more (VERDICT round 1, item 8)."""
    import jax.numpy as jnp

    from tinyvc_tpu.dsp.phase import wrapped_exclusive_prefix

    F = 200_000  # ~66 minutes of 20 ms frames
    fs = (rng.uniform(0.0, 1.0, F)).astype(np.float32)  # per-frame cycles mod 1

    oracle = np.cumsum(fs.astype(np.float64)) - fs  # exclusive, float64
    oracle_mod = np.mod(oracle, 1.0)

    ours = np.asarray(wrapped_exclusive_prefix(jnp.asarray(fs)[None])[0])
    err = np.abs(ours - oracle_mod)
    err = np.minimum(err, 1.0 - err)  # cyclic distance
    assert err.max() < 1e-4, err.max()

    # the flat fp32 cumsum this replaces would fail the same bound
    flat = np.mod(np.cumsum(fs) - fs, 1.0)
    err_flat = np.abs(flat - oracle_mod)
    err_flat = np.minimum(err_flat, 1.0 - err_flat)
    assert err_flat.max() > 1e-2


def test_oscillator_no_detune_12_minutes():
    """End-to-end: after 12 minutes of synthesis the oscillator's measured
    frequency error stays far below audibility (<0.01 Hz ~ 0.1 cents at
    220 Hz). The fp32 frame-sum rounding gives a constant sub-audible bias;
    what must NOT happen is the flat-cumsum failure mode, where phase
    quantisation at a large running total warbles the pitch."""
    import jax.numpy as jnp

    from tinyvc_tpu.models.decoder import oscillate_harmonics

    F, hop, sr = 36_000, 480, 24000  # 12 minutes
    f0_hz = 220.37
    f0 = jnp.full((1, F), f0_hz, jnp.float32)
    wave = np.asarray(
        oscillate_harmonics(f0, hop, sr, num_harmonics=0)
    )[0, :, 0].astype(np.float64)

    def demod_phase(pos, win=24000):
        """Phase (cycles) of the f0 component over a 1 s window at pos."""
        n = np.arange(pos, pos + win, dtype=np.float64)
        z = np.sum(wave[pos : pos + win] * np.exp(-2j * np.pi * f0_hz * n / sr))
        return np.angle(z) / (2 * np.pi)

    L = F * hop
    p1, p2 = L // 2, L - 24000  # 6 min and ~12 min
    dphi = demod_phase(p2) - demod_phase(p1)
    dphi -= np.round(dphi)  # cyclic
    detune_hz = abs(dphi) / ((p2 - p1) / sr)
    # NOTE: cyclic ambiguity means detune is measured mod sr/(p2-p1)
    # ~ 7e-3 Hz; the hierarchical prefix's true bias is ~4e-5 Hz. A flat
    # fp32 cumsum at this length quantises phase at ulp(1.6e5 cycles)
    # ~ 0.016 -> ~0.4 Hz wobble, which also destroys window coherence below.
    assert detune_hz < 5e-3, detune_hz

    # window coherence: demodulation magnitude stays near full scale at the
    # end (phase-stable within the 1 s window); warble collapses it
    n = np.arange(p2, p2 + 24000, dtype=np.float64)
    mag = abs(
        np.sum(wave[p2 : p2 + 24000] * np.exp(-2j * np.pi * f0_hz * n / sr))
    ) / (0.5 * 24000)
    assert mag > 0.98, mag
