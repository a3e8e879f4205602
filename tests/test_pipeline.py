"""End-to-end VC pipeline parity vs the reference, at waveform and mel level.

The oracle replicates `module/infer/generator.py:25-33` (Generator.convert)
using the reference models + torch primitives (the reference's Generator
itself imports torchaudio-dependent modules, so the pipeline is reassembled
here from its parts, each cited).
"""

import math

import numpy as np
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from module.tinyvc import Decoder as RefDecoder
from module.tinyvc import Encoder as RefEncoder
from module.tinyvc import match_features as ref_match_features

from tinyvc_tpu.config import TinyVCConfig
from tinyvc_tpu.dsp import log_mel_spectrogram
from tinyvc_tpu.infer import VoiceConverter
from tinyvc_tpu.utils.torch_compat import (
    decoder_params_from_torch,
    encoder_params_from_torch,
)


def _ref_convert(enc, dec, wave_t, tgt_t, pitch_shift, angle_t):
    """Reference Generator.convert with injected noise phase."""
    import module.tinyvc.decoder as rd

    with torch.no_grad():
        # spectrogram (module/utils/spectrogram.py:8-15)
        w = torch.hann_window(1920)
        spec = torch.stft(wave_t, 1920, 480, window=w, return_complex=True).abs()[
            :, :, 1:
        ]
        # energy (module/utils/energy_estimation.py:9-14)
        energy = TF.max_pool1d(wave_t.abs().unsqueeze(1), 128, 64, 32)
        energy = TF.interpolate(energy, wave_t.shape[1], mode="linear")
        # encode + match + shift (module/infer/generator.py:28-32)
        z, f0 = enc.infer(spec)
        z = ref_match_features(z, tgt_t)
        pitch = torch.log2(TF.relu(f0 / 440) + 1e-6) * 12 + 69
        f0 = 440 * 2 ** ((pitch + pitch_shift - 69) / 12)
        # decoder with injected phase (module/tinyvc/decoder.py:236-266)
        amps, kernel = dec.source_net(z, f0, energy)
        harmonics = rd.oscillate_harmonics(f0, 480, 24000, 14)
        amps_i = TF.interpolate(amps, scale_factor=480, mode="linear")
        harmonics = harmonics * amps_i
        noise_stft = torch.exp(1j * angle_t) * kernel.float()
        noise_stft = TF.pad(noise_stft, [1, 0])
        noise = torch.istft(noise_stft, 1920, 480, window=torch.hann_window(1920))
        src = torch.cat([harmonics, noise.unsqueeze(1)], dim=1)
        return dec.filter_net(z, f0, energy, src).squeeze(1)


def test_full_pipeline_parity(rng):
    torch.manual_seed(3)
    ref_enc = RefEncoder().eval()
    ref_dec = RefDecoder().eval()

    B, L, N = 1, 4800, 256
    F = L // 480
    wave = (rng.standard_normal((B, L)) * 0.1).astype(np.float32)
    tgt = rng.standard_normal((1, 768, N)).astype(np.float32)
    angle = rng.uniform(-math.pi, math.pi, (B, 961, F)).astype(np.float32)
    pitch_shift = 2.0

    ref_out = _ref_convert(
        ref_enc,
        ref_dec,
        torch.from_numpy(wave),
        torch.from_numpy(tgt),
        pitch_shift,
        torch.from_numpy(angle),
    ).numpy()

    vc = VoiceConverter(
        {"params": encoder_params_from_torch(ref_enc.state_dict())},
        {"params": decoder_params_from_torch(ref_dec.state_dict())},
        TinyVCConfig(),
    )
    from tinyvc_tpu.infer.generator import convert_fn

    out = convert_fn(
        vc.encoder,
        vc.decoder,
        vc.enc_params,
        vc.dec_params,
        jnp.asarray(wave),
        jnp.asarray(np.transpose(tgt, (0, 2, 1))),
        jnp.float32(pitch_shift),
        jax.random.PRNGKey(0),
        vc.cfg,
        noise_angle=jnp.asarray(np.transpose(angle, (0, 2, 1))),
    )
    out = np.asarray(out)

    # waveform-level agreement with identical weights + injected noise phase
    np.testing.assert_allclose(out, ref_out, atol=5e-3, rtol=1e-3)

    # mel-level parity (the BASELINE.json metric). The residual comes from
    # fp32 phase-integration drift in the torch reference (unbounded cumsum,
    # `decoder.py:50`) vs our mod-1-wrapped integrator — ours is the more
    # precise one, so parity is bounded by the reference's own drift.
    mel_ref = np.asarray(log_mel_spectrogram(jnp.asarray(ref_out)))
    mel_ours = np.asarray(log_mel_spectrogram(jnp.asarray(out)))
    assert np.abs(mel_ref - mel_ours).mean() < 3e-3


def test_voice_converter_host_api(rng):
    torch.manual_seed(4)
    ref_enc = RefEncoder().eval()
    ref_dec = RefDecoder().eval()
    vc = VoiceConverter(
        {"params": encoder_params_from_torch(ref_enc.state_dict())},
        {"params": decoder_params_from_torch(ref_dec.state_dict())},
    )
    target_wave = (rng.standard_normal(24000) * 0.1).astype(np.float32)
    tgt = vc.build_dictionary(target_wave)
    assert tgt.shape[1] == 768

    wave = (rng.standard_normal(10000) * 0.1).astype(np.float32)  # non-multiple length
    out = vc.convert(wave, tgt, pitch_shift=0.0)
    assert out.shape == wave.shape
    assert np.isfinite(out).all()

    # one-octave shift (BASELINE config 4: -p 12); pitch_shift is traced, so
    # this reuses the compiled program
    out12 = vc.convert(wave, tgt, pitch_shift=12.0)
    assert out12.shape == wave.shape and np.isfinite(out12).all()
    assert np.abs(out12 - out).max() > 0  # the shift actually does something
