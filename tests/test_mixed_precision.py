"""Mixed-precision serving profile: mel-level parity bound vs the reference.

The serving config runs the vocoder's conv stacks in bf16 (encoder and
retrieval stay fp32 — bf16 content features flip kNN neighbours). This test
enforces the documented bound: mel deviation within 3x the fp32 baseline
and below an absolute ceiling.
"""

import pytest

pytestmark = pytest.mark.slow  # long tier; quick tier: -m "not slow"

import math

import numpy as np
import torch

import jax
import jax.numpy as jnp

from module.tinyvc import Decoder as RefDecoder
from module.tinyvc import Encoder as RefEncoder

from tests.test_pipeline import _ref_convert
from tinyvc_tpu.config import TinyVCConfig, serving_config
from tinyvc_tpu.dsp import log_mel_spectrogram
from tinyvc_tpu.infer.generator import convert_fn
from tinyvc_tpu.models import Decoder, Encoder
from tinyvc_tpu.utils.torch_compat import (
    decoder_params_from_torch,
    encoder_params_from_torch,
)


def _run(cfg, ref_enc, ref_dec, wave, tgt, angle):
    encoder = Encoder(cfg.encoder)
    decoder = Decoder(cfg.decoder, cfg.audio)
    enc_p = {"params": encoder_params_from_torch(ref_enc.state_dict())}
    dec_p = {"params": decoder_params_from_torch(ref_dec.state_dict())}
    out = convert_fn(
        encoder, decoder, enc_p, dec_p, jnp.asarray(wave),
        jnp.asarray(np.transpose(tgt, (0, 2, 1))), jnp.float32(2.0),
        jax.random.PRNGKey(0), cfg,
        noise_angle=jnp.asarray(np.transpose(angle, (0, 2, 1))),
    )
    return np.asarray(out)


def test_serving_profile_mel_parity(rng):
    torch.manual_seed(3)
    ref_enc = RefEncoder().eval()
    ref_dec = RefDecoder().eval()
    B, L, N = 1, 48000, 512
    F = L // 480
    wave = (rng.standard_normal((B, L)) * 0.1).astype(np.float32)
    tgt = rng.standard_normal((1, 768, N)).astype(np.float32)
    angle = rng.uniform(-math.pi, math.pi, (B, 961, F)).astype(np.float32)

    ref_out = _ref_convert(
        ref_enc, ref_dec, torch.from_numpy(wave), torch.from_numpy(tgt),
        2.0, torch.from_numpy(angle),
    ).numpy()
    mel_ref = np.asarray(log_mel_spectrogram(jnp.asarray(ref_out)))

    out_fp32 = _run(TinyVCConfig(), ref_enc, ref_dec, wave, tgt, angle)
    out_serv = _run(serving_config(), ref_enc, ref_dec, wave, tgt, angle)

    l1_fp32 = np.abs(
        np.asarray(log_mel_spectrogram(jnp.asarray(out_fp32))) - mel_ref
    ).mean()
    l1_serv = np.abs(
        np.asarray(log_mel_spectrogram(jnp.asarray(out_serv))) - mel_ref
    ).mean()
    assert l1_serv < max(3.0 * l1_fp32, 1e-3), (l1_serv, l1_fp32)
    assert l1_serv < 0.03, l1_serv

    # production serving additionally runs the fused bf16 DFT-matmul
    # spectrogram (auto-engaged on TPU); same mel bound must hold with it
    import dataclasses

    cfg_spec = serving_config()
    cfg_spec = dataclasses.replace(
        cfg_spec, audio=dataclasses.replace(
            cfg_spec.audio, spectrogram_impl="pallas"
        )
    )
    out_spec = _run(cfg_spec, ref_enc, ref_dec, wave, tgt, angle)
    l1_spec = np.abs(
        np.asarray(log_mel_spectrogram(jnp.asarray(out_spec))) - mel_ref
    ).mean()
    assert l1_spec < max(3.0 * l1_fp32, 1e-3), (l1_spec, l1_fp32)
    assert l1_spec < 0.03, l1_spec


def test_bf16_discriminator_gradient_fidelity(rng):
    """bf16 discriminator compute (the reference's `-fp16` AMP analogue,
    `train_decoder.py:80,100`; benchmarks/train_bench.py gan-post-bf16d)
    must produce gradients aligned with the fp32 ones — both the
    discriminator-parameter grads (D step) and the grad w.r.t. the fake
    waveform (the adversarial signal into G)."""
    import dataclasses

    from tinyvc_tpu.config import DiscriminatorConfig
    from tinyvc_tpu.models.discriminator import Discriminator
    from tinyvc_tpu.train.losses import (
        discriminator_adversarial_loss,
        generator_adversarial_loss,
    )

    B, L = 2, 8000
    real = jnp.asarray((rng.standard_normal((B, L)) * 0.1).astype(np.float32))
    fake = jnp.asarray((rng.standard_normal((B, L)) * 0.1).astype(np.float32))

    def grads(dtype):
        disc = Discriminator(
            dataclasses.replace(DiscriminatorConfig(), compute_dtype=dtype)
        )
        params = disc.init(jax.random.PRNGKey(0), real)

        def d_loss(p):
            lr, _ = disc.apply(p, real)
            lf, _ = disc.apply(p, fake)
            return discriminator_adversarial_loss(lr, lf)

        def g_adv(x):
            lf, _ = disc.apply(params, x)
            return generator_adversarial_loss(lf)

        return jax.grad(d_loss)(params), jax.grad(g_adv)(fake)

    (d32, g32), (d16, g16) = grads("float32"), grads("bfloat16")

    def cos(a, b):
        a = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(a)])
        b = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(b)])
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))

    assert np.all(np.isfinite(np.asarray(g16)))
    assert cos(d32, d16) > 0.99, cos(d32, d16)
    assert cos(g32, g16) > 0.98, cos(g32, g16)


def test_fused_filter_serving_mel_parity(rng):
    """The fused Pallas U-Net serving path (interpret mode on CPU) must hold
    the same mel-parity bound vs the PyTorch reference — including its
    edge-replicated-halo deviation at utterance ends."""
    import dataclasses

    torch.manual_seed(3)
    ref_enc = RefEncoder().eval()
    ref_dec = RefDecoder().eval()
    B, L, N = 1, 48000, 512
    F = L // 480
    wave = (rng.standard_normal((B, L)) * 0.1).astype(np.float32)
    tgt = rng.standard_normal((1, 768, N)).astype(np.float32)
    angle = rng.uniform(-math.pi, math.pi, (B, 961, F)).astype(np.float32)

    ref_out = _ref_convert(
        ref_enc, ref_dec, torch.from_numpy(wave), torch.from_numpy(tgt),
        2.0, torch.from_numpy(angle),
    ).numpy()
    mel_ref = np.asarray(log_mel_spectrogram(jnp.asarray(ref_out)))

    out_fp32 = _run(TinyVCConfig(), ref_enc, ref_dec, wave, tgt, angle)
    cfg_fused = serving_config()
    cfg_fused = dataclasses.replace(
        cfg_fused,
        decoder=dataclasses.replace(cfg_fused.decoder, use_fused_filter="on"),
    )
    out_fused = _run(cfg_fused, ref_enc, ref_dec, wave, tgt, angle)

    l1_fp32 = np.abs(
        np.asarray(log_mel_spectrogram(jnp.asarray(out_fp32))) - mel_ref
    ).mean()
    l1_fused = np.abs(
        np.asarray(log_mel_spectrogram(jnp.asarray(out_fused))) - mel_ref
    ).mean()
    assert l1_fused < max(3.0 * l1_fp32, 1e-3), (l1_fused, l1_fp32)
    assert l1_fused < 0.03, l1_fused
