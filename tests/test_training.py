"""Train-step tests: loss decreases, CE semantics, GAN phases both compile."""

import numpy as np
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from tinyvc_tpu.config import (
    AudioConfig,
    DecoderConfig,
    DiscriminatorConfig,
    EncoderConfig,
    TinyVCConfig,
    TrainConfig,
)
from tinyvc_tpu.train import decoder_train, encoder_train
from tinyvc_tpu.train.encoder_train import weighted_cross_entropy


def small_config():
    return TinyVCConfig(
        encoder=EncoderConfig(
            pitch_channels=16, pitch_num_layers=1, ssl_channels=16,
            ssl_dilations=(1,), ssl_dim=32,
        ),
        decoder=DecoderConfig(
            source_channels=16, source_num_layers=1,
            filter_channels=(32, 24, 16, 12, 8), content_channels=32,
        ),
        discriminator=DiscriminatorConfig(
            periods=(2, 3), resolutions=(32,), channels=4, max_channels=16,
            num_layers=2,
        ),
        train=TrainConfig(batch_size=2, chunk_length=4800, disc_crop=2400),
    )


def test_weighted_cross_entropy_matches_torch(rng):
    logits = rng.standard_normal((2, 7, 10)).astype(np.float32)
    labels = rng.integers(0, 10, (2, 7))
    w = rng.uniform(0.1, 1.0, 10).astype(np.float32)
    ref = TF.cross_entropy(
        torch.from_numpy(np.transpose(logits, (0, 2, 1))),
        torch.from_numpy(labels),
        weight=torch.from_numpy(w),
    )
    ours = weighted_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w)
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_encoder_train_step_decreases_loss(rng):
    cfg = small_config()
    key = jax.random.PRNGKey(0)
    _, state = encoder_train.init_state(cfg, key)
    step = encoder_train.make_train_step(cfg)

    B, L = 2, cfg.train.chunk_length
    F = L // cfg.audio.hop_size
    wave = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1)
    f0 = jnp.asarray(
        (np.abs(rng.standard_normal((B, F))) * 200 + 30).astype(np.float32)
    )
    teacher = jnp.asarray(rng.standard_normal((B, F, 32)).astype(np.float32))

    losses = []
    for i in range(5):
        state, metrics = step(state, wave, f0, teacher, jax.random.PRNGKey(i + 1))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 5


def test_decoder_train_step_both_phases(rng):
    cfg = small_config()
    key = jax.random.PRNGKey(0)
    enc, enc_state = encoder_train.init_state(cfg, key)
    state = decoder_train.init_state(cfg, jax.random.PRNGKey(1))

    B, L = 2, cfg.train.chunk_length
    wave = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1)

    # pre-join phase: only spec + dsp losses
    step_pre = decoder_train.make_train_step(cfg, d_join=False)
    state, metrics = step_pre(state, enc_state.params, wave, jax.random.PRNGKey(2))
    assert "loss_adv" not in metrics
    assert np.isfinite(float(metrics["loss_g"]))
    l0 = float(metrics["loss_g"])
    for i in range(3):
        state, metrics = step_pre(
            state, enc_state.params, wave, jax.random.PRNGKey(3 + i)
        )
    # GAN phase: adversarial + feature-matching terms appear, D updates
    step_post = decoder_train.make_train_step(cfg, d_join=True)
    state, metrics = step_post(state, enc_state.params, wave, jax.random.PRNGKey(9))
    for k in ("loss_adv", "loss_feat", "loss_d"):
        assert k in metrics and np.isfinite(float(metrics[k])), k
    assert int(state.step) == 5
