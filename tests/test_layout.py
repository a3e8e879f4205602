"""Channels-first (training-path) U-Net layout vs the channels-last form.

`cfg.filter_layout = 'cf'` runs the waveform-rate FilterNet on ``[B, C, T]``
tensors (time on TPU lanes; no 128-lane padding of 16-48-channel tensors).
The parameter tree is identical to the channels-last form, so the two
layouts must agree to float rounding — forward, DSP source, and gradients.
"""

import pytest

pytestmark = pytest.mark.slow  # long tier; quick tier: -m "not slow"

import numpy as np

import jax
import jax.numpy as jnp

from tinyvc_tpu.config import AudioConfig, DecoderConfig
from tinyvc_tpu.models.decoder import Decoder


def _setup(rng):
    audio = AudioConfig()
    B, F = 2, 20
    L = F * audio.hop_size
    content = jnp.asarray(rng.standard_normal((B, F, 768)).astype(np.float32) * 0.1)
    f0 = jnp.asarray(
        (np.abs(rng.standard_normal((B, F))) * 100 + 50).astype(np.float32)
    )
    energy = jnp.asarray(
        np.abs(rng.standard_normal((B, L))).astype(np.float32) * 0.1
    )
    angle = jnp.asarray(
        rng.uniform(-np.pi, np.pi, (B, F, audio.fft_bin)).astype(np.float32)
    )
    return audio, content, f0, energy, angle


def test_filternet_cf_matches_cl_forward(rng):
    audio, content, f0, energy, angle = _setup(rng)
    dec_cl = Decoder(DecoderConfig(filter_layout="cl", use_pallas="off"), audio)
    dec_cf = Decoder(DecoderConfig(filter_layout="cf", use_pallas="off"), audio)
    key = jax.random.PRNGKey(3)
    params = dec_cl.init(key, content, f0, energy, jax.random.PRNGKey(4))
    p2 = dec_cf.init(key, content, f0, energy, jax.random.PRNGKey(4))
    # identical parameter trees -> checkpoints interchange between layouts
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    assert all(
        a.shape == b.shape
        for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2))
    )

    nk = jax.random.PRNGKey(6)
    y_cl = dec_cl.apply(params, content, f0, energy, nk, noise_angle=angle)
    y_cf = dec_cf.apply(params, content, f0, energy, nk, noise_angle=angle)
    np.testing.assert_allclose(np.asarray(y_cl), np.asarray(y_cf), atol=5e-6)


def test_filternet_cf_matches_cl_train_forward_and_grads(rng):
    audio, content, f0, energy, _ = _setup(rng)
    dec_cl = Decoder(DecoderConfig(filter_layout="cl", use_pallas="off"), audio)
    dec_cf = Decoder(DecoderConfig(filter_layout="cf", use_pallas="off"), audio)
    params = dec_cl.init(
        jax.random.PRNGKey(3), content, f0, energy, jax.random.PRNGKey(4)
    )
    nk = jax.random.PRNGKey(6)

    _, src_cl = dec_cl.apply(
        params, content, f0, energy, nk, method=dec_cl.train_forward
    )
    _, src_cf = dec_cf.apply(
        params, content, f0, energy, nk, method=dec_cf.train_forward
    )
    assert src_cl.shape[-1] == src_cf.shape[1]  # [B,L,H+2] vs [B,H+2,L]
    np.testing.assert_allclose(
        np.asarray(jnp.sum(src_cl, -1)), np.asarray(jnp.sum(src_cf, 1)), atol=1e-5
    )

    def loss(pp, dec, ax):
        f, s = dec.apply(pp, content, f0, energy, nk, method=dec.train_forward)
        return jnp.mean(f**2) + jnp.mean(jnp.sum(s, ax) ** 2)

    g_cl = jax.grad(lambda pp: loss(pp, dec_cl, -1))(params)
    g_cf = jax.grad(lambda pp: loss(pp, dec_cf, 1))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_cl), jax.tree_util.tree_leaves(g_cf)):
        scale = max(float(jnp.max(jnp.abs(a))), 1e-3)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5 * scale + 1e-7, rtol=2e-4
        )
