"""Time-sharded conversion vs the single-device pipeline (CPU mesh).

Interior frames (further than the halo from the utterance ends) must match
the standard pipeline to fp32 tolerance; edges follow the documented
edge-replication semantics.
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from tests.test_training import small_config
from tinyvc_tpu.infer.generator import convert_fn
from tinyvc_tpu.models import Decoder, Encoder
from tinyvc_tpu.parallel import make_mesh
from tinyvc_tpu.parallel.time_shard import time_sharded_convert


def test_time_sharded_matches_single_device(rng):
    cfg = small_config()
    S = 4
    seg = 30  # frames per shard
    F = S * seg
    L = F * 480
    H, FH = 24, 8  # halo, filter halo (small model: rf ~ 12 frames)

    mesh = make_mesh(data=S, model=1, devices=jax.devices()[:S])

    encoder = Encoder(cfg.encoder)
    decoder = Decoder(cfg.decoder, cfg.audio)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    enc_p = encoder.init(k1, jnp.zeros((1, 20, cfg.audio.fft_bin)))
    dec_p = decoder.init(
        k2,
        jnp.zeros((1, 20, cfg.decoder.content_channels)),
        jnp.zeros((1, 20)),
        jnp.zeros((1, 20 * 480)),
        k3,
    )

    # voiced-ish signal
    t = np.arange(L) / 24000
    wave = (
        np.sin(2 * np.pi * 160 * t) * 0.3
        + rng.standard_normal(L).astype(np.float32) * 0.02
    ).astype(np.float32)
    N = 64
    target = rng.standard_normal((N, cfg.encoder.ssl_dim)).astype(np.float32)
    angle = rng.uniform(-np.pi, np.pi, (F, cfg.audio.fft_bin)).astype(np.float32)
    key = jax.random.PRNGKey(7)

    # single-device reference with the same injected noise phases
    ref = convert_fn(
        encoder,
        decoder,
        enc_p,
        dec_p,
        jnp.asarray(wave[None]),
        jnp.asarray(target),
        jnp.float32(2.0),
        key,
        cfg,
        noise_angle=jnp.asarray(angle[None]),
    )
    ref = np.asarray(ref)[0]

    out = time_sharded_convert(
        mesh,
        enc_p,
        dec_p,
        jnp.asarray(wave),
        jnp.asarray(target),
        jnp.float32(2.0),
        key,
        cfg,
        halo_frames=H,
        filter_halo=FH,
        noise_angle=jnp.asarray(angle),
    )
    out = np.asarray(out)
    assert out.shape == (L,)

    # interior exactness: crop a halo's worth of samples at each end
    crop = H * 480
    interior_err = np.abs(out[crop:-crop] - ref[crop:-crop]).max()
    scale = np.abs(ref).max()
    assert interior_err < 5e-3 * max(scale, 1.0), (interior_err, scale)
    # edges are bounded (replicated-halo semantics), not garbage
    assert np.isfinite(out).all()
    assert np.abs(out).max() < 10 * max(scale, 1.0)
