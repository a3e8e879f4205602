"""Time-sharded conversion tests (CPU mesh).

Guarantees verified:
1. **Shard-count invariance**: S=1 and S=4 produce the same waveform (same
   windowing semantics; GRN psum + phase seeding + global noise indexing
   make the result independent of how time is partitioned, up to fp32
   collective-ordering noise).
2. **Mel-level agreement with the standard pipeline** (the official parity
   metric). Waveform-exactness vs the standard pipeline is NOT expected:
   the utterance's edge frames see replicated-halo context instead of each
   op's own edge padding, and the absolute harmonic phase depends on those
   edge frames.
"""

import pytest

pytestmark = pytest.mark.slow  # long tier; quick tier: -m "not slow"

import numpy as np

import jax
import jax.numpy as jnp

from tests.test_training import small_config
from tinyvc_tpu.dsp import log_mel_spectrogram
from tinyvc_tpu.infer.generator import convert_fn
from tinyvc_tpu.models import Decoder, Encoder
from tinyvc_tpu.parallel import make_mesh
from tinyvc_tpu.parallel.time_shard import (
    time_batched_convert,
    time_sharded_convert,
)


def test_time_sharded_invariance_and_mel_parity(rng):
    cfg = small_config()
    F, H, FH = 120, 40, 20
    L = F * 480

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
    # A second encoder-param variant with a DETERMINISTIC pitch head
    # (zero kernel + peaked bias -> constant decoded f0) for the
    # vs-standard-pipeline comparison below. The untrained random pitch
    # head's top-k decode is chaotic: halo context vs each conv's own edge
    # padding flips classes at the outermost frames, and ANY f0 difference
    # at ANY frame permanently shifts the global harmonic phase constant
    # (reference semantics) — so "sharded vs standard" is only well-posed
    # at mel level when f0 agrees at every frame. The chaotic head stays in
    # use for the shard-count invariance check, which is where the
    # phase-prefix stitching is actually exercised with varying f0.
    import copy

    enc_p_det = copy.deepcopy(enc_p)
    out_layer = enc_p_det["params"]["pitch_estimator"]["stack"]["output_layer"]
    out_layer["kernel"] = out_layer["kernel"] * 0.0
    out_layer["bias"] = out_layer["bias"].at[350].set(5.0)

    t = np.arange(L) / 24000
    wave = (
        np.sin(2 * np.pi * 160 * t) * 0.3
        + rng.standard_normal(L).astype(np.float32) * 0.02
    ).astype(np.float32)
    target = rng.standard_normal((64, cfg.encoder.ssl_dim)).astype(np.float32)
    angle = rng.uniform(-np.pi, np.pi, (F, cfg.audio.fft_bin)).astype(np.float32)
    key = jax.random.PRNGKey(7)

    outs = {}
    for S in (1, 4):
        mesh = make_mesh(data=S, model=1, devices=jax.devices()[:S])
        outs[S] = np.asarray(
            time_sharded_convert(
                mesh, enc_p, dec_p, jnp.asarray(wave), jnp.asarray(target),
                jnp.float32(2.0), key, cfg, halo_frames=H, filter_halo=FH,
                noise_angle=jnp.asarray(angle),
            )
        )
        assert outs[S].shape == (L,)
        assert np.isfinite(outs[S]).all()

    scale = np.abs(outs[1]).max()
    rel = np.abs(outs[1] - outs[4]).max() / scale
    assert rel < 5e-2, rel  # shard-count invariance (fp32 collective noise)

    # mel-level agreement with the standard single-device pipeline, using
    # the deterministic pitch head (see enc_p_det comment above)
    mesh4 = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    out_det = np.asarray(
        time_sharded_convert(
            mesh4, enc_p_det, dec_p, jnp.asarray(wave), jnp.asarray(target),
            jnp.float32(2.0), key, cfg, halo_frames=H, filter_halo=FH,
            noise_angle=jnp.asarray(angle),
        )
    )
    ref = convert_fn(
        encoder, decoder, enc_p_det, dec_p, jnp.asarray(wave[None]),
        jnp.asarray(target), jnp.float32(2.0), key, cfg,
        noise_angle=jnp.asarray(angle[None]),
    )
    mel_ref = np.asarray(log_mel_spectrogram(jnp.asarray(np.asarray(ref))))
    mel_out = np.asarray(log_mel_spectrogram(jnp.asarray(out_det[None])))
    mel_l1 = np.abs(mel_ref - mel_out).mean()
    assert mel_l1 < 0.05 * np.abs(mel_ref).mean(), mel_l1

    # the single-device BATCHED variant (vmap axis_name) must reproduce the
    # mesh-sharded result: identical math, collectives resolved intra-array.
    # fp reassociation across the two lowerings allows tiny elementwise
    # drift; the guarantee is the same as shard-count invariance.
    out_bat = np.asarray(
        time_batched_convert(
            enc_p_det, dec_p, jnp.asarray(wave), jnp.asarray(target),
            jnp.float32(2.0), key, cfg, shards=4, halo_frames=H,
            filter_halo=FH, noise_angle=jnp.asarray(angle),
        )
    )
    assert out_bat.shape == (L,)
    rel_b = np.abs(out_bat - out_det).max() / np.abs(out_det).max()
    assert rel_b < 5e-2, rel_b
    mel_bat = np.asarray(log_mel_spectrogram(jnp.asarray(out_bat[None])))
    mel_b_l1 = np.abs(mel_ref - mel_bat).mean()
    assert mel_b_l1 < 0.05 * np.abs(mel_ref).mean(), mel_b_l1

    # and without the deterministic-angle override it must still run (the
    # global-frame noise indexing path) and stay finite
    out_rng = np.asarray(
        time_batched_convert(
            enc_p_det, dec_p, jnp.asarray(wave), jnp.asarray(target),
            jnp.float32(2.0), key, cfg, shards=4, halo_frames=H,
            filter_halo=FH,
        )
    )
    assert np.isfinite(out_rng).all()


def test_batched_native_matches_vmap(rng):
    """native=True (real batch: GRN batch-sum, reshape phase stitch, global
    noise table — the lowering that lets the fused serving kernels engage)
    must equal native=False (the vmap-axis_name lowering) — same math, no
    collective reordering, so the agreement is essentially bitwise."""
    cfg = small_config()
    F, L = 40, 40 * 480
    key = jax.random.PRNGKey(3)
    encoder = Encoder(cfg.encoder)
    decoder = Decoder(cfg.decoder, cfg.audio)
    k1, k2, k3 = jax.random.split(key, 3)
    enc_p = encoder.init(k1, jnp.zeros((1, 20, cfg.audio.fft_bin)))
    dec_p = decoder.init(
        k2, jnp.zeros((1, 20, cfg.decoder.content_channels)),
        jnp.zeros((1, 20)), jnp.zeros((1, 20 * 480)), k3,
    )
    wave = jnp.asarray(rng.standard_normal(L).astype(np.float32) * 0.1)
    target = jnp.asarray(
        rng.standard_normal((64, cfg.encoder.ssl_dim)).astype(np.float32)
    )
    kw = dict(shards=4, halo_frames=8, filter_halo=2)
    out_v = np.asarray(time_batched_convert(
        enc_p, dec_p, wave, target, jnp.float32(1.0), key, cfg,
        native=False, **kw))
    out_n = np.asarray(time_batched_convert(
        enc_p, dec_p, wave, target, jnp.float32(1.0), key, cfg,
        native=True, **kw))
    scale = np.abs(out_v).max()
    assert np.abs(out_v - out_n).max() / scale < 1e-5
