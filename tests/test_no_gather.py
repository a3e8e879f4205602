"""Hot-path gather/scatter census (VERDICT r2 item 7).

Round 2's two biggest wins were profiler-found gathers (59% and 99% of two
BASELINE configs). This locks the no-gather property in as a test: trace
the serving convert, the streaming step, and the post-join GAN train step
with the TPU kernel dispatch FORCED ON (the 'auto' flags resolve to the
XLA fallbacks on the CPU test backend, which would census the wrong
program), then assert no expensive gather/scatter primitive appears.

"Expensive" (see tinyvc_tpu/utils/jaxpr_census.py): any gather producing
>= 1 MB, or any scatter writing more than one statically-indexed slice.
Known-cheap survivors (pitch-decode top-k gathers, istft/chain-vjp
shifted-slice overlap-adds, stream ring-buffer slice updates) pass the
classifier by construction.
"""

import pytest

pytestmark = pytest.mark.slow  # long tier; quick tier: -m "not slow"

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tinyvc_tpu.config import TinyVCConfig, serving_config
from tinyvc_tpu.models import Decoder, Encoder
from tinyvc_tpu.utils.jaxpr_census import expensive, gather_census


def _tpu_dispatch(cfg):
    """Force the kernel dispatch the real chip takes under 'auto'."""
    return dataclasses.replace(
        cfg,
        decoder=dataclasses.replace(
            cfg.decoder, use_pallas="on", use_fused_filter="on"
        ),
    )


@pytest.fixture(scope="module")
def small_params():
    cfg = serving_config()
    enc = Encoder(cfg.encoder)
    dec = Decoder(cfg.decoder, cfg.audio)
    key = jax.random.PRNGKey(0)
    hop = cfg.audio.hop_size
    Fi = 10
    enc_p = enc.init(key, jnp.zeros((1, Fi, cfg.audio.fft_bin)))
    dec_p = dec.init(
        key,
        jnp.zeros((1, Fi, cfg.decoder.content_channels)),
        jnp.zeros((1, Fi)),
        jnp.zeros((1, Fi * hop)),
        key,
    )
    return cfg, enc, dec, enc_p, dec_p


def _assert_clean(traced, label):
    bad = expensive(gather_census(traced))
    assert not bad, (
        f"{label}: expensive gather/scatter landed in a hot path:\n  "
        + "\n  ".join(str(b) for b in bad)
    )


def test_serving_convert_has_no_expensive_gathers(small_params):
    cfg, enc, dec, enc_p, dec_p = small_params
    cfg = _tpu_dispatch(cfg)
    # the Decoder instance carries its own config — rebuild with the forced
    # dispatch (params are layout-compatible)
    dec = Decoder(cfg.decoder, cfg.audio)
    from tinyvc_tpu.infer.generator import convert_fn

    wave = jnp.zeros((16, 240000), jnp.float32)
    target = jnp.zeros(
        (cfg.retrieval.index_size, cfg.encoder.ssl_dim), jnp.float32
    )
    traced = jax.make_jaxpr(
        lambda *a: convert_fn(enc, dec, *a, cfg)
    )(enc_p, dec_p, wave, target, jnp.float32(0.0), jax.random.PRNGKey(1))
    _assert_clean(traced, "serving convert (B=16 x 10 s)")


def test_stream_step_has_no_expensive_gathers(small_params):
    cfg, enc, dec, enc_p, dec_p = small_params
    # production streaming config: Pallas oscillator on, fused filter off
    # (bench.py config 5 rationale: 13k-sample buffer, kernel buys nothing)
    cfg = dataclasses.replace(
        cfg,
        decoder=dataclasses.replace(
            cfg.decoder, use_pallas="on", use_fused_filter="off"
        ),
    )
    dec = Decoder(cfg.decoder, cfg.audio)
    from tinyvc_tpu.infer.stream import StreamState, make_stream_step

    step = make_stream_step(enc, dec, cfg)
    state = StreamState.init(cfg.stream, jax.random.PRNGKey(7))
    block = jnp.zeros((cfg.stream.block_size,), jnp.float32)
    target = jnp.zeros(
        (cfg.retrieval.index_size, cfg.encoder.ssl_dim), jnp.float32
    )
    traced = jax.make_jaxpr(step)(
        enc_p, dec_p, state, block, target, jnp.float32(0.0)
    )
    _assert_clean(traced, "stream step")


def test_gan_step_has_no_expensive_gathers():
    from tinyvc_tpu.train import decoder_train, encoder_train

    # tiny batch/length keep the CPU trace fast; shapes don't change the
    # primitive census (interp gathers appear at any length)
    cfg = dataclasses.replace(
        TinyVCConfig(),
        train=dataclasses.replace(
            TinyVCConfig().train, batch_size=2, chunk_length=9600
        ),
    )
    key = jax.random.PRNGKey(0)
    # init executes real forwards — keep the CPU-dispatch config there, and
    # force the TPU kernel dispatch only for the TRACED step
    _, enc_state = encoder_train.init_state(cfg, key)
    gan_state = decoder_train.init_state(cfg, jax.random.PRNGKey(1))
    step = decoder_train.make_train_step(_tpu_dispatch(cfg), d_join=True)
    wave = jnp.zeros((2, 9600), jnp.float32)
    traced = jax.make_jaxpr(step)(
        gan_state, enc_state.params, wave, jax.random.PRNGKey(2)
    )
    _assert_clean(traced, "post-join GAN step")
