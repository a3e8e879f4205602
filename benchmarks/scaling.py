"""Scaling-efficiency harness: throughput at 1..N devices.

Measures the batched conversion pipeline (and optionally the DP train step)
over growing device counts on whatever platform is available — the virtual
CPU mesh in tests, a real v5e slice in production — and reports
audio-seconds/s per device plus efficiency vs the 1-device baseline
(BASELINE.md: >80% at 2 hosts).

Usage: python benchmarks/scaling.py [--devices 1,2,4,8] [--train]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(f, *args, reps: int = 3) -> float:
    """min-of-reps wall time; forces a scalar fetch so async backends and
    relays cannot under-report."""
    out = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))  # warm + sync
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_convert(n_devices: int, per_device_batch: int = 4, seconds: float = 2.0):
    from tinyvc_tpu.config import TinyVCConfig
    from tinyvc_tpu.infer.generator import convert_fn
    from tinyvc_tpu.models import Decoder, Encoder
    from tinyvc_tpu.parallel import make_mesh, pad_dictionary, replicate, shard_batch
    from tinyvc_tpu.parallel.sharded_knn import sharded_match_features

    cfg = TinyVCConfig()
    devices = jax.devices()[:n_devices]
    mesh = make_mesh(data=n_devices, model=1, devices=devices)
    B = per_device_batch * n_devices
    L = int(seconds * cfg.audio.sample_rate) // 480 * 480
    F = L // 480
    key = jax.random.PRNGKey(0)
    encoder = Encoder(cfg.encoder)
    decoder = Decoder(cfg.decoder, cfg.audio)
    k1, k2, k3 = jax.random.split(key, 3)
    enc_p = encoder.init(k1, jnp.zeros((1, F, 961)))
    dec_p = decoder.init(
        k2, jnp.zeros((1, F, 768)), jnp.zeros((1, F)), jnp.zeros((1, L)), k3
    )
    rng = np.random.default_rng(0)
    wave = rng.standard_normal((B, L)).astype(np.float32) * 0.1
    target = jnp.asarray(rng.standard_normal((2048, 768)).astype(np.float32))

    with jax.set_mesh(mesh):
        enc_p = replicate(enc_p, mesh)
        dec_p = replicate(dec_p, mesh)
        wave_s = shard_batch(wave, mesh)
        target_r = replicate(target, mesh)

        @jax.jit
        def fn(enc_p, dec_p, wave, target, key):
            return convert_fn(
                encoder, decoder, enc_p, dec_p, wave, target,
                jnp.float32(0.0), key, cfg,
            )

        dt = time_fn(fn, enc_p, dec_p, wave_s, target_r, key)
    audio_sec = B * L / cfg.audio.sample_rate
    return audio_sec / dt, audio_sec / dt / n_devices


def bench_train(n_devices: int, global_batch: int = 8, seconds: float = 1.0):
    """DP GAN train step (post-join, both players) steps/s over the mesh.

    Reference training shape: `/root/reference/train_decoder.py:87-168`
    (batch 16, 2 s chunks); batch and chunk length are scaled down so the
    virtual CPU mesh finishes in minutes. The GLOBAL batch is fixed (strong
    scaling): on the virtual mesh every "device" shares one host's cores, so
    ideal steps/s is flat across device counts and any drop isolates the
    sharding/collective overhead — a fixed per-device batch would instead
    measure CPU oversubscription. Absolute step time on chip is measured by
    benchmarks/train_bench.py."""
    import dataclasses

    from tinyvc_tpu.config import TinyVCConfig
    from tinyvc_tpu.parallel import make_mesh, replicate, shard_batch
    from tinyvc_tpu.train import decoder_train, encoder_train

    L = int(seconds * 24000) // 480 * 480
    cfg = TinyVCConfig()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(cfg.train, chunk_length=L, disc_crop=min(8000, L)),
    )
    devices = jax.devices()[:n_devices]
    mesh = make_mesh(data=n_devices, model=1, devices=devices)
    if global_batch % n_devices:
        raise ValueError(f"global batch {global_batch} not divisible by {n_devices}")
    B = global_batch
    rng = np.random.default_rng(0)

    with jax.set_mesh(mesh):
        _, enc_state = encoder_train.init_state(cfg, jax.random.PRNGKey(0))
        gan_state = decoder_train.init_state(cfg, jax.random.PRNGKey(1))
        enc_params = replicate(enc_state.params, mesh)
        gan_state = replicate(gan_state, mesh)
        wave = shard_batch(
            rng.standard_normal((B, L)).astype(np.float32) * 0.1, mesh
        )
        step = decoder_train.make_train_step(cfg, d_join=True)

        def fn(state, enc_p, wave, key):
            state, metrics = step(state, enc_p, wave, key)
            return metrics["loss_g"]

        dt = time_fn(fn, gan_state, enc_params, wave, jax.random.PRNGKey(2))
    return 1.0 / dt, 1.0 / dt / n_devices


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", default=None)
    p.add_argument("--per-device-batch", type=int, default=4)
    p.add_argument("--global-batch", type=int, default=8,
                   help="fixed global batch for --train (strong scaling)")
    p.add_argument("--train", action="store_true",
                   help="measure the DP GAN train step instead of conversion")
    args = p.parse_args()

    n_avail = len(jax.devices())
    counts = (
        [int(x) for x in args.devices.split(",")]
        if args.devices
        else sorted({1, 2, n_avail} & set(range(1, n_avail + 1)))
    )
    counts = [c for c in counts if c <= n_avail]

    results = []
    base_per_dev = None
    for n in counts:
        if args.train:
            total, per_dev = bench_train(n, global_batch=args.global_batch)
            total_key, per_key = "steps_per_s", "steps_per_s_per_device"
            # fixed global batch: ideal total steps/s is flat; efficiency is
            # the total-throughput ratio to the 1-device run
            eff_basis = total
        else:
            total, per_dev = bench_convert(n, args.per_device_batch)
            total_key, per_key = "rtf_total", "rtf_per_device"
            eff_basis = per_dev
        if base_per_dev is None:
            base_per_dev = eff_basis
        eff = eff_basis / base_per_dev
        results.append(
            {
                "devices": n,
                total_key: round(total, 3),
                per_key: round(per_dev, 3),
                "efficiency": round(eff, 3),
            }
        )
        print(json.dumps(results[-1]))
    return results


if __name__ == "__main__":
    main()
