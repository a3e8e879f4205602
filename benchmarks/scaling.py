"""Scaling-efficiency harness: throughput at 1..N devices.

Measures the batched conversion pipeline (and optionally the DP train step)
over growing device counts on whatever platform is available — the virtual
CPU mesh in tests, a real v5e slice in production — and reports
audio-seconds/s per device plus efficiency vs the 1-device baseline
(BASELINE.md: >80% at 2 hosts).

Usage: python benchmarks/scaling.py [--devices 1,2,4,8] [--train] [--weak]
       [--infer] [--cpu N]

``--cpu N`` forces an N-device virtual CPU mesh (jax.config — env vars
alone do not override the axon sitecustomize, see NOTES_NEXT_ROUND.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

if "--cpu" in sys.argv:  # must run before the backend initialises
    _n = int(sys.argv[sys.argv.index("--cpu") + 1])
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + f" --xla_force_host_platform_device_count={_n}"
        ).strip()

import jax
import jax.numpy as jnp
import numpy as np

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")


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


def bench_convert_sharded_knn(n_devices: int, batch: int = 4,
                              seconds: float = 2.0, dict_n: int = 2048):
    """Sharded-kNN batched conversion: the [N, C] dictionary sharded along
    the 'model' axis, neighbours resolved by local top-k -> all-gather of
    (values, vectors) -> re-top-k (parallel/sharded_knn.py). This is
    BASELINE config 3/5's "index sharded across hosts" variant.

    Closed-form ICI cost of the candidate all-gather, per frame per shard:
    each shard contributes k*(C+1) fp32 = 4*(768+1)*4 B = 12.3 kB and
    receives (S-1) of those — at 50 frames/s this is ~615*(S-1) kB/s per
    audio-stream per shard, vs all-gathering the full dictionary
    (N*C*4 = 6.3 MB) once per program."""
    from tinyvc_tpu.config import TinyVCConfig
    from tinyvc_tpu.infer.generator import convert_fn_sharded
    from tinyvc_tpu.models import Decoder, Encoder
    from tinyvc_tpu.parallel import make_mesh, replicate
    from tinyvc_tpu.parallel.sharded_knn import pad_dictionary
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = TinyVCConfig()
    devices = jax.devices()[:n_devices]
    mesh = make_mesh(data=1, model=n_devices, devices=devices)
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
    wave = jnp.asarray(rng.standard_normal((batch, L)).astype(np.float32) * 0.1)
    dictionary = jnp.asarray(
        rng.standard_normal((dict_n, 768)).astype(np.float32)
    )

    with jax.set_mesh(mesh):
        enc_p = replicate(enc_p, mesh)
        dec_p = replicate(dec_p, mesh)
        wave = replicate(wave, mesh)
        dic, mask = pad_dictionary(dictionary, n_devices, k=cfg.retrieval.k)
        dic = jax.device_put(dic, NamedSharding(mesh, P("model", None)))
        mask = jax.device_put(mask, NamedSharding(mesh, P("model")))

        @jax.jit
        def fn(enc_p, dec_p, wave, dic, mask, key):
            return convert_fn_sharded(
                encoder, decoder, enc_p, dec_p, wave, dic, mask,
                jnp.float32(0.0), key, cfg, mesh,
            )

        dt = time_fn(fn, enc_p, dec_p, wave, dic, mask, key)
    audio_sec = batch * L / cfg.audio.sample_rate
    return dt * 1000.0, audio_sec / dt


def bench_stream_sharded(n_devices: int, n_blocks: int = 8):
    """Per-block latency of the streaming step with the kNN dictionary
    sharded over 'model' (BASELINE config 5 exactly as written). Measured
    through StreamConverter.process_block (includes the host boundary the
    real-time path pays)."""
    import time as _time

    from tinyvc_tpu.config import TinyVCConfig
    from tinyvc_tpu.infer.stream import StreamConverter
    from tinyvc_tpu.models import Decoder, Encoder
    from tinyvc_tpu.parallel import make_mesh

    cfg = TinyVCConfig()
    devices = jax.devices()[:n_devices]
    mesh = make_mesh(data=1, model=n_devices, devices=devices)
    rng = np.random.default_rng(0)
    encoder = Encoder(cfg.encoder)
    decoder = Decoder(cfg.decoder, cfg.audio)
    F = cfg.stream.input_size // cfg.audio.hop_size
    L = F * cfg.audio.hop_size
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    enc_p = encoder.init(k1, jnp.zeros((1, F, 961)))
    dec_p = decoder.init(
        k2, jnp.zeros((1, F, 768)), jnp.zeros((1, F)), jnp.zeros((1, L)), k3
    )
    target = rng.standard_normal((2048, 768)).astype(np.float32)

    with jax.set_mesh(mesh):
        conv = StreamConverter(
            enc_p, dec_p, jnp.asarray(target), cfg,
            key=jax.random.PRNGKey(5), mesh=mesh,
        )
        blocks = [
            (rng.standard_normal(cfg.stream.block_size) * 0.1).astype(
                np.float32
            )
            for _ in range(n_blocks + 2)
        ]
        conv.process_block(blocks[0])  # compile
        conv.process_block(blocks[1])  # warm
        t0 = _time.perf_counter()
        for b in blocks[2:]:
            conv.process_block(b)
        dt = (_time.perf_counter() - t0) / n_blocks
    return dt * 1000.0


def bench_knn_only(n_devices: int, batch: int = 4, frames: int = 500,
                   dict_n: int = 16384, payload: str = "index",
                   report_mem: bool = False):
    """The sharded-kNN match ALONE (no replicated encoder/decoder around
    it): total similarity work is constant across device counts, so on the
    virtual CPU mesh the wall-time growth vs 1 device IS the
    sharding/collective overhead — the signal the full-convert row cannot
    give (there the replicated model compute dominates on shared cores).

    ICI payload per frame per shard (closed form): payload='vectors'
    all-gathers k*(C+1) fp32 = 4*769*4 = 12.3 kB from each shard (each
    receives (S-1)*12.3 kB per frame — measured +41 % vs dense at 8
    virtual devices in round 3); payload='index' ships k values = 16 B
    per shard plus one [B,T,C] ring psum ~ 2*C*4 = 6.1 kB per frame
    TOTAL (not per shard). The dense alternative all-gathers the whole
    dictionary once: N*C*4 bytes (= 48 MB at N=16384), amortised over
    all frames."""
    from tinyvc_tpu.ops.retrieval import match_features
    from tinyvc_tpu.parallel import make_mesh, replicate
    from tinyvc_tpu.parallel.sharded_knn import (
        pad_dictionary, sharded_match_features,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(0)
    source = jnp.asarray(
        rng.standard_normal((batch, frames, 768)).astype(np.float32)
    )
    # large dictionaries: build in chunks to avoid a transient 2x host copy
    dictionary = jnp.concatenate([
        jnp.asarray(rng.standard_normal((min(65536, dict_n - lo), 768))
                    .astype(np.float32))
        for lo in range(0, dict_n, 65536)
    ])
    if n_devices == 0:  # dense single-device baseline
        fn = jax.jit(lambda s, d: match_features(s, d[None]))
        dt = time_fn(fn, source, dictionary)
        if report_mem:
            return dt * 1000.0, dictionary.nbytes
        return dt * 1000.0
    mesh = make_mesh(data=1, model=n_devices,
                     devices=jax.devices()[:n_devices])
    with jax.set_mesh(mesh):
        src = replicate(source, mesh)
        dic, mask = pad_dictionary(dictionary, n_devices)
        dic = jax.device_put(dic, NamedSharding(mesh, P("model", None)))
        mask = jax.device_put(mask, NamedSharding(mesh, P("model")))
        fn = jax.jit(
            lambda s, d, m: sharded_match_features(mesh, s, d, m,
                                                   payload=payload)
        )
        dt = time_fn(fn, src, dic, mask)
        if report_mem:
            # per-device dictionary bytes: the addressable shard this mesh
            # position actually holds (must drop as 1/S)
            shard_bytes = max(
                s.data.nbytes for s in dic.addressable_shards
            )
            return dt * 1000.0, shard_bytes
    return dt * 1000.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", default=None)
    p.add_argument("--per-device-batch", type=int, default=4)
    p.add_argument("--global-batch", type=int, default=8,
                   help="fixed global batch for --train (strong scaling)")
    p.add_argument("--train", action="store_true",
                   help="measure the DP GAN train step instead of conversion")
    p.add_argument("--weak", action="store_true",
                   help="with --train: fixed PER-DEVICE batch (weak scaling;"
                        " separates collective overhead from host-core"
                        " saturation on the virtual mesh)")
    p.add_argument("--infer", action="store_true",
                   help="measure the sharded-kNN inference paths (batched"
                        " convert + streaming step) over the 'model' axis")
    p.add_argument("--knn", action="store_true",
                   help="measure ONLY the sharded-kNN match (constant total"
                        " work: isolates collective/sharding overhead on"
                        " the virtual mesh)")
    p.add_argument("--dict-n", type=int, default=16384,
                   help="with --knn: dictionary rows (use ~1M to measure the"
                        " regime where per-device memory and the similarity"
                        " matmul actually bind)")
    p.add_argument("--frames", type=int, default=500,
                   help="with --knn: source frames per batch row")
    p.add_argument("--knn-batch", type=int, default=4)
    p.add_argument("--cpu", type=int, default=None,
                   help="force an N-device virtual CPU mesh (handled at"
                        " import time)")
    args = p.parse_args()

    n_avail = len(jax.devices())
    counts = (
        [int(x) for x in args.devices.split(",")]
        if args.devices
        else sorted({1, 2, n_avail} & set(range(1, n_avail + 1)))
    )
    counts = [c for c in counts if c <= n_avail]

    if args.knn:
        kw = dict(batch=args.knn_batch, frames=args.frames,
                  dict_n=args.dict_n, report_mem=True)
        base, base_bytes = bench_knn_only(0, **kw)
        print(json.dumps({"devices": "dense-1", "dict_n": args.dict_n,
                          "knn_ms": round(base, 2),
                          "dict_bytes_per_device": base_bytes}))
        for n in counts:
            for payload in ("index", "vectors"):
                ms, shard_bytes = bench_knn_only(n, payload=payload, **kw)
                print(json.dumps({
                    "devices": n, "payload": payload, "dict_n": args.dict_n,
                    "knn_ms": round(ms, 2),
                    "overhead_vs_dense": round(ms / base, 3),
                    "dict_bytes_per_device": shard_bytes,
                    "mem_fraction_of_dense": round(shard_bytes / base_bytes, 4),
                }))
        return

    results = []
    base_per_dev = None
    for n in counts:
        if args.infer:
            ms, rtf = bench_convert_sharded_knn(n)
            row = {
                "devices": n,
                "convert_ms_per_call": round(ms, 2),
                "convert_rtf": round(rtf, 2),
                "stream_block_ms": round(bench_stream_sharded(n), 3),
            }
            results.append(row)
            print(json.dumps(row))
            continue
        if args.train and args.weak:
            total, per_dev = bench_train(
                n, global_batch=args.per_device_batch * n
            )
            row = {
                "devices": n,
                "steps_per_s": round(total, 3),
                "per_device_batch": args.per_device_batch,
            }
            results.append(row)
            print(json.dumps(row))
            continue
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
