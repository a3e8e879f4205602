"""Host-truth streaming latency: wall-clock `StreamConverter.process_block`
end-to-end — numpy in -> dispatch through the relay -> numpy out — the
number a real-time user actually pays per 80 ms block (VERDICT r3 weak #4:
the 0.27 ms device trace excluded the host boundary).

Measures both stream variants per 200 blocks:
  * ``xla``   — the bench/device-trace profile (fused U-Net off; what
                bench.py config 5 loop-times on device)
  * ``fused`` — the production fused-filter kernels (cli/infer_streaming's
                default path; loop-timing is AOT-blocked on the relay, but
                single dispatches — which is what the real-time loop does —
                are measured here)

Updates BENCH_STREAM_r04.json: carries the round-3 device-trace fields
forward and adds ``host_ms_per_block`` (median) + percentile detail.

Usage: python benchmarks/stream_host_bench.py [--blocks 200] [--out FILE]
"""

from __future__ import annotations

import argparse
import contextlib
import dataclasses
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 60.0)

import jax.numpy as jnp
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--blocks", type=int, default=200)
    p.add_argument("--out", default=os.path.join(ROOT, "BENCH_STREAM_r05.json"))
    args = p.parse_args()

    from tinyvc_tpu.config import serving_config
    from tinyvc_tpu.infer.stream import StreamConverter
    from tinyvc_tpu.models import Decoder, Encoder

    cfg = serving_config()
    encoder = Encoder(cfg.encoder)
    decoder = Decoder(cfg.decoder, cfg.audio)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    Fi = 10
    with jax.default_device(cpu) if cpu else contextlib.nullcontext():
        enc_p = encoder.init(k1, jnp.zeros((1, Fi, cfg.audio.fft_bin)))
        dec_p = decoder.init(
            k2,
            jnp.zeros((1, Fi, cfg.decoder.content_channels)),
            jnp.zeros((1, Fi)),
            jnp.zeros((1, Fi * cfg.audio.hop_size)),
            k3,
        )
    if cpu is not None and jax.devices()[0].platform != "cpu":
        enc_p = jax.device_put(enc_p, jax.devices()[0])
        dec_p = jax.device_put(dec_p, jax.devices()[0])

    rng = np.random.default_rng(0)
    target = rng.standard_normal((cfg.retrieval.index_size, cfg.encoder.ssl_dim))
    target = target.astype(np.float32)
    blocks = [
        (rng.standard_normal(cfg.stream.block_size) * 0.1).astype(np.float32)
        for _ in range(args.blocks + 5)
    ]

    host_rows = {}
    detail = {}
    for variant, fused in (("xla", "off"), ("fused", "on")):
        vcfg = dataclasses.replace(
            cfg, decoder=dataclasses.replace(cfg.decoder, use_fused_filter=fused)
        )
        conv = StreamConverter(enc_p, dec_p, target, vcfg,
                               key=jax.random.PRNGKey(7))
        for b in blocks[:5]:  # compile + warm
            conv.process_block(b)
        ts = []
        for b in blocks[5:]:
            t0 = time.perf_counter()
            out = conv.process_block(b)  # numpy in -> numpy out
            ts.append(time.perf_counter() - t0)
            assert np.isfinite(out).all()
        ts_ms = np.asarray(ts) * 1000.0
        host_rows[variant] = round(float(np.median(ts_ms)), 3)
        detail[variant] = {
            "median_ms": round(float(np.median(ts_ms)), 3),
            "p10_ms": round(float(np.percentile(ts_ms, 10)), 3),
            "p90_ms": round(float(np.percentile(ts_ms, 90)), 3),
            "p99_ms": round(float(np.percentile(ts_ms, 99)), 3),
            "blocks": args.blocks,
        }
        print(json.dumps({"variant": variant, **detail[variant]}), flush=True)

        # pipelined sustained throughput (VERDICT r4 weak #6): D blocks of
        # added latency hide the relay round trip — measure total wall time
        # for the whole stream at depth D, report sustained ms/block
        for depth in (1, 2, 4):
            conv.reset()
            # warm the pipeline outside the timed region
            for b in blocks[:depth + 2]:
                got = conv.process_block_pipelined(b, depth=depth)
            n_timed = 0
            t0 = time.perf_counter()
            for b in blocks[depth + 2:]:
                got = conv.process_block_pipelined(b, depth=depth)
                if got is not None:
                    n_timed += 1
            for got in conv.drain():
                n_timed += 1
            dt_ms = (time.perf_counter() - t0) * 1000.0 / max(n_timed, 1)
            detail[variant][f"sustained_ms_pipelined_d{depth}"] = round(dt_ms, 3)
            print(json.dumps({"variant": variant, "depth": depth,
                              "sustained_ms_per_block": round(dt_ms, 3)}),
                  flush=True)

    # carry the latest device-trace fields forward so gen_perf_table keeps
    # rendering the breakdown alongside the new host-truth rows
    prev = {}

    def _round_id(path):  # numeric round id, never mtime (clones scramble it)
        import re

        m = re.search(r"_r(\d+)\.json$", os.path.basename(path))
        return int(m.group(1)) if m else -1

    prior = sorted(
        (q for q in glob.glob(os.path.join(ROOT, "BENCH_STREAM*.json"))
         if os.path.abspath(q) != os.path.abspath(args.out)),
        key=_round_id,
    )
    if prior:
        with open(prior[-1]) as f:
            prev = json.load(f)
    budget_ms = cfg.stream.block_size / cfg.audio.sample_rate * 1000.0
    out = dict(prev)
    out["host_method"] = (
        "benchmarks/stream_host_bench.py: wall-clock process_block (numpy "
        "in -> numpy out through the axon relay), median of "
        f"{args.blocks} blocks per variant; 'xla' = device-trace profile "
        "(fused U-Net off), 'fused' = production fused-filter kernels"
    )
    out["host_ms_per_block"] = host_rows
    out["host_detail"] = detail
    out["host_rt_headroom"] = {
        k: round(budget_ms / v, 1) for k, v in host_rows.items()
    }
    out["host_sustained_pipelined"] = {
        k: {
            d.split("sustained_ms_pipelined_")[1]: dict(
                ms_per_block=v,
                rt_headroom=round(budget_ms / v, 1),
            )
            for d, v in detail[k].items()
            if d.startswith("sustained_ms_pipelined_")
        }
        for k in detail
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
