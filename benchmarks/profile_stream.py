"""jax.profiler trace of the compiled streaming step on the real chip.

Same method as profile_convert.py: device trace joined with compiled-HLO
op_name metadata. The stream step (infer/stream.py::make_stream_step) runs
the full convert over the 13k-sample carried buffer plus SOLA per 80 ms
block; this finds where the 25 ms/block goes.

Usage: python benchmarks/profile_stream.py
"""

from __future__ import annotations

import collections
import dataclasses
import glob
import gzip
import json
import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 60.0)

sys.path.insert(0, ".")

from tinyvc_tpu.config import serving_config
from tinyvc_tpu.infer.stream import StreamState, make_stream_step
from tinyvc_tpu.models import Decoder, Encoder


def main():
    cfg = serving_config()
    # same profile bench.py config 5 uses: fused U-Net off (5 pallas calls
    # in the while-loop body blow up the remote AOT compile)
    cfg = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, use_fused_filter="off")
    )
    N = cfg.retrieval.index_size

    encoder = Encoder(cfg.encoder)
    decoder = Decoder(cfg.decoder, cfg.audio)
    rng = np.random.default_rng(0)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        Fi = 10
        enc_p = encoder.init(
            jax.random.PRNGKey(0), jnp.zeros((1, Fi, cfg.audio.fft_bin))
        )
        dec_p = decoder.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, Fi, cfg.decoder.content_channels)),
            jnp.zeros((1, Fi)),
            jnp.zeros((1, Fi * cfg.audio.hop_size)),
            jax.random.PRNGKey(2),
        )
    dev = jax.devices()[0]
    enc_p = jax.device_put(enc_p, dev)
    dec_p = jax.device_put(dec_p, dev)
    target = jnp.asarray(
        rng.standard_normal((N, cfg.decoder.content_channels)).astype(np.float32)
    )
    state = StreamState.init(cfg.stream, jax.random.PRNGKey(7))
    block = jnp.asarray(
        rng.standard_normal((cfg.stream.block_size,)).astype(np.float32) * 0.1
    )
    step = make_stream_step(encoder, decoder, cfg)

    @jax.jit
    def run(ep, dp, st, blk, tgt):
        return step(ep, dp, st, blk, tgt, jnp.float32(0.0))

    state, out = run(enc_p, dec_p, state, block, target)
    print("warm", float(jnp.sum(out)))
    with jax.profiler.trace("/tmp/jaxtrace_stream"):
        for _ in range(5):
            state, out = run(enc_p, dec_p, state, block, target)
        print("traced", float(jnp.sum(out)))

    low = jax.jit(run).lower(enc_p, dec_p, state, block, target)
    txt = low.compile().as_text()
    meta = {}
    for m in re.finditer(
        r"^\s*%?([\w.\-]+) = ([^\s]+)[^\n]*?op_name=\"([^\"]*)\""
        r"(?:[^\n]*?source_file=\"([^\"]*)\"[^\n]*?source_line=(\d+))?",
        txt, re.M,
    ):
        src = f" {m.group(4)}:{m.group(5)}" if m.group(4) else ""
        meta[m.group(1)] = f"{m.group(2)[:24]} {m.group(3)}{src}"

    traces = sorted(
        glob.glob("/tmp/jaxtrace_stream/plugins/profile/*/*.trace.json.gz")
    )
    with gzip.open(traces[-1]) as f:
        data = json.load(f)
    events = data["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dur = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
            name = e["name"]
            if name.startswith("jit_") or name.isdigit():
                continue
            total += e.get("dur", 0)
            dur[name] += e.get("dur", 0)
            cnt[name] += 1
    print(f"\ntotal device {total / 5000:.2f} ms/block over 5 blocks")
    for name, d in dur.most_common(45):
        op = meta.get(name, "?")
        print(f"{d / 5000:8.3f} ms  x{cnt[name]:3d}  {name[:28]:28s} {op[:95]}")


if __name__ == "__main__":
    main()
