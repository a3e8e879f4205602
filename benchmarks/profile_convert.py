"""jax.profiler trace of the serving convert path on the real chip.

Writes a trace to /tmp/jaxtrace_convert and prints the top device ops with
their HLO op_name metadata — the tool for finding stage-boundary glue
(casts, copies, broadcasts) that per-stage timing harnesses miss.

Usage: python benchmarks/profile_convert.py [B] [seconds]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tinyvc_tpu.config import serving_config
from tinyvc_tpu.infer.generator import convert_fn
from tinyvc_tpu.models import Decoder, Encoder


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    cfg = serving_config()
    L = int(secs * cfg.audio.sample_rate) // cfg.audio.hop_size * cfg.audio.hop_size
    N = cfg.retrieval.index_size

    encoder = Encoder(cfg.encoder)
    decoder = Decoder(cfg.decoder, cfg.audio)
    rng = np.random.default_rng(0)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        F = L // cfg.audio.hop_size
        spec_dim = cfg.audio.fft_bin
        enc_p = encoder.init(
            jax.random.PRNGKey(0), jnp.zeros((1, F, spec_dim))
        )
        dec_p = decoder.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, F, cfg.decoder.content_channels)),
            jnp.zeros((1, F)),
            jnp.zeros((1, L)),
            jax.random.PRNGKey(2),
        )
    dev = jax.devices()[0]
    enc_p = jax.device_put(enc_p, dev)
    dec_p = jax.device_put(dec_p, dev)
    wave = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1)
    target = jnp.asarray(
        rng.standard_normal((N, cfg.decoder.content_channels)).astype(np.float32)
    )

    @jax.jit
    def run(ep, dp, w, t, key):
        return convert_fn(
            encoder, decoder, ep, dp, w, t, jnp.float32(0.0), key, cfg
        )

    key = jax.random.PRNGKey(3)
    out = run(enc_p, dec_p, wave, target, key)
    print("warm", float(jnp.sum(out)))
    with jax.profiler.trace("/tmp/jaxtrace_convert"):
        for i in range(5):
            out = run(enc_p, dec_p, wave, target, jax.random.fold_in(key, i))
        print("traced", float(jnp.sum(out)))

    # ---- analysis: join trace durations with compiled-HLO metadata ----
    low = jax.jit(run).lower(enc_p, dec_p, wave, target, key)
    txt = low.compile().as_text()
    meta = {}
    for m in re.finditer(
        r"^\s*%?([\w.\-]+) = ([^\s]+)[^\n]*?op_name=\"([^\"]*)\""
        r"(?:[^\n]*?source_file=\"([^\"]*)\"[^\n]*?source_line=(\d+))?",
        txt, re.M,
    ):
        src = f" {m.group(4)}:{m.group(5)}" if m.group(4) else ""
        meta[m.group(1)] = f"{m.group(2)[:24]} {m.group(3)}{src}"

    traces = sorted(glob.glob("/tmp/jaxtrace_convert/plugins/profile/*/*.trace.json.gz"))
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
    print(f"\ntotal device {total / 5000:.2f} ms/call over 5 calls")
    for name, d in dur.most_common(45):
        op = meta.get(name, "?")
        print(f"{d / 5000:8.3f} ms  x{cnt[name]:3d}  {name[:28]:28s} {op[:95]}")


if __name__ == "__main__":
    main()
