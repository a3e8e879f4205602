"""jax.profiler trace of the GAN training step on the real chip.

Same method as profile_convert.py: device trace joined with compiled-HLO
op_name metadata, aggregated per op — finds where the remaining step time
goes after the fused backward kernels.

Usage: python benchmarks/profile_train.py [pre|post]
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

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 60.0)

sys.path.insert(0, ".")

from tinyvc_tpu.config import TinyVCConfig
from tinyvc_tpu.train import decoder_train, encoder_train


def main():
    phase = sys.argv[1] if len(sys.argv) > 1 else "post"
    cfg = TinyVCConfig()
    B, L = cfg.train.batch_size, cfg.train.chunk_length
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1)

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        _, enc_state = encoder_train.init_state(cfg, jax.random.PRNGKey(0))
        gan_state = decoder_train.init_state(cfg, jax.random.PRNGKey(1))
    dev = jax.devices()[0]
    enc_p = jax.device_put(enc_state.params, dev)
    state = jax.device_put(gan_state, dev)

    step = decoder_train.make_train_step(cfg, d_join=phase == "post")
    key = jax.random.PRNGKey(3)

    state, m = step(state, enc_p, wave, key)
    print("warm", float(m["loss_g"]))
    tdir = f"/tmp/jaxtrace_train_{phase}"
    with jax.profiler.trace(tdir):
        for i in range(5):
            state, m = step(state, enc_p, wave, jax.random.fold_in(key, i))
        print("traced", float(m["loss_g"]))

    low = step.lower(state, enc_p, wave, key)
    txt = low.compile().as_text()
    meta = {}
    for mm in re.finditer(
        r"^\s*%?([\w.\-]+) = ([^\s]+)[^\n]*?op_name=\"([^\"]*)\""
        r"(?:[^\n]*?source_file=\"([^\"]*)\"[^\n]*?source_line=(\d+))?",
        txt, re.M,
    ):
        src = f" {mm.group(4)}:{mm.group(5)}" if mm.group(4) else ""
        meta[mm.group(1)] = f"{mm.group(2)[:24]} {mm.group(3)}{src}"

    traces = sorted(glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz"))
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
    print(f"\ntotal device {total / 5000:.2f} ms/step over 5 steps")
    for name, d in dur.most_common(50):
        op = meta.get(name, "?")
        print(f"{d / 5000:8.3f} ms  x{cnt[name]:3d}  {name[:28]:28s} {op[:95]}")

    # subsystem aggregation over ALL ops (meta-joined), to see where a
    # flat profile's time goes
    def bucket(s):
        if "Discriminator" in s:
            sub = "mpd" if "mpd_" in s else ("mrd" if "mrd_" in s else "disc")
            return f"{sub}_bwd" if "transpose" in s else f"{sub}_fwd"
        if any(k in s for k in (
            "fused_upsample", "fused_downsample", "fused_conv3",
            "pallas_upsample", "filter_net", "film",
        )):
            return "unet_bwd" if ("transpose" in s or "_bwd" in s) else "unet_fwd"
        if "oscillator" in s or "Decoder.dsp" in s or "istft" in s:
            return "dsp"
        if "fft" in s or "stft" in s or "mel" in s:
            return "stft_losses"
        if any(k in s for k in ("adam", "clip", "global_norm", "apply_updates")):
            return "optimizer"
        if any(k in s for k in (
            "source_net", "Encoder", "match", "top_k", "knn", "spectrogram",
            "energy",
        )):
            return "frontend"
        return "other"

    agg = collections.Counter()
    other = collections.Counter()
    for name, d in dur.items():
        b = bucket(meta.get(name, "") + " " + name)
        agg[b] += d
        if b == "other":
            other[name] += d
    print("\nby subsystem:")
    for b, d in agg.most_common():
        print(f"{d / 5000:8.2f} ms  {b}")
    print("\nlargest 'other' ops:")
    for name, d in other.most_common(15):
        print(f"{d / 5000:8.3f} ms  {name[:28]:28s} {meta.get(name, '?')[:90]}")


if __name__ == "__main__":
    main()
