"""Regenerate demo/metrics.json: the measured log-mel L1 of the committed
demo pair (converted.wav vs source.wav), so the number cited in
demo/README.md is a committed, reproducible artifact instead of an ad-hoc
claim (ADVICE r4 item 3).

Run from the repo root: python demo/measure_metrics.py
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from tinyvc_tpu.train.losses import log_mel_loss  # noqa: E402
from tinyvc_tpu.utils.audio_io import load_audio  # noqa: E402


def main():
    demo = os.path.dirname(os.path.abspath(__file__))
    s, sr1 = load_audio(os.path.join(demo, "source.wav"))
    c, sr2 = load_audio(os.path.join(demo, "converted.wav"))
    s = s.mean(axis=0)
    c = c.mean(axis=0)
    n = min(len(s), len(c))
    l1 = float(log_mel_loss(jnp.asarray(c[None, :n]), jnp.asarray(s[None, :n])))
    out = {
        "pair": ["demo/source.wav", "demo/converted.wav"],
        "metric": "log-mel L1 (parity mel config: sr 24000, n_fft 1024, "
        "hop 256, 80 mels)",
        "log_mel_l1_converted_vs_source": round(l1, 4),
        "lengths": {"source": len(s), "converted": len(c), "compared": n,
                    "sr": [sr1, sr2]},
        "note": "measured on the committed pair by demo/measure_metrics.py; "
        "the ~3.0 untrained-init baseline cited in demo/README.md comes from "
        "TRAIN_RUN_r04.json (different utterance)",
    }
    path = os.path.join(demo, "metrics.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
