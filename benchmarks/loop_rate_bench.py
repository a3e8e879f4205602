"""Composed-loop step rate with K-steps-per-dispatch (round-4 verdict #4).

Round-4 measured the composed loops at 7 % (encoder: 38 vs 540 steps/s)
and 85-91 % (decoder) of their own device step rates — the gap was pure
per-step host dispatch through the relay. train/multi_step.py scans K
steps per dispatch; this bench measures the rate the REAL loop achieves:
the same host work the training loop does per dispatch (per-step
``rng.choice`` index draws, key splits, index upload, metrics fetch at
every log boundary), against the HBM-resident cache of an actual
preprocessed dataset.

Targets (BENCH_TRAIN_r04 device-only denominators):
  encoder (pitch-only) : 540.9 steps/s device -> loop >= ~50 %
  decoder pre/post join: 54.66 / 26.47       -> loop >= ~95 %

Usage: python benchmarks/loop_rate_bench.py --cache runs_r05/data/cacheB
       [--k 250] [--dispatches 6] [enc dec-pre dec-post]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tinyvc_tpu.config import TinyVCConfig
from tinyvc_tpu.train import decoder_train, encoder_train
from tinyvc_tpu.train.multi_step import (
    make_decoder_multi_step,
    make_encoder_multi_step,
)


def load_store(cache_dir: str, cfg: TinyVCConfig):
    from tinyvc_tpu.data.dataset import Dataset

    ds = Dataset(cache_dir)
    n = len(ds)
    L = cfg.train.chunk_length
    F = L // cfg.audio.hop_size
    waves = np.empty((n, L), np.float32)
    f0s = np.empty((n, F), np.float32)
    for i in range(n):
        w, f0 = ds[i]
        waves[i] = w
        f0s[i] = f0[:F]
    dev = jax.devices()[0]
    return {
        "wave": jax.device_put(waves, dev),
        "f0": jax.device_put(f0s, dev),
        "n": n,
    }


def run_dispatches(step, K, B, n, dispatches, fetch_metrics=True):
    """Time `dispatches` calls of ``step(idx, keys) -> metrics`` including
    the loop's host work (index draws, key splits, metrics fetch)."""
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def one(key):
        idx = np.stack(
            [rng.choice(n, size=B, replace=n < B) for _ in range(K)]
        ).astype(np.int32)
        keys = jax.random.split(key, K + 1)
        metrics = step(jnp.asarray(idx), keys[1:])
        return keys[0], metrics

    # Warm until steady: through the axon relay the first 1-2 EXECUTIONS
    # (after the compile) still carry ~2 min of one-off setup — a single
    # warm dispatch undercounted the steady rate 3x (measured: first
    # execution 128 s, then 9.5 s flat for a 250-step window).
    prev = None
    for _ in range(6):
        t0 = time.perf_counter()
        key, metrics = one(key)
        _ = float(jax.tree.leaves(metrics)[0])
        dt = time.perf_counter() - t0
        if prev is not None and abs(dt - prev) < 0.15 * max(dt, prev):
            break
        prev = dt
    t0 = time.perf_counter()
    for _ in range(dispatches):
        key, metrics = one(key)
        if fetch_metrics:  # the loop logs once per dispatch at K=log_interval
            _ = float(jax.tree.leaves(metrics)[0])
    dt = time.perf_counter() - t0
    return dispatches * K / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default="runs_r05/data/cacheB")
    ap.add_argument("--k", type=int, default=250)
    ap.add_argument("--dispatches", type=int, default=6)
    ap.add_argument("--out", default=None)
    ap.add_argument("which", nargs="*", default=["enc", "dec-pre", "dec-post"])
    args = ap.parse_args()

    cfg = TinyVCConfig()
    store = load_store(args.cache, cfg)
    n, B, K = store["n"], cfg.train.batch_size, args.k
    print(f"[loop_rate] cache {args.cache}: {n} chunks; K={K}, B={B}")

    results = {}
    if "enc" in args.which:
        _, state0 = encoder_train.init_state(cfg, jax.random.PRNGKey(0))
        multi = make_encoder_multi_step(cfg, distill=False)
        teacher = jnp.zeros((n, 1, cfg.encoder.ssl_dim), jnp.float32)
        holder = {"state": state0}

        def enc_step(idx, keys):
            holder["state"], m = multi(
                holder["state"], store["wave"], store["f0"], teacher, idx, keys
            )
            return m

        sps = run_dispatches(enc_step, K, B, n, args.dispatches)
        results["encoder_loop_steps_per_s"] = round(sps, 1)
        results["encoder_loop_pct_of_device_rate"] = round(100 * sps / 540.9, 1)
        print(f"encoder loop: {sps:.1f} steps/s (device-only r4: 540.9; "
              f"{100 * sps / 540.9:.1f} %)")

    for name, d_join in (("dec-pre", False), ("dec-post", True)):
        if name not in args.which:
            continue
        state0 = decoder_train.init_state(cfg, jax.random.PRNGKey(1))
        _, enc_state = encoder_train.init_state(cfg, jax.random.PRNGKey(2))
        multi = make_decoder_multi_step(cfg, d_join=d_join)
        holder = {"state": state0}

        def dec_step(idx, keys):
            holder["state"], m = multi(
                holder["state"], enc_state.params, store["wave"], idx, keys
            )
            return m

        sps = run_dispatches(dec_step, K, B, n, args.dispatches)
        phase = "post" if d_join else "pre"
        dev = 26.47 if d_join else 54.66
        results[f"decoder_loop_{phase}_join_steps_per_s"] = round(sps, 2)
        results[f"decoder_loop_{phase}_join_pct_of_device_rate"] = round(
            100 * sps / dev, 1
        )
        print(f"{name}: {sps:.2f} steps/s (device-only r4: {dev}; "
              f"{100 * sps / dev:.1f} %)")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
