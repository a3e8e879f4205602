"""Per-stage throughput breakdown on the real chip.

Times each pipeline stage with the same in-graph fori_loop method as
bench.py (N executions inside one program; free of per-call RPC latency),
so optimisation effort goes where the time is.

Usage: python benchmarks/breakdown.py [iters]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tinyvc_tpu.config import TinyVCConfig
from tinyvc_tpu.dsp import estimate_energy, spectrogram
from tinyvc_tpu.models import Decoder, Encoder
from tinyvc_tpu.ops import match_features


def timed_loop(fn, *args, iters=20, label=""):
    """Differential in-graph timing: wall(iters+1 loop) - wall(1 loop),
    with a forced value fetch (block_until_ready under-reports through
    tunneled backends). The trip count is a traced scalar, so ONE compiled
    program serves both loop lengths (remote compiles are 3-8 min each).
    Returns seconds/iter."""

    @jax.jit
    def loop(n, *args):
        def body(i, carry):
            out = fn(i, carry, *args)
            return jnp.mean(out).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    n1, nN = jnp.int32(1), jnp.int32(iters + 1)
    float(loop(n1, *args))  # compile + warm
    float(loop(nN, *args))

    def best(n, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(n, *args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = max(best(nN) - best(n1), 0.0) / iters
    print(f"{label:24s} {dt * 1000:9.3f} ms/iter", flush=True)
    return dt


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("iters", nargs="?", type=int, default=20)
    ap.add_argument("--only", default=None, help="comma-separated stage names")
    ns = ap.parse_args()
    iters = ns.iters
    only = set(ns.only.split(",")) if ns.only else None
    cfg = TinyVCConfig()
    B, L, N = 16, 240000, 2048
    F = L // 480
    key = jax.random.PRNGKey(0)
    encoder = Encoder(cfg.encoder)
    decoder = Decoder(cfg.decoder, cfg.audio)
    k1, k2, k3 = jax.random.split(key, 3)
    # init on the CPU backend: initialising on a tunnelled TPU compiles the
    # full forward just to draw parameters
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        enc_p = encoder.init(k1, jnp.zeros((1, F, 961)))
        dec_p = decoder.init(
            k2, jnp.zeros((1, F, 768)), jnp.zeros((1, F)), jnp.zeros((1, L)), k3
        )
    enc_p = jax.device_put(enc_p, jax.devices()[0])
    dec_p = jax.device_put(dec_p, jax.devices()[0])
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1)
    target = jnp.asarray(rng.standard_normal((B, N, 768)).astype(np.float32))
    content = jnp.asarray(rng.standard_normal((B, F, 768)).astype(np.float32))
    f0 = jnp.asarray(
        (np.abs(rng.standard_normal((B, F))) * 200 + 50).astype(np.float32)
    )
    energy = jnp.asarray(np.abs(rng.standard_normal((B, L))).astype(np.float32))
    spec = jnp.asarray(np.abs(rng.standard_normal((B, F, 961))).astype(np.float32))
    amps = jnp.asarray(
        np.abs(rng.standard_normal((B, F, 15))).astype(np.float32) + 0.5
    )
    kern = jnp.asarray(
        np.abs(rng.standard_normal((B, F, 961))).astype(np.float32) + 0.5
    )
    audio_sec = B * L / 24000

    results = {}

    def want(name):
        return only is None or name in only

    if want("spectrogram"):
        results["spectrogram"] = timed_loop(
        lambda i, c, w: spectrogram(w + c * 1e-20, 1920, 480),
        wave, iters=iters, label="spectrogram",
    )
        # Roofline (VERDICT r1 item 6): is the XLA spectrogram near
        # speed-of-light, and what could a fused Pallas window+DFT kernel buy?
        HBM_GBPS = 819.0  # v5e
        FP32_TFLOPS = 98.0  # v5e fp32 ~ half of bf16 197
        frames = F * B
        bytes_min = (B * L + frames * 961) * 4  # read wave + write magnitude
        bytes_xla = bytes_min + 2 * frames * 1920 * 4 * 2  # framed + complex fft
        t_mem_min = bytes_min / (HBM_GBPS * 1e9)
        t_mem_xla = bytes_xla / (HBM_GBPS * 1e9)
        dft_flops = 2 * frames * 1920 * 2 * 961  # DFT-as-matmul alternative
        t_dft = dft_flops / (FP32_TFLOPS * 1e12)
        dt = results["spectrogram"]
        print(
            f"  roofline: memory floor {t_mem_min*1e3:.3f} ms (fused) / "
            f"{t_mem_xla*1e3:.3f} ms (XLA materialises frames+fft); "
            f"measured = {dt/t_mem_xla:.1f}x XLA floor. "
            f"Fused DFT-matmul kernel bound: "
            f"{max(t_dft, t_mem_min)*1e3:.3f} ms "
            f"({'worthwhile' if max(t_dft, t_mem_min) < 0.5 * dt else 'marginal'})",
            flush=True,
        )
    if want("spectrogram_pallas"):
        from tinyvc_tpu.ops.pallas.spectrogram import pallas_spectrogram

        for mode in ("bf16x3", "bfloat16"):
            results[f"spectrogram_pallas_{mode}"] = timed_loop(
                lambda i, c, w, m=mode: pallas_spectrogram(
                    w + c * 1e-20, 1920, 480, dtype_name=m
                ),
                wave, iters=iters, label=f"spectrogram pallas {mode}",
            )
    if want("knn_pallas"):
        from tinyvc_tpu.ops.pallas.knn import pallas_match_features

        content_k = jnp.asarray(
            rng.standard_normal((B, F, 768)).astype(np.float32)
        )
        dict_k = jnp.asarray(
            rng.standard_normal((N, 768)).astype(np.float32)
        )
        for mode in ("bf16x3", "bfloat16"):
            results[f"knn_pallas_{mode}"] = timed_loop(
                lambda i, c, s, d, m=mode: pallas_match_features(
                    s + c * 1e-20, d, k=4, metric="cos", dtype_name=m
                ),
                content_k, dict_k, iters=iters, label=f"knn pallas {mode}",
            )
    if want("energy"):
        results["energy"] = timed_loop(
        lambda i, c, w: estimate_energy(w + c * 1e-20),
        wave, iters=iters, label="energy",
    )
    if want("encoder"):
        results["encoder"] = timed_loop(
        lambda i, c, s, p: encoder.apply(p, s + c * 1e-20, method=encoder.infer)[0],
        spec, enc_p, iters=iters, label="encoder (ssl+pitch)",
    )
    if want("knn"):
        results["knn"] = timed_loop(
        lambda i, c, z, t: match_features(z + c * 1e-20, t),
        content, target, iters=iters, label="knn match (N=2048)",
    )
    if want("source_net"):
        results["source_net"] = timed_loop(
        lambda i, c, z, f, e, p: decoder.apply(
            p, z + c * 1e-20, f, e,
            method=lambda m, z_, f_, e_: m.source_net(z_, f_, e_),
        )[0],
        content, f0, energy, dec_p, iters=iters, label="source_net",
    )
    if want("dsp"):
        # channels_first=True measures the production serving layout (the
        # fused U-Net consumes the packed channels-first source directly)
        results["dsp"] = timed_loop(
        lambda i, c, f, a, k_, p: decoder.apply(
            p, f, a + c * 1e-20, k_, jax.random.fold_in(key, i),
            method=lambda m, f_, a_, kk, key_: m.dsp(
                f_, a_, kk, key_, fused_noise=True, channels_first=True
            ),
        )[:, 0, :],
        f0, amps, kern, dec_p, iters=iters,
        label="dsp (osc+noise kernels, channels-first)",
    )
    if want("source_bf16") or want("dsp_bf16"):
        # serving-dtype variants: the serving residual decomposes against
        # these, not the fp32 rows
        import dataclasses as _dc

        _scfg = _dc.replace(cfg, decoder=_dc.replace(
            cfg.decoder, compute_dtype="bfloat16"))
        _sdec = Decoder(_scfg.decoder, _scfg.audio)
        if want("source_bf16"):
            results["source_bf16"] = timed_loop(
                lambda i, c, z, f, e, p: _sdec.apply(
                    p, z + c * 1e-20, f, e,
                    method=lambda m, z_, f_, e_: m.source_net(z_, f_, e_),
                )[0],
                content, f0, energy, dec_p, iters=iters, label="source_net bf16",
            )
        if want("dsp_bf16"):
            results["dsp_bf16"] = timed_loop(
                lambda i, c, f, a, k_, p: _sdec.apply(
                    p, f, a + c * 1e-20, k_, jax.random.fold_in(key, i),
                    method=lambda m, f_, a_, kk, key_: m.dsp(f_, a_, kk, key_),
                )[:, :, 0],
                f0, amps, kern, dec_p, iters=iters, label="dsp (osc+noise) bf16",
            )
    src = jnp.asarray(rng.standard_normal((B, L, 16)).astype(np.float32) * 0.3)
    if want("filter_net"):
        results["filter_net"] = timed_loop(
        lambda i, c, z, f, e, s, p: decoder.apply(
            p, z + c * 1e-20, f, e, s,
            method=lambda m, z_, f_, e_, s_: m.filter_net(z_, f_, e_, s_),
        ),
        content, f0, energy, src, dec_p, iters=iters, label="filter_net",
    )
    if want("filter_xla_bf16"):
        # same dtype as the fused kernel, XLA lowering: isolates the Pallas
        # win from the bf16 win
        import dataclasses

        bcfg = dataclasses.replace(cfg, decoder=dataclasses.replace(
            cfg.decoder, compute_dtype="bfloat16"))
        bdec = Decoder(bcfg.decoder, bcfg.audio)
        results["filter_xla_bf16"] = timed_loop(
            lambda i, c, z, f, e, s, p: bdec.apply(
                p, z + c * 1e-20, f, e, s,
                method=lambda m, z_, f_, e_, s_: m.filter_net(z_, f_, e_, s_),
            ),
            content, f0, energy, src, dec_p, iters=iters,
            label="filter_net XLA bf16",
        )
    if want("filter_fused"):
        import dataclasses

        from tinyvc_tpu.ops.fused_filternet import filternet_fused_apply

        dcfg = dataclasses.replace(cfg.decoder, compute_dtype="bfloat16")
        results["filter_fused"] = timed_loop(
            lambda i, c, z, f, e, s, p: filternet_fused_apply(
                p["params"]["filter_net"], dcfg, z + c * 1e-20, f, e, s
            ),
            content, f0, energy, src, dec_p, iters=iters,
            label="filter_net fused bf16",
        )
    if want("convert"):
        # the whole serving convert_fn (bench config3's program): the gap
        # between this and the sum of per-stage rows is unaccounted glue
        # (padding, pitch shift, resampling, stage-boundary materialisation)
        from tinyvc_tpu.config import serving_config
        from tinyvc_tpu.infer.generator import convert_fn as _convert

        scfg = serving_config()
        senc = Encoder(scfg.encoder)
        sdec = Decoder(scfg.decoder, scfg.audio)
        dict2048 = jnp.asarray(
            rng.standard_normal((N, cfg.encoder.ssl_dim)).astype(np.float32)
        )
        results["convert"] = timed_loop(
            lambda i, c, w, t, ep, dp: _convert(
                senc, sdec, ep, dp, w + c * 1e-20, t, jnp.float32(0.0),
                jax.random.fold_in(key, i), scfg,
            ),
            wave, dict2048, enc_p, dec_p, iters=iters,
            label="convert_fn serving e2e",
        )
    # pipeline total counts each stage once: the fused filternet when
    # measured (the serving path), else the XLA fp32 filternet; 'convert'
    # is the whole pipeline and never part of the sum
    alt = {"filter_xla_bf16", "convert", "source_bf16", "dsp_bf16"} | {
        k for k in results if "pallas_" in k
    } | ({"filter_net"} if "filter_fused" in results else set())
    total = sum(v for k, v in results.items() if k not in alt)
    if total > 0:  # --only may select alt-variant stages exclusively
        print(f"{'TOTAL (sum)':24s} {total * 1000:9.3f} ms/iter "
              f"-> RTF {audio_sec / total:.0f}x")


if __name__ == "__main__":
    main()
