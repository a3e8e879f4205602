"""Training-step throughput on the real chip (VERDICT round-1 item 4).

Measures the full GAN decoder step (pre-join and post-join phases) and the
encoder distillation step at the reference's batch 16 / 2 s chunks
(`/root/reference/train_decoder.py:87-168`, `train_encoder.py:69-118`),
with the trusted two-loop-length differencing + float() fetch method.

Usage: python benchmarks/train_bench.py [gan-pre gan-post gan-post-bf16d gan-post-xres enc]

``gan-post-bf16d`` measures the post-join step with the discriminators in
bf16 compute (params and weight-norm stay fp32) — the analogue of the
reference's optional `-fp16` AMP (`train_decoder.py:80,100`); gradient
fidelity vs fp32 is bounded by tests/test_mixed_precision.py.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tinyvc_tpu.config import TinyVCConfig
from tinyvc_tpu.train import decoder_train, encoder_train


def timed(make_loop, args, iters=8, reps=3, min_signal=0.05, max_iters=4096):
    """One compiled program with a traced trip count serves both loop
    lengths (remote compiles are 3-8 min each). The trip count grows until
    the differenced signal clears the float() fetch jitter (see
    bench.py::timed — sub-ms steps like the encoder's 0.82 ms need
    hundreds of iterations for a trustworthy number)."""
    loop = make_loop()
    n1 = jnp.int32(1)
    float(loop(n1, *args))

    def best(n):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(n, *args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    while True:
        nN = jnp.int32(iters + 1)
        float(loop(nN, *args))
        signal = best(nN) - best(n1)
        if signal >= min_signal or iters >= max_iters:
            return max(signal, 1e-9) / iters
        if signal <= 0:
            iters = min(iters * 4, max_iters)
        else:
            per_iter = signal / iters
            iters = min(
                max(iters * 2, int(2 * min_signal / per_iter)), max_iters
            )


def main():
    which = sys.argv[1:] or ["gan-pre", "gan-post", "enc"]
    cfg = TinyVCConfig()
    B = cfg.train.batch_size  # 16
    L = cfg.train.chunk_length  # 48000 (2 s)
    F = L // cfg.audio.hop_size
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1)

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        _, enc_state = encoder_train.init_state(cfg, jax.random.PRNGKey(0))
        gan_state = decoder_train.init_state(cfg, jax.random.PRNGKey(1))
    dev = jax.devices()[0]
    enc_state = jax.device_put(enc_state, dev)
    gan_state = jax.device_put(gan_state, dev)

    for name in which:
        if name.startswith("gan"):
            scfg = cfg
            if name.endswith("-bf16d"):
                import dataclasses

                scfg = dataclasses.replace(
                    cfg,
                    discriminator=dataclasses.replace(
                        cfg.discriminator, compute_dtype="bfloat16"
                    ),
                )
            elif name.endswith("-hybrid"):
                import dataclasses

                scfg = dataclasses.replace(
                    cfg,
                    discriminator=dataclasses.replace(
                        cfg.discriminator, mrd_conv_impl="hybrid"
                    ),
                )
            elif name.endswith("-fusedmrd"):
                import dataclasses

                scfg = dataclasses.replace(
                    cfg,
                    discriminator=dataclasses.replace(
                        cfg.discriminator, mrd_conv_impl="fused"
                    ),
                )
            elif name.endswith("-xres"):
                import dataclasses

                scfg = dataclasses.replace(
                    cfg,
                    discriminator=dataclasses.replace(
                        cfg.discriminator, mrd_conv_impl="xres"
                    ),
                )
            step = decoder_train.make_train_step(
                scfg, d_join=name.startswith("gan-post")
            )

            def make_loop(step=step):
                @jax.jit
                def loop(n, state, enc_p, wave, key):
                    def body(i, carry):
                        st, acc = carry
                        st, m = step(st, enc_p, wave + acc * 1e-20,
                                     jax.random.fold_in(key, i))
                        return (st, jnp.mean(m["loss_g"]))

                    _, acc = jax.lax.fori_loop(
                        0, n, body, (state, jnp.float32(0.0))
                    )
                    return acc

                return loop

            dt = timed(
                make_loop, (gan_state, enc_state.params, wave,
                            jax.random.PRNGKey(2))
            )
        else:
            estep = encoder_train.make_train_step(cfg)
            f0 = jnp.asarray(
                (np.abs(rng.standard_normal((B, F))) * 200 + 30).astype(np.float32)
            )
            teacher = jnp.asarray(
                rng.standard_normal((B, 99, cfg.encoder.ssl_dim)).astype(np.float32)
            )

            def make_loop():
                @jax.jit
                def loop(n, state, wave, f0, teacher, key):
                    def body(i, carry):
                        st, acc = carry
                        st, m = estep(st, wave + acc * 1e-20, f0, teacher,
                                      jax.random.fold_in(key, i))
                        return (st, jnp.mean(m["loss"]))

                    _, acc = jax.lax.fori_loop(
                        0, n, body, (state, jnp.float32(0.0))
                    )
                    return acc

                return loop

            dt = timed(
                make_loop, (enc_state, wave, f0, teacher, jax.random.PRNGKey(3))
            )
        # HLO-level FLOP count of ONE step (no extra device compile) for a
        # stated %-of-roofline (VERDICT r1 item 4). v5e fp32 peak ~98 TFLOP/s
        # (half the 197 bf16 MXU peak), matching benchmarks/breakdown.py.
        pct = ""
        try:
            if name.startswith("gan"):
                low = jax.jit(step).lower(
                    gan_state, enc_state.params, wave, jax.random.PRNGKey(2)
                )
            else:
                low = jax.jit(estep).lower(
                    enc_state, wave, f0, teacher, jax.random.PRNGKey(3)
                )
            flops = low.cost_analysis()["flops"]
            pct = (
                f", {flops / 1e12:.2f} TFLOP/step = "
                f"{flops / dt / 98e12 * 100:.1f}% of fp32 peak"
            )
        except Exception:
            pass
        print(
            f"{name}: {dt * 1000:8.2f} ms/step  ({1.0 / dt:.2f} steps/s, "
            f"batch {B} x {L / cfg.audio.sample_rate:.0f}s{pct})",
            flush=True,
        )


if __name__ == "__main__":
    main()
