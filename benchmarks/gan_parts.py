"""Per-part timing of the GAN generator step on the real chip.

Splits the pre-join generator phase into (a) frozen frontend (spectrogram +
encoder.infer + self-kNN + energy), (b) decoder fwd+bwd under a trivial
loss, (c) the two multi-scale-STFT losses fwd+bwd w.r.t. their waveform
inputs, (d) optimizer update — to direct optimisation at the real hot spot.

Usage: python benchmarks/gan_parts.py [frontend decoder losses full]
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
from tinyvc_tpu.train import decoder_train, encoder_train
from tinyvc_tpu.train.losses import multi_scale_stft_loss


def timed(loop, args, iters=8, reps=3):
    n1, nN = jnp.int32(1), jnp.int32(iters + 1)
    float(loop(n1, *args))
    float(loop(nN, *args))

    def best(n):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(n, *args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return max(best(nN) - best(n1), 1e-9) / iters


def main():
    which = sys.argv[1:] or ["frontend", "decoder", "losses", "full"]
    cfg = TinyVCConfig()
    B, L = cfg.train.batch_size, cfg.train.chunk_length
    F = L // cfg.audio.hop_size
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1)

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        _, enc_state = encoder_train.init_state(cfg, jax.random.PRNGKey(0))
        gan_state = decoder_train.init_state(cfg, jax.random.PRNGKey(1))
    dev = jax.devices()[0]
    enc_p = jax.device_put(enc_state.params, dev)
    gan_state = jax.device_put(gan_state, dev)

    encoder = Encoder(cfg.encoder)
    decoder = Decoder(cfg.decoder, cfg.audio)

    content = jnp.asarray(rng.standard_normal((B, F, 768)).astype(np.float32) * 0.1)
    f0 = jnp.asarray((np.abs(rng.standard_normal((B, F))) * 200 + 30).astype(np.float32))
    energy = jnp.asarray(np.abs(rng.standard_normal((B, L))).astype(np.float32) * 0.1)
    fake = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1)

    results = {}
    for name in which:
        if name == "frontend":
            @jax.jit
            def loop(n, wave, enc_p):
                def body(i, acc):
                    w = wave + acc * 1e-20
                    spec = spectrogram(w, cfg.audio.n_fft, cfg.audio.hop_size)
                    z, f0_ = encoder.apply(enc_p, spec, method=encoder.infer)
                    zf = match_features(z, z, k=cfg.retrieval.k,
                                        metric=cfg.retrieval.metric)
                    e = estimate_energy(w, cfg.audio.energy_frame_size)
                    return jnp.sum(zf) * 1e-9 + jnp.sum(f0_) * 1e-9 + jnp.sum(e) * 1e-9
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
            dt = timed(loop, (wave, enc_p))
        elif name == "decoder":
            def dec_loss(gp, c, f, e, key):
                fk, dsp = decoder.apply(gp, c, f, e, key,
                                        method=decoder.train_forward)
                ax = 1 if cfg.decoder.filter_layout == "cf" else -1
                return jnp.sum(fk) + jnp.sum(jnp.sum(dsp, axis=ax))
            gfn = jax.grad(dec_loss)

            @jax.jit
            def loop(n, gp, c, f, e, key):
                def body(i, acc):
                    g = gfn(gp, c + acc * 1e-20, f, e, jax.random.fold_in(key, i))
                    return jnp.sum(g["params"]["source_net"]["to_amps"]["bias"])
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
            dt = timed(loop, (gan_state.gen_params, content, f0, energy,
                              jax.random.PRNGKey(2)))
        elif name == "losses":
            def loss2(fk, dsp_sum, w):
                return multi_scale_stft_loss(fk, w) + multi_scale_stft_loss(dsp_sum, w)
            lfn = jax.grad(loss2, argnums=(0, 1))

            @jax.jit
            def loop(n, fk, ds, w):
                def body(i, acc):
                    g1, g2 = lfn(fk + acc * 1e-20, ds, w)
                    return jnp.sum(g1) * 1e-9 + jnp.sum(g2) * 1e-9
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
            dt = timed(loop, (fake, fake, wave))
        elif name == "disc_fwd":
            # forwards only: disc(real) + disc(fake), no gradients
            from tinyvc_tpu.models.discriminator import Discriminator
            from tinyvc_tpu.train.decoder_train import center_crop

            disc = Discriminator(cfg.discriminator)
            dp0 = gan_state.disc_params

            @jax.jit
            def loop(n, dp, wave, fake):
                real_crop = center_crop(wave, cfg.train.disc_crop)

                def body(i, acc):
                    fc = center_crop(fake + acc * 1e-20, cfg.train.disc_crop)
                    lr, fr = disc.apply(dp, real_crop)
                    lf, ff = disc.apply(dp, fc)
                    leaves = jax.tree_util.tree_leaves((lr, lf))
                    return sum(jnp.sum(x) for x in leaves) * 1e-9

                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            dt = timed(loop, (dp0, wave, fake))
        elif name in ("disc", "disc_bf16"):
            # the post-join step's discriminator cost: disc(real) +
            # disc(fake) forwards, G-side cotangent into fake, D-side
            # grads wrt params (mirrors the manual-vjp composition in
            # decoder_train.make_train_step)
            import dataclasses

            from tinyvc_tpu.models.discriminator import Discriminator
            from tinyvc_tpu.train.decoder_train import center_crop
            from tinyvc_tpu.train.losses import (
                discriminator_adversarial_loss,
                feature_matching_loss,
                generator_adversarial_loss,
            )

            dcfg = cfg.discriminator
            if name == "disc_bf16":
                dcfg = dataclasses.replace(dcfg, compute_dtype="bfloat16")
            disc = Discriminator(dcfg)
            dp0 = gan_state.disc_params

            @jax.jit
            def loop(n, dp, wave, fake):
                real_crop = center_crop(wave, cfg.train.disc_crop)

                def body(i, acc):
                    fc = center_crop(fake + acc * 1e-20,
                                     cfg.train.disc_crop)
                    (lr, fr), vjp_r = jax.vjp(
                        lambda d: disc.apply(d, real_crop), dp
                    )
                    (lf, ff), vjp_f = jax.vjp(
                        lambda d, xx: disc.apply(d, xx), dp, fc
                    )

                    def g_head(lf_, ff_):
                        return (
                            generator_adversarial_loss(lf_)
                            + feature_matching_loss(fr, ff_)
                        )

                    g_lf, g_ff = jax.grad(g_head, argnums=(0, 1))(lf, ff)
                    _, g_fc = vjp_f((g_lf, g_ff))
                    d_lr, d_lf = jax.grad(
                        lambda a, b: discriminator_adversarial_loss(a, b),
                        argnums=(0, 1),
                    )(lr, lf)
                    zr = jax.tree_util.tree_map(jnp.zeros_like, fr)
                    zf = jax.tree_util.tree_map(jnp.zeros_like, ff)
                    (gr,) = vjp_r((d_lr, zr))
                    gf, _ = vjp_f((d_lf, zf))
                    leaves = jax.tree_util.tree_leaves((gr, gf))
                    return (
                        jnp.sum(g_fc.astype(jnp.float32)) * 1e-9
                        + sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
                        * 1e-9
                    )

                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            dt = timed(loop, (dp0, wave, fake))
        else:  # full
            step = decoder_train.make_train_step(cfg, d_join=False)

            @jax.jit
            def loop(n, state, enc_p, wave, key):
                def body(i, carry):
                    st, acc = carry
                    st, m = step(st, enc_p, wave + acc * 1e-20,
                                 jax.random.fold_in(key, i))
                    return (st, jnp.mean(m["loss_g"]))
                _, acc = jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))
                return acc
            dt = timed(loop, (gan_state, enc_p, wave, jax.random.PRNGKey(2)))
        results[name] = dt * 1000
        print(f"{name}: {dt * 1000:8.2f} ms", flush=True)

    if len(results) > 1:
        print(dict((k, round(v, 2)) for k, v in results.items()))


if __name__ == "__main__":
    main()
