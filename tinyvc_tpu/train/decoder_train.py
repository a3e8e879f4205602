"""Decoder (vocoder) GAN training.

Behavioural spec: `train_decoder.py:18-172` — two AdamW(1e-4, betas 0.8/0.99)
optimizers with grad-clip 1.0; generator loss = spec + dsp (+ adv + feature
matching once the discriminator joins at step `discriminator_join`); LSGAN
with inverted labels (real -> 0, fake -> 1); discriminators see an 8000-sample
centre crop; self-kNN (`match_features(z, z)`, stop-gradient) stands in for
cross-speaker matching at train time (`train_decoder.py:102`).

The discriminator-join gate is a Python-level phase switch (two compiled
programs), not a traced conditional — per SURVEY §7.3 this recompiles once
at the boundary instead of carrying a dead discriminator subgraph for the
first 100k steps.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import TinyVCConfig
from ..dsp import estimate_energy, spectrogram
from ..models import Decoder, Encoder
from ..models.discriminator import Discriminator
from ..ops import match_features
from .losses import (
    discriminator_adversarial_loss,
    feature_matching_loss,
    generator_adversarial_loss,
    log_mel_loss,
    multi_scale_stft_loss,
)


@struct.dataclass
class GanTrainState:
    gen_params: Any
    disc_params: Any
    gen_opt: Any
    disc_opt: Any
    step: jnp.ndarray


@struct.dataclass
class SkipNonfiniteState:
    notfinite_count: jnp.ndarray
    inner: Any


def skip_if_nonfinite(inner: optax.GradientTransformation):
    """Skip the whole update (zero updates, untouched inner state) when any
    gradient is inf/NaN, and count the skips.

    Same semantics as ``optax.apply_if_finite`` but cheaper on TPU: the
    finiteness test is one fused ``global_norm`` reduction and the skip is
    a ``lax.cond`` — XLA executes only the taken branch — instead of
    apply_if_finite's tree-wide where-selects over every param and moment
    (measured 1.16 ms/step of the post-join GAN step, r4 profile). One
    inf/NaN gradient otherwise poisons training PERMANENTLY
    (clip_by_global_norm turns a single inf into NaN for every parameter).
    The reference's analogue is zeroing NaN magnitudes in the loss
    (`module/utils/loss.py:32-35`); the root cause found in round 4
    (subnormal-flush -> sqrt(0) gradients) is fixed at the source in
    dsp/stft.py::_safe_magnitude — this guard covers the class, and
    ``notfinite_count`` surfaces any recurrence."""

    def init(params):
        return SkipNonfiniteState(
            notfinite_count=jnp.zeros((), jnp.int32),
            inner=inner.init(params),
        )

    def update(grads, state, params=None):
        ok = jnp.isfinite(optax.global_norm(grads))

        def do_update(_):
            updates, inner_state = inner.update(grads, state.inner, params)
            return updates, SkipNonfiniteState(
                notfinite_count=state.notfinite_count, inner=inner_state
            )

        def skip(_):
            zeros = jax.tree_util.tree_map(jnp.zeros_like, grads)
            return zeros, SkipNonfiniteState(
                notfinite_count=state.notfinite_count + 1, inner=state.inner
            )

        return jax.lax.cond(ok, do_update, skip, None)

    return optax.GradientTransformation(init, update)


def make_optimizers(cfg: TinyVCConfig):
    def tx():
        return skip_if_nonfinite(
            optax.chain(
                optax.clip_by_global_norm(cfg.train.grad_clip),
                optax.adamw(
                    cfg.train.learning_rate,
                    b1=cfg.train.adam_betas_gan[0],
                    b2=cfg.train.adam_betas_gan[1],
                ),
            )
        )

    return tx(), tx()


def init_state(cfg: TinyVCConfig, key: jax.Array) -> GanTrainState:
    decoder = Decoder(cfg.decoder, cfg.audio)
    disc = Discriminator(cfg.discriminator)
    k1, k2, k3 = jax.random.split(key, 3)
    F = cfg.train.chunk_length // cfg.audio.hop_size
    L = cfg.train.chunk_length
    gen_params = decoder.init(
        k1,
        jnp.zeros((1, F, cfg.decoder.content_channels)),
        jnp.zeros((1, F)),
        jnp.zeros((1, L)),
        k3,
    )
    disc_params = disc.init(k2, jnp.zeros((1, cfg.train.disc_crop)))
    gtx, dtx = make_optimizers(cfg)
    return GanTrainState(
        gen_params=gen_params,
        disc_params=disc_params,
        gen_opt=gtx.init(gen_params),
        disc_opt=dtx.init(disc_params),
        step=jnp.zeros((), jnp.int32),
    )


def center_crop(wave: jnp.ndarray, length: int) -> jnp.ndarray:
    """Centre crop fed to the discriminators (reference `train_decoder.py:59-62`)."""
    c = wave.shape[1] // 2
    half = length // 2
    return wave[:, c - half : c + half]


def make_train_step(
    cfg: TinyVCConfig,
    d_join: bool,
    spec_loss_type: str = "ms-stft",
    naive_post_join: bool = False,
    debug_grads: bool = False,
):
    """Returns a jittable (state, enc_params, wave, key) -> (state, metrics).

    ``d_join`` selects the pre/post discriminator-join program
    (reference `train_decoder.py:91,113-122`).

    ``naive_post_join`` keeps the straightforward two-`value_and_grad`
    post-join structure (each discriminator forward traced twice). The
    default manual-vjp composition computes identical gradients with each
    disc forward run once; `tests/test_training.py` asserts the
    equivalence against this reference structure.
    """
    encoder = Encoder(cfg.encoder)
    decoder = Decoder(cfg.decoder, cfg.audio)
    disc = Discriminator(cfg.discriminator)
    gtx, dtx = make_optimizers(cfg)

    if spec_loss_type == "ms-stft":
        spec_loss = multi_scale_stft_loss
    elif spec_loss_type == "mel":
        spec_loss = lambda x, y: log_mel_loss(
            x, y, cfg.mel.sample_rate, cfg.mel.n_fft, cfg.mel.hop_size, cfg.mel.n_mels
        )
    else:
        raise ValueError(spec_loss_type)

    default_dev = getattr(jax.config, "jax_default_device", None)
    on_cpu = jax.default_backend() in ("cpu", "gpu") or (
        default_dev is not None and default_dev.platform in ("cpu", "gpu")
    )
    fused_flag = cfg.decoder.use_fused_filter_train
    use_fused = fused_flag == "on" or (fused_flag == "auto" and not on_cpu)

    # fused MRD emits plane-major logits/fmaps with zero-padded invalid
    # positions; the losses then divide by the static valid counts
    if cfg.discriminator.mrd_conv_impl == "fused":
        from ..models.discriminator import fused_mrd_valid_counts

        logit_counts, fmap_counts = fused_mrd_valid_counts(
            cfg.discriminator, cfg.train.disc_crop
        )
    else:
        logit_counts = fmap_counts = None
    # with the fused path the DSP source stays channels-first [B, H+2, L]
    dsp_axis = (
        1 if (use_fused or cfg.decoder.filter_layout == "cf") else -1
    )

    def forward_fake(gen_params, enc_params, wave, key):
        spec = spectrogram(wave, cfg.audio.n_fft, cfg.audio.hop_size)
        content, f0 = encoder.apply(enc_params, spec, method=encoder.infer)
        # self-kNN as the train-time proxy for conversion
        z_fake = jax.lax.stop_gradient(
            match_features(
                content, content, k=cfg.retrieval.k, metric=cfg.retrieval.metric
            )
        )
        energy = estimate_energy(wave, cfg.audio.energy_frame_size)
        if use_fused:
            # U-Net through the fused Pallas kernels with custom_vjp
            # backward kernels (ops/pallas/filter_stage.py) — the XLA
            # layer-by-layer U-Net fwd+bwd dominates the step otherwise
            from ..ops.fused_filternet import filternet_fused_apply

            amps, kernel = decoder.apply(
                gen_params, z_fake, f0, energy,
                method=lambda m, c, f_, e: m.source_net(c, f_, e),
            )
            source_t = decoder.apply(
                gen_params, f0, amps, kernel, key,
                method=lambda m, f_, a, k_, key_: m.dsp(
                    f_, a, k_, key_, channels_first=True
                ),
            )
            fake = filternet_fused_apply(
                gen_params["params"]["filter_net"], cfg.decoder,
                z_fake, f0, energy, source_t,
                interpret=on_cpu, source_channels_first=True,
                differentiable=True,
                # bf16 MXU inputs on TPU (matches XLA's excess-precision
                # demotion); CPU interpret runs lack a bf16 dot — keep fp32
                dtype_name=None if on_cpu else "bfloat16",
            )
            return fake, source_t
        fake, dsp_out = decoder.apply(
            gen_params, z_fake, f0, energy, key, method=decoder.train_forward
        )
        return fake, dsp_out

    @jax.jit
    def train_step(state: GanTrainState, enc_params, wave, key) -> Tuple[
        GanTrainState, Dict[str, jnp.ndarray]
    ]:
        k_gain, k_noise = jax.random.split(key)
        # volume augmentation (reference `train_decoder.py:94`)
        wave = wave * (jax.random.uniform(k_gain, (wave.shape[0], 1)) * 2.0)

        if not d_join:
            # ---- pre-join: spec + dsp losses only ----
            def g_loss_fn(gen_params):
                fake, dsp_out = forward_fake(
                    gen_params, enc_params, wave, k_noise
                )
                loss_dsp = spec_loss(jnp.sum(dsp_out, axis=dsp_axis), wave)
                loss_spec = spec_loss(fake, wave)
                loss_g = (
                    loss_spec * cfg.train.weight_spec
                    + loss_dsp * cfg.train.weight_dsp
                )
                return loss_g, {"loss_spec": loss_spec, "loss_dsp": loss_dsp}

            (loss_g, metrics), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True
            )(state.gen_params)
            if debug_grads:  # per-subtree nonfinite counts + grad maxima
                for name, sub in g_grads["params"].items():
                    ls = jax.tree.leaves(sub)
                    metrics[f"nonfinite/{name}"] = sum(
                        jnp.sum(~jnp.isfinite(x)) for x in ls
                    )
                    metrics[f"gmax/{name}"] = jnp.max(
                        jnp.asarray(
                            [jnp.max(jnp.abs(jnp.nan_to_num(x))) for x in ls]
                        )
                    )
            g_updates, gen_opt = gtx.update(
                g_grads, state.gen_opt, state.gen_params
            )
            gen_params = optax.apply_updates(state.gen_params, g_updates)
            metrics["loss_g"] = loss_g
            metrics["skipped_g"] = gen_opt.notfinite_count
            return GanTrainState(
                gen_params=gen_params,
                disc_params=state.disc_params,
                gen_opt=gen_opt,
                disc_opt=state.disc_opt,
                step=state.step + 1,
            ), metrics

        if naive_post_join:
            # reference structure for the equivalence test: plain nested
            # value_and_grad, disc(real)/disc(fake) each traced twice
            def g_loss_fn(gen_params):
                fake, dsp_out = forward_fake(
                    gen_params, enc_params, wave, k_noise
                )
                loss_dsp = spec_loss(jnp.sum(dsp_out, axis=dsp_axis), wave)
                loss_spec = spec_loss(fake, wave)
                real_crop = center_crop(wave, cfg.train.disc_crop)
                fake_crop = center_crop(fake, cfg.train.disc_crop)
                _, feats_real = disc.apply(state.disc_params, real_crop)
                logits_fake, feats_fake = disc.apply(
                    state.disc_params, fake_crop
                )
                loss_adv = generator_adversarial_loss(logits_fake, logit_counts)
                loss_feat = feature_matching_loss(
                    feats_real, feats_fake, fmap_counts
                )
                loss_g = (
                    loss_spec * cfg.train.weight_spec
                    + loss_dsp * cfg.train.weight_dsp
                    + loss_adv * cfg.train.weight_adv
                    + loss_feat * cfg.train.weight_feat
                )
                metrics = {
                    "loss_spec": loss_spec,
                    "loss_dsp": loss_dsp,
                    "loss_adv": loss_adv,
                    "loss_feat": loss_feat,
                }
                return loss_g, (metrics, fake)

            (loss_g, (metrics, fake)), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True
            )(state.gen_params)
            g_updates, gen_opt = gtx.update(
                g_grads, state.gen_opt, state.gen_params
            )
            gen_params = optax.apply_updates(state.gen_params, g_updates)
            metrics["loss_g"] = loss_g

            fake = jax.lax.stop_gradient(fake)
            real_crop = center_crop(wave, cfg.train.disc_crop)
            fake_crop = center_crop(fake, cfg.train.disc_crop)

            def d_loss_fn(dp):
                logits_real, _ = disc.apply(dp, real_crop)
                logits_fake, _ = disc.apply(dp, fake_crop)
                return discriminator_adversarial_loss(
                    logits_real, logits_fake, logit_counts
                )

            loss_d, d_grads = jax.value_and_grad(d_loss_fn)(state.disc_params)
            d_updates, disc_opt = dtx.update(
                d_grads, state.disc_opt, state.disc_params
            )
            disc_params = optax.apply_updates(state.disc_params, d_updates)
            metrics["loss_d"] = loss_d
            metrics["skipped_d"] = disc_opt.notfinite_count
            metrics["skipped_g"] = gen_opt.notfinite_count
            return GanTrainState(
                gen_params=gen_params,
                disc_params=disc_params,
                gen_opt=gen_opt,
                disc_opt=disc_opt,
                step=state.step + 1,
            ), metrics

        # ---- post-join: manual vjp composition so each discriminator
        # forward runs ONCE (the naive two-phase structure runs
        # disc(real) and disc(fake) twice each — XLA does not CSE across
        # the two grad contexts; ~3 ms/step of MRD/MPD forwards) ----
        B, L = wave.shape
        crop_len = cfg.train.disc_crop
        c0 = L // 2 - crop_len // 2
        real_crop = jax.lax.dynamic_slice(wave, (0, c0), (B, crop_len))
        (logits_real, feats_real), vjp_real = jax.vjp(
            lambda dp: disc.apply(dp, real_crop), state.disc_params
        )

        (fake, dsp_out), vjp_gen = jax.vjp(
            lambda gp: forward_fake(gp, enc_params, wave, k_noise),
            state.gen_params,
        )
        fake_crop = jax.lax.dynamic_slice(fake, (0, c0), (B, crop_len))
        (logits_fake, feats_fake), vjp_fake = jax.vjp(
            lambda dp, xx: disc.apply(dp, xx), state.disc_params, fake_crop
        )

        # generator head: losses as a function of (fake, dsp_out,
        # logits_fake, feats_fake) with disc(real) features as constants
        def g_head(fake_, dsp_, lf, ff):
            loss_dsp = spec_loss(jnp.sum(dsp_, axis=dsp_axis), wave)
            loss_spec = spec_loss(fake_, wave)
            loss_adv = generator_adversarial_loss(lf, logit_counts)
            loss_feat = feature_matching_loss(feats_real, ff, fmap_counts)
            loss_g = (
                loss_spec * cfg.train.weight_spec
                + loss_dsp * cfg.train.weight_dsp
                + loss_adv * cfg.train.weight_adv
                + loss_feat * cfg.train.weight_feat
            )
            return loss_g, {
                "loss_spec": loss_spec,
                "loss_dsp": loss_dsp,
                "loss_adv": loss_adv,
                "loss_feat": loss_feat,
            }

        (loss_g, metrics), head_grads = jax.value_and_grad(
            g_head, argnums=(0, 1, 2, 3), has_aux=True
        )(fake, dsp_out, logits_fake, feats_fake)
        g_fake, g_dsp, g_lf, g_ff = head_grads
        # adv/FM gradient flows into fake through the discriminator; its
        # disc-params component is discarded (the G step never updates D)
        _, g_fake_crop = vjp_fake((g_lf, g_ff))
        g_fake = g_fake + jax.lax.pad(
            g_fake_crop, jnp.zeros((), g_fake.dtype),
            ((0, 0, 0), (c0, L - c0 - crop_len, 0)),
        )
        (g_grads,) = vjp_gen((g_fake, g_dsp))
        g_updates, gen_opt = gtx.update(g_grads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)
        metrics["loss_g"] = loss_g

        # discriminator phase: reuse both primal forwards' residuals
        def d_head(lr, lf):
            return discriminator_adversarial_loss(lr, lf, logit_counts)

        loss_d, (d_lr, d_lf) = jax.value_and_grad(d_head, argnums=(0, 1))(
            logits_real, logits_fake
        )
        zeros_fr = jax.tree_util.tree_map(jnp.zeros_like, feats_real)
        zeros_ff = jax.tree_util.tree_map(jnp.zeros_like, feats_fake)
        (d_grads_real,) = vjp_real((d_lr, zeros_fr))
        d_grads_fake, _ = vjp_fake((d_lf, zeros_ff))
        d_grads = jax.tree_util.tree_map(
            jnp.add, d_grads_real, d_grads_fake
        )
        d_updates, disc_opt = dtx.update(
            d_grads, state.disc_opt, state.disc_params
        )
        disc_params = optax.apply_updates(state.disc_params, d_updates)
        metrics["loss_d"] = loss_d
        metrics["skipped_g"] = gen_opt.notfinite_count
        metrics["skipped_d"] = disc_opt.notfinite_count

        return GanTrainState(
            gen_params=gen_params,
            disc_params=disc_params,
            gen_opt=gen_opt,
            disc_opt=disc_opt,
            step=state.step + 1,
        ), metrics

    return train_step
