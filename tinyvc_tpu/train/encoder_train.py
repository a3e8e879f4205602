"""Encoder training: WavLM distillation + pitch classification.

Behavioural spec: `train_encoder.py:21-122` — AdamW(1e-4), grad-clip 1.0,
loss = weighted CE(f0 classes; unvoiced class weight 5e-3) + 45 * L1 between
the content head and the (time-interpolated) teacher features. Labels are
computed from clean f0 while the student sees volume/noise-augmented audio
(denoising distillation; the ordering at `train_encoder.py:83-93` is
intentional and kept).

Teacher features arrive as a batch input: the WavLM-Base+ teacher runs on
host (`tinyvc_tpu.train.teacher`) or its features are precomputed during
preprocessing — the teacher is never part of the TPU graph.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import TinyVCConfig
from ..dsp import spectrogram
from ..dsp.interp import linear_interp_time
from ..models import Encoder, freq2id


@struct.dataclass
class EncoderTrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(cfg: TinyVCConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip),
        optax.adamw(cfg.train.learning_rate),
    )


def init_state(cfg: TinyVCConfig, key: jax.Array) -> Tuple[Encoder, EncoderTrainState]:
    encoder = Encoder(cfg.encoder)
    F = cfg.train.chunk_length // cfg.audio.hop_size
    dummy = jnp.zeros((1, F, cfg.audio.fft_bin), jnp.float32)
    params = encoder.init(key, dummy)
    tx = make_optimizer(cfg)
    return encoder, EncoderTrainState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
    )


def weighted_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, class_weights: jnp.ndarray
) -> jnp.ndarray:
    """Matches ``torch.nn.functional.cross_entropy(weight=w)``: mean of
    per-element NLL scaled by w[label], normalised by the summed weights."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = class_weights[labels]
    return jnp.sum(w * nll) / jnp.sum(w)


def encoder_loss(
    encoder: Encoder,
    params: Any,
    spec: jnp.ndarray,
    f0_labels: jnp.ndarray,
    teacher: jnp.ndarray,
    class_weights: jnp.ndarray,
    distill_weight: float,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    z, logits = encoder.apply(params, spec)
    loss_f0 = weighted_cross_entropy(logits, f0_labels, class_weights)
    if not distill_weight:  # static: teacher-less step carries no distill term
        zero = jnp.zeros((), jnp.float32)
        return loss_f0, {"loss_f0": loss_f0, "loss_distill": zero}
    teacher = linear_interp_time(teacher, z.shape[1])
    loss_distill = jnp.mean(jnp.abs(z - teacher))
    loss = loss_f0 + loss_distill * distill_weight
    return loss, {"loss_f0": loss_f0, "loss_distill": loss_distill}


def make_train_step(cfg: TinyVCConfig, distill: bool = True):
    """Returns a jittable (state, wave, f0, teacher, key) -> (state, metrics).

    wave: [B, L] clean audio; f0: [B, F] clean pitch labels (Hz); teacher:
    [B, Ft, 768] teacher features at any frame rate (interpolated to ours).

    ``distill=False`` compiles a step WITHOUT the distillation term (teacher
    arg ignored): used when no WavLM teacher is available, so the content
    head stays trainable-but-unforced instead of being pulled toward zeros.
    """
    encoder = Encoder(cfg.encoder)
    tx = make_optimizer(cfg)
    class_weights = jnp.ones((cfg.encoder.num_pitch_classes,), jnp.float32)
    class_weights = class_weights.at[0].set(cfg.train.unvoiced_class_weight)

    @jax.jit
    def train_step(state: EncoderTrainState, wave, f0, teacher, key):
        # labels from clean f0 (reference `train_encoder.py:83`)
        labels = freq2id(
            f0,
            cfg.encoder.num_pitch_classes,
            cfg.encoder.classes_per_octave,
            cfg.encoder.min_frequency,
        )
        # volume augmentation AFTER labelling (reference `train_encoder.py:86`)
        gain = jax.random.uniform(key, (wave.shape[0], 1)) * 2.0
        wave = wave * gain
        spec = spectrogram(wave, cfg.audio.n_fft, cfg.audio.hop_size)

        def loss_fn(p):
            return encoder_loss(
                encoder, p, spec, labels, teacher, class_weights,
                cfg.train.distill_weight if distill else 0.0,
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = EncoderTrainState(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        metrics = dict(metrics, loss=loss)
        return new_state, metrics

    return train_step
