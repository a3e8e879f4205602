"""Content encoder: SSL-distilled feature head + pitch classifier.

Behavioural spec: `module/tinyvc/encoder.py:11-116`. Layout is ``[B, T, C]``
(spectrogram frames in, features out); every 1x1 conv of the reference is a
Dense here, which XLA maps straight onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import EncoderConfig
from .layers import ConvNeXtStack


def freq2id(
    f: jnp.ndarray,
    num_classes: int = 512,
    classes_per_octave: int = 48,
    min_frequency: float = 20.0,
) -> jnp.ndarray:
    """Log-spaced pitch class ids (reference `encoder.py:41-45`):
    ``ceil(clamp(cpo * log2(f / fmin), 0, nc - 1))``."""
    x = classes_per_octave * jnp.log2(f / min_frequency)
    x = jnp.clip(x, 0.0, num_classes - 1)
    return jnp.ceil(x).astype(jnp.int32)


def id2freq(
    ids: jnp.ndarray,
    classes_per_octave: int = 48,
    min_frequency: float = 20.0,
) -> jnp.ndarray:
    """Inverse of :func:`freq2id`; frequencies <= fmin map to 0
    (reference `encoder.py:48-54`)."""
    x = ids.astype(jnp.float32)
    f = min_frequency * 2.0 ** (x / classes_per_octave)
    return jnp.where(f <= min_frequency, 0.0, f)


def decode_f0(
    logits: jnp.ndarray,
    k: int = 4,
    classes_per_octave: int = 48,
    min_frequency: float = 20.0,
) -> jnp.ndarray:
    """Top-k softmax-weighted mean of class frequencies
    (reference `encoder.py:61-67`). logits ``[B, T, num_classes]`` ->
    f0 ``[B, T]``.

    k iterated argmax passes instead of ``lax.top_k`` — the latter lowers
    to a full 512-class sort on TPU (measured 1.1 ms of the serving
    pipeline at batch 16 x 10 s; the argmax form is ~0.1 ms)."""
    from ..ops.retrieval import top_k_small

    probs, indices = top_k_small(logits, k)
    probs = jax.nn.softmax(probs, axis=-1)
    freqs = id2freq(indices, classes_per_octave, min_frequency)
    f0 = jnp.sum(probs * freqs, axis=-1)
    return jnp.where(f0 <= min_frequency, 0.0, f0)


class PitchEstimator(nn.Module):
    """Spec [B,T,961] -> 512-class pitch logits (reference `encoder.py:11-38`)."""

    cfg: EncoderConfig = EncoderConfig()
    time_axis_name: str | None = None
    time_halo: int = 0
    time_batch: bool = False

    @nn.compact
    def __call__(self, spec: jnp.ndarray) -> jnp.ndarray:
        return ConvNeXtStack(
            channels=self.cfg.pitch_channels,
            out_features=self.cfg.num_pitch_classes,
            dilations=(1,) * self.cfg.pitch_num_layers,
            dtype=jnp.dtype(self.cfg.compute_dtype),
            grn_time_axis=self.time_axis_name,
            grn_time_halo=self.time_halo,
            grn_time_batch=self.time_batch,
            name="stack",
        )(spec)


class SSLFeatureEstimator(nn.Module):
    """Spec [B,T,961] -> 768-dim content features (reference `encoder.py:75-97`)."""

    cfg: EncoderConfig = EncoderConfig()
    time_axis_name: str | None = None
    time_halo: int = 0
    time_batch: bool = False

    @nn.compact
    def __call__(self, spec: jnp.ndarray) -> jnp.ndarray:
        return ConvNeXtStack(
            channels=self.cfg.ssl_channels,
            out_features=self.cfg.ssl_dim,
            dilations=self.cfg.ssl_dilations,
            dtype=jnp.dtype(self.cfg.compute_dtype),
            grn_time_axis=self.time_axis_name,
            grn_time_halo=self.time_halo,
            grn_time_batch=self.time_batch,
            name="stack",
        )(spec)


class Encoder(nn.Module):
    """Bundles both heads (reference `encoder.py:100-116`).

    ``__call__`` returns (content, f0_logits) for training;
    :meth:`infer` returns (content, decoded f0 [B, T]).
    """

    cfg: EncoderConfig = EncoderConfig()
    time_axis_name: str | None = None
    time_halo: int = 0
    time_batch: bool = False

    def setup(self):
        self.ssl_feature_estimator = SSLFeatureEstimator(
            self.cfg, self.time_axis_name, self.time_halo, self.time_batch
        )
        self.pitch_estimator = PitchEstimator(
            self.cfg, self.time_axis_name, self.time_halo, self.time_batch
        )

    def __call__(self, spec: jnp.ndarray):
        return self.ssl_feature_estimator(spec), self.pitch_estimator(spec)

    def infer(self, spec: jnp.ndarray):
        content, logits = self(spec)
        f0 = decode_f0(
            logits,
            k=self.cfg.pitch_topk,
            classes_per_octave=self.cfg.classes_per_octave,
            min_frequency=self.cfg.min_frequency,
        )
        return content, f0
