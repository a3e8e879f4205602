"""NN building blocks in channels-last ``[B, T, C]`` layout.

Behavioural spec: `module/tinyvc/convnext.py:7-58` (LayerNorm / GRN /
ConvNeXt-v2 layer) and `module/tinyvc/decoder.py:88-97` (FiLM). Design
differences from the reference, deliberate for TPU:

- channels-last layout: every 1x1 conv is a ``Dense`` on the lane axis
  (a plain MXU matmul); LayerNorm needs no transpose dance.
- depthwise conv is a ``lax.conv_general_dilated`` with
  ``feature_group_count=C`` over NHC layout, with explicit edge ("replicate")
  padding to match torch ``padding_mode='replicate'``.
- GELU uses the exact (erf) form: torch ``F.gelu`` default, whereas
  ``jax.nn.gelu`` defaults to the tanh approximation.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def replicate_pad_time(x: jnp.ndarray, left: int, right: int) -> jnp.ndarray:
    """Edge-pad the time axis of ``[B, T, C]``."""
    if left == 0 and right == 0:
        return x
    return jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="edge")


class DepthwiseConv1d(nn.Module):
    """Depthwise conv along time with replicate padding (torch ``groups=C``)."""

    features: int
    kernel_size: int = 7
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, d = self.kernel_size, self.dilation
        pad = (k * d - d) // 2
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, 1, self.features),
            x.dtype,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), x.dtype)
        x = replicate_pad_time(x, pad, pad)
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding="VALID",
            rhs_dilation=(d,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.features,
        )
        return y + bias


class Conv1d(nn.Module):
    """Full conv along time. ``padding='replicate'`` matches torch's
    replicate padding_mode; ``'zeros'`` matches the torch default."""

    features: int
    kernel_size: int
    dilation: int = 1
    padding: str = "replicate"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, d = self.kernel_size, self.dilation
        pad = (k * d - d) // 2
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, in_features, self.features),
            x.dtype,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), x.dtype)
        if self.padding == "replicate":
            x = replicate_pad_time(x, pad, pad)
            padding = "VALID"
        else:
            padding = [(pad, pad)]
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding=padding,
            rhs_dilation=(d,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        return y + bias


class ChannelLayerNorm(nn.Module):
    """LayerNorm over channels (reference `convnext.py:7-19`, eps 1e-5)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,), x.dtype)
        beta = self.param("beta", nn.initializers.zeros, (c,), x.dtype)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * gamma + beta


class GRN(nn.Module):
    """Global response normalisation over the time axis
    (reference `convnext.py:23-34`; note: the global L2 is over *time*, so
    outputs depend on the whole window — streaming must recompute windows)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.zeros, (c,), x.dtype)
        beta = self.param("beta", nn.initializers.zeros, (c,), x.dtype)
        gx = jnp.sqrt(jnp.sum(x * x, axis=-2, keepdims=True))  # [B, 1, C]
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + self.eps)
        return gamma * (x * nx) + beta + x


def exact_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


class ConvNeXtLayer(nn.Module):
    """ConvNeXt-v2 block (reference `convnext.py:38-58`):
    depthwise k=7 -> LN -> 1x1 (x mlp_mul) -> GELU -> GRN -> 1x1 + residual."""

    channels: int
    kernel_size: int = 7
    mlp_mul: int = 2
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        res = x
        x = DepthwiseConv1d(self.channels, self.kernel_size, self.dilation, name="dw")(x)
        x = ChannelLayerNorm(name="norm")(x)
        x = nn.Dense(self.channels * self.mlp_mul, name="pw1")(x)
        x = exact_gelu(x)
        x = GRN(name="grn")(x)
        x = nn.Dense(self.channels, name="pw2")(x)
        return x + res


class ConvNeXtStack(nn.Module):
    """Input 1x1 -> LN -> N ConvNeXt blocks -> output 1x1 (the shared shape of
    PitchEstimator / SSLFeatureEstimator / SourceNet trunks)."""

    channels: int
    out_features: int
    dilations: Sequence[int]
    kernel_size: int = 7

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.channels, name="input_layer")(x)
        x = ChannelLayerNorm(name="norm")(x)
        for i, d in enumerate(self.dilations):
            x = ConvNeXtLayer(
                self.channels, self.kernel_size, dilation=d, name=f"layer_{i}"
            )(x)
        return nn.Dense(self.out_features, name="output_layer")(x)


class FiLM(nn.Module):
    """Feature-wise linear modulation (reference `decoder.py:88-97`)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = nn.Dense(c, name="to_scale")(cond)
        shift = nn.Dense(c, name="to_shift")(cond)
        return x * scale + shift
