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

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_kernel_init():
    """torch's Linear/Conv default ``kaiming_uniform_(a=sqrt(5))``:
    U(+-sqrt(1/fan_in)). Matching the reference's init distributions keeps
    from-scratch training dynamics comparable (flax's lecun-normal default
    has a different scale and no heavy-ish uniform tails)."""
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    """torch's Linear/Conv default bias init: U(+-1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_dense(
    features: int, in_features: int, dtype=jnp.float32, name: str | None = None
) -> nn.Dense:
    """``nn.Dense`` with torch's default init; the param tree is identical to
    a plain Dense (checkpoint/weight-transfer compatible)."""
    return nn.Dense(
        features,
        dtype=dtype,
        name=name,
        kernel_init=torch_kernel_init(),
        bias_init=torch_bias_init(in_features),
    )


def replicate_pad_time(x: jnp.ndarray, left: int, right: int) -> jnp.ndarray:
    """Edge-pad the time axis of ``[B, T, C]``."""
    if left == 0 and right == 0:
        return x
    return jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="edge")


def _dot_cf(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """``einsum('bct,cf->bft')`` with fp32 accumulation. XLA's CPU backend
    has no bf16 x bf16 -> f32 dot thunk for this contraction pattern, so
    bf16 operands are promoted on CPU (TPU keeps bf16 MXU inputs)."""
    if x.dtype == jnp.bfloat16 and jax.default_backend() in ("cpu",):
        x, w = x.astype(jnp.float32), w.astype(jnp.float32)
    return jnp.einsum("bct,cf->bft", x, w, preferred_element_type=jnp.float32)


class Dense1x1CF(nn.Module):
    """1x1 conv on channels-first ``[B, C, T]`` with the SAME param tree as
    ``nn.Dense`` (kernel ``[in, out]``, bias ``[out]``) so channels-first and
    channels-last model variants share checkpoints bit-for-bit.

    Channels-first keeps the (large) time axis on the TPU lane dimension;
    channels-last waveform-rate tensors with 16-48 channels lane-pad to 128
    (~3-8x HBM bloat), which dominates the training U-Net's step time."""

    features: int
    in_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", torch_kernel_init(), (self.in_features, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", torch_bias_init(self.in_features), (self.features,),
            jnp.float32,
        )
        y = _dot_cf(x.astype(self.dtype), kernel.astype(self.dtype))
        return (y + bias[:, None]).astype(self.dtype)


class DepthwiseConv1d(nn.Module):
    """Depthwise conv along time with replicate padding (torch ``groups=C``)."""

    features: int
    kernel_size: int = 7
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, d = self.kernel_size, self.dilation
        pad = (k * d - d) // 2
        # torch depthwise fan_in = k (in_channels/groups = 1)
        kernel = self.param(
            "kernel",
            torch_kernel_init(),
            (k, 1, self.features),
            jnp.float32,
        )
        bias = self.param("bias", torch_bias_init(k), (self.features,), jnp.float32)
        x = replicate_pad_time(x.astype(self.dtype), pad, pad)
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(self.dtype),
            window_strides=(1,),
            padding="VALID",
            rhs_dilation=(d,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.features,
            preferred_element_type=jnp.float32,
        )
        return (y + bias).astype(self.dtype)


class Conv1d(nn.Module):
    """Full conv along time. ``padding='replicate'`` matches torch's
    replicate padding_mode; ``'zeros'`` matches the torch default.

    ``impl='unfold'`` lowers the conv as k shifted views concatenated on the
    channel axis followed by ONE [k*Cin, Cout] matmul — on TPU this lands on
    the MXU, whereas XLA's native lowering of tiny-channel convs (the
    waveform-rate U-Net is 17-384 channels) runs an order of magnitude below
    peak. ``impl='phased'`` reshapes the time axis into phase blocks of
    ``dilation`` samples with block-diagonal weights [k*d*Cin, d*Cout] —
    wider MXU dims at the cost of d-fold structural zeros; measured SLOWER
    than 'unfold' on v5e for this model's shapes (187 vs 88 ms for the full
    U-Net), kept as an option for wider-channel configs."""

    features: int
    kernel_size: int
    dilation: int = 1
    padding: str = "replicate"
    dtype: jnp.dtype = jnp.float32
    impl: str = "unfold"  # 'unfold' | 'phased' | 'lax' | 'auto'
    channels_first: bool = False  # x is [B, C, T]; same params as [B, T, C]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, d = self.kernel_size, self.dilation
        pad = (k * d - d) // 2
        in_features = x.shape[1] if self.channels_first else x.shape[-1]
        kernel = self.param(
            "kernel",
            torch_kernel_init(),
            (k, in_features, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", torch_bias_init(k * in_features), (self.features,), jnp.float32
        )
        x = x.astype(self.dtype)
        if self.channels_first:
            # unfold on the sublane (channel) axis: k time-shifted views
            # stacked over C, one [k*Cin, Cout] contraction with time on
            # lanes — no 128-lane padding of small channel counts
            T = x.shape[-1]
            mode = "edge" if self.padding == "replicate" else "constant"
            xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)), mode=mode)
            views = [xp[:, :, i * d : i * d + T] for i in range(k)]
            xu = jnp.concatenate(views, axis=1)  # [B, k*Cin, T]
            w = kernel.reshape(k * in_features, self.features).astype(self.dtype)
            y = _dot_cf(xu, w)
            return (y + bias[:, None]).astype(self.dtype)
        impl = self.impl
        if impl == "auto":
            impl = (
                "phased"
                if (d > 1 and k == 3 and self.padding == "replicate")
                else "unfold"
            )
        if impl == "phased":
            return self._phased(x, kernel, bias, k, d)
        if impl == "taps":
            # k separate matmuls on shifted views, summed — no concat
            # materialisation, narrower contraction dim
            T = x.shape[-2]
            xp = replicate_pad_time(x, pad, pad) if self.padding == "replicate" else (
                jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
            )
            y = None
            for i in range(k):
                yi = jnp.einsum(
                    "btc,cf->btf",
                    xp[:, i * d : i * d + T, :],
                    kernel[i].astype(self.dtype),
                    preferred_element_type=jnp.float32,
                )
                y = yi if y is None else y + yi
            return (y + bias).astype(self.dtype)
        if impl == "unfold":
            T = x.shape[-2]
            xp = replicate_pad_time(x, pad, pad) if self.padding == "replicate" else (
                jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
            )
            views = [xp[:, i * d : i * d + T, :] for i in range(k)]
            xu = jnp.concatenate(views, axis=-1)  # [B, T, k*Cin]
            w = kernel.reshape(k * in_features, self.features).astype(self.dtype)
            y = jnp.einsum(
                "btc,cf->btf", xu, w, preferred_element_type=jnp.float32
            )
            return (y + bias).astype(self.dtype)
        if self.padding == "replicate":
            x = replicate_pad_time(x, pad, pad)
            padding = "VALID"
        else:
            padding = [(pad, pad)]
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(self.dtype),
            window_strides=(1,),
            padding=padding,
            rhs_dilation=(d,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32,
        )
        return (y + bias).astype(self.dtype)

    def _phased(self, x, kernel, bias, k: int, d: int) -> jnp.ndarray:
        """Dilated k=3 conv as phase blocks + block-diagonal matmul.

        Samples t = j*d + r: tap t +/- d lands in blocks j +/- 1 at the SAME
        phase r, so reshaping time into [nb, d] blocks turns the dilated conv
        into an ordinary k=3 conv over blocks with per-phase (block-diagonal)
        weights [k*d*Cin, d*Cout].
        """
        B, T, C = x.shape
        Co = self.features
        align = (-T) % d
        # edge-pad left/right by d (replicate ~ the conv's own padding; with
        # pad >= d the taps that reach past the sequence read the edge value,
        # matching replicate padding_mode exactly), plus right alignment
        xp = replicate_pad_time(x, d, d + align)
        nb = (T + align) // d + 2
        blocks = xp.reshape(B, nb, d * C)
        xu = jnp.concatenate(
            [blocks[:, :-2], blocks[:, 1:-1], blocks[:, 2:]], axis=-1
        )  # [B, nb-2, 3*d*C]
        eye = jnp.eye(d, dtype=self.dtype)
        wd = (
            kernel.astype(self.dtype)[:, None, :, None, :]
            * eye[None, :, None, :, None]
        ).reshape(k * d * C, d * Co)
        y = jnp.einsum("btc,cf->btf", xu, wd, preferred_element_type=jnp.float32)
        y = y.reshape(B, (nb - 2) * d, Co)[:, :T]
        return (y + bias).astype(self.dtype)


class ChannelLayerNorm(nn.Module):
    """LayerNorm over channels (reference `convnext.py:7-19`, eps 1e-5).
    Statistics always in fp32 for stability under bf16 compute."""

    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (c,), jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps) * gamma + beta
        return y.astype(self.dtype)


class GRN(nn.Module):
    """Global response normalisation over the time axis
    (reference `convnext.py:23-34`; note: the global L2 is over *time*, so
    outputs depend on the whole window — streaming must recompute windows).

    ``time_axis_name``: when the time axis is sharded across devices
    (long-utterance sequence parallelism), set this to the mesh axis name and
    the squared-sum is ``psum``-reduced so every shard sees the *global*
    statistic — GRN is the only op in the model with unbounded receptive
    field, so this single collective makes time-sharding exact.
    ``time_halo``: frames at each end of the local segment excluded from the
    statistic (overlap-save halos must not be double-counted in the psum).
    ``time_batch_reduce``: the batch rows are time-chunks of ONE sequence
    (batch-native chunked inference, parallel/time_shard.py::
    time_batched_convert with native=True) — the statistic additionally
    sums over the batch axis, the un-vmapped equivalent of the psum."""

    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    time_axis_name: str | None = None
    time_halo: int = 0
    time_batch_reduce: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.zeros, (c,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (c,), jnp.float32)
        x32 = x.astype(jnp.float32)
        if self.time_halo > 0:
            core = x32[..., self.time_halo : x32.shape[-2] - self.time_halo, :]
        else:
            core = x32
        sq = jnp.sum(core * core, axis=-2, keepdims=True)  # [B, 1, C]
        if self.time_batch_reduce:
            sq = jnp.sum(sq, axis=0, keepdims=True)  # chunk rows -> global
        if self.time_axis_name is not None:
            sq = jax.lax.psum(sq, self.time_axis_name)
        gx = jnp.sqrt(sq)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + self.eps)
        return (gamma * (x32 * nx) + beta + x32).astype(self.dtype)


def exact_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


class ConvNeXtLayer(nn.Module):
    """ConvNeXt-v2 block (reference `convnext.py:38-58`):
    depthwise k=7 -> LN -> 1x1 (x mlp_mul) -> GELU -> GRN -> 1x1 + residual."""

    channels: int
    kernel_size: int = 7
    mlp_mul: int = 2
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32
    grn_time_axis: str | None = None
    grn_time_halo: int = 0
    grn_time_batch: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        res = x
        x = DepthwiseConv1d(
            self.channels, self.kernel_size, self.dilation, dtype=self.dtype,
            name="dw",
        )(x)
        x = ChannelLayerNorm(dtype=self.dtype, name="norm")(x)
        x = torch_dense(
            self.channels * self.mlp_mul, self.channels, dtype=self.dtype, name="pw1"
        )(x)
        x = exact_gelu(x)
        x = GRN(
            dtype=self.dtype,
            time_axis_name=self.grn_time_axis,
            time_halo=self.grn_time_halo,
            time_batch_reduce=self.grn_time_batch,
            name="grn",
        )(x)
        x = torch_dense(
            self.channels, self.channels * self.mlp_mul, dtype=self.dtype, name="pw2"
        )(x)
        return x + res


class ConvNeXtStack(nn.Module):
    """Input 1x1 -> LN -> N ConvNeXt blocks -> output 1x1 (the shared shape of
    PitchEstimator / SSLFeatureEstimator / SourceNet trunks)."""

    channels: int
    out_features: int
    dilations: Sequence[int]
    kernel_size: int = 7
    dtype: jnp.dtype = jnp.float32
    grn_time_axis: str | None = None
    grn_time_halo: int = 0
    grn_time_batch: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = torch_dense(
            self.channels, x.shape[-1], dtype=self.dtype, name="input_layer"
        )(x)
        x = ChannelLayerNorm(dtype=self.dtype, name="norm")(x)
        for i, d in enumerate(self.dilations):
            x = ConvNeXtLayer(
                self.channels, self.kernel_size, dilation=d, dtype=self.dtype,
                grn_time_axis=self.grn_time_axis,
                grn_time_halo=self.grn_time_halo,
                grn_time_batch=self.grn_time_batch,
                name=f"layer_{i}",
            )(x)
        return torch_dense(
            self.out_features, self.channels, dtype=self.dtype, name="output_layer"
        )(x)


class FiLM(nn.Module):
    """Feature-wise linear modulation (reference `decoder.py:88-97`).

    With ``channels_first`` both ``x`` and ``cond`` are ``[B, C, T]``; the
    param tree is identical to the channels-last form."""

    dtype: jnp.dtype = jnp.float32
    channels_first: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        if self.channels_first:
            c, cc = x.shape[1], cond.shape[1]
            scale = Dense1x1CF(c, cc, dtype=self.dtype, name="to_scale")(cond)
            shift = Dense1x1CF(c, cc, dtype=self.dtype, name="to_shift")(cond)
            return x * scale + shift
        c = x.shape[-1]
        scale = torch_dense(c, cond.shape[-1], dtype=self.dtype, name="to_scale")(cond)
        shift = torch_dense(c, cond.shape[-1], dtype=self.dtype, name="to_shift")(cond)
        return x * scale + shift
