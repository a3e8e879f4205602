"""HiFi-GAN-style discriminators: multi-period (MPD) + multi-resolution (MRD).

Behavioural spec: `module/tinyvc/discriminator.py:10-144`. NCHW layout
(torch-matching; see WNConv2d for the TPU tiling rationale); all
MPD/MRD convs are weight-normalised (torch ``weight_norm`` with per-output-
channel norm, `discriminator.py:14,80`), implemented here as explicit
``v``/``g`` parameters so the normalisation is part of the traced graph.

Reference quirk, reproduced behind a flag: `discriminator.py:104` computes
``F.leaky_relu(x, 0.1)`` and discards the result, so the MRD conv stack is
effectively activation-free. ``DiscriminatorConfig.mrd_fixed_activation``
(default False) keeps the faithful behaviour; set True for the intended one.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import DiscriminatorConfig
from ..dsp.stft import stft_magnitude
from .layers import torch_bias_init, torch_kernel_init


class WNConv2d(nn.Module):
    """Conv2d with weight normalisation (w = g * v / ||v||_out)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    pad_mode: str = "zeros"  # 'zeros' | 'replicate'
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, C, H, W] (NCHW — on TPU the minor-most two dims are the
        tiled ones, so channels stay un-padded and the small W axis rides
        the sublane; the reference-shaped NHWC activations pad W->8 and
        C->128, a measured ~16x HBM bloat and 19 ms of the GAN step)."""
        kh, kw = self.kernel_size
        cin = x.shape[1]
        # torch init: conv weight kaiming_uniform(a=sqrt(5)); weight_norm
        # then reparametrises the SAME tensor as v=w, g=||w|| per output
        # channel (`/root/reference/module/tinyvc/discriminator.py:14,80`),
        # so the effective initial weight equals the plain conv init.
        # Params and the weight-norm math are always fp32; ``compute_dtype``
        # casts only the conv operands (mixed precision, reference `-fp16`).
        v = self.param(
            "v", torch_kernel_init(), (kh, kw, cin, self.features),
            jnp.float32,
        )
        g = self.param(
            "g",
            lambda key, shape, dtype=jnp.float32: jnp.sqrt(
                jnp.sum(v * v, axis=(0, 1, 2))
            ).astype(dtype),
            (self.features,),
            jnp.float32,
        )
        bias = self.param(
            "bias", torch_bias_init(kh * kw * cin), (self.features,),
            jnp.float32,
        )
        norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2), keepdims=True) + 1e-12)
        w = (v / norm * g).transpose(3, 2, 0, 1)  # [cout, cin, kh, kw]
        dt = jnp.dtype(self.compute_dtype)
        if dt != jnp.float32:
            x, w, bias = x.astype(dt), w.astype(dt), bias.astype(dt)
        ph, pw = self.padding
        if self.pad_mode == "replicate" and (ph or pw):
            x = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)), mode="edge")
            padding = "VALID"
        else:
            padding = [(ph, ph), (pw, pw)]
        y = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=self.strides,
            padding=padding,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return y + bias[None, :, None, None]


class DiscriminatorP(nn.Module):
    """Period-folded 2D conv discriminator (reference `discriminator.py:10-45`)."""

    period: int
    channels: int = 32
    channels_mul: int = 2
    max_channels: int = 256
    num_layers: int = 4
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: [B, T] waveform -> (logits, feature maps)."""
        B, T = x.shape
        p = self.period
        if T % p != 0:
            n_pad = p - (T % p)
            x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
            T = T + n_pad
        x = x.reshape(B, 1, T // p, p)

        fmap: List[jnp.ndarray] = []
        c = self.channels
        x = WNConv2d(c, (5, 1), (3, 1), (2, 0), pad_mode="replicate",
                     compute_dtype=self.compute_dtype, name="conv_0")(x)
        x = nn.leaky_relu(x, 0.1)
        fmap.append(x)
        for i in range(self.num_layers):
            c = min(c * self.channels_mul, self.max_channels)
            x = WNConv2d(
                c, (5, 1), (3, 1), (2, 0), pad_mode="replicate",
                compute_dtype=self.compute_dtype, name=f"conv_{i + 1}"
            )(x)
            x = nn.leaky_relu(x, 0.1)
            fmap.append(x)
        x = WNConv2d(1, (3, 1), (1, 1), (1, 0), pad_mode="replicate",
                     compute_dtype=self.compute_dtype, name="post")(x)
        fmap.append(x)
        return x, fmap


class DiscriminatorR(nn.Module):
    """STFT-magnitude 2D conv discriminator (reference `discriminator.py:77-108`)."""

    resolution: int
    channels: int = 32
    max_channels: int = 256
    num_layers: int = 4
    fixed_activation: bool = False
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: [B, T] waveform -> (logits, feature maps)."""
        n_fft = self.resolution * 4
        # fp32 spectrogram, frame 0 kept (torch.stft default, `discriminator.py:91-96`)
        spec = stft_magnitude(x, n_fft, self.resolution, drop_first=False)
        # torch layout is [B, bins, frames]; ours [B, frames, bins]. Put bins
        # on H (the strided axis) to match the reference's conv geometry.
        h = jnp.swapaxes(spec, 1, 2)[:, None]  # [B, 1, bins, frames]

        fmap: List[jnp.ndarray] = []
        c = self.channels
        h = WNConv2d(c, (7, 3), (2, 1), (3, 1),
                     compute_dtype=self.compute_dtype, name="conv_0")(h)
        if self.fixed_activation:
            h = nn.leaky_relu(h, 0.1)
        fmap.append(h)
        for i in range(self.num_layers):
            c = min(c * 2, self.max_channels)
            h = WNConv2d(c, (5, 3), (2, 1), (2, 1),
                         compute_dtype=self.compute_dtype,
                         name=f"conv_{i + 1}")(h)
            if self.fixed_activation:
                h = nn.leaky_relu(h, 0.1)
            fmap.append(h)
        h = WNConv2d(1, (3, 3), (1, 1), (1, 1),
                     compute_dtype=self.compute_dtype, name="post")(h)
        fmap.append(h)
        return h, fmap


class Discriminator(nn.Module):
    """MPD + MRD ensemble (reference `discriminator.py:134-144`)."""

    cfg: DiscriminatorConfig = DiscriminatorConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: [B, T] -> (list of logits, list of feature maps)."""
        logits: List[jnp.ndarray] = []
        feats: List[jnp.ndarray] = []
        for p in self.cfg.periods:
            logit, fmap = DiscriminatorP(
                p,
                channels=self.cfg.channels,
                max_channels=self.cfg.max_channels,
                num_layers=self.cfg.num_layers,
                compute_dtype=self.cfg.compute_dtype,
                name=f"mpd_{p}",
            )(x)
            logits.append(logit)
            feats.extend(fmap)
        for r in self.cfg.resolutions:
            logit, fmap = DiscriminatorR(
                r,
                channels=self.cfg.channels,
                max_channels=self.cfg.max_channels,
                num_layers=self.cfg.num_layers,
                fixed_activation=self.cfg.mrd_fixed_activation,
                compute_dtype=self.cfg.compute_dtype,
                name=f"mrd_{r}",
            )(x)
            logits.append(logit)
            feats.extend(fmap)
        return logits, feats
