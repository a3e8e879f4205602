"""Source-filter DDSP vocoder: SourceNet + oscillators + FilterNet U-Net.

Behavioural spec: `module/tinyvc/decoder.py:24-266`. TPU-first design notes:

- the harmonic bank integrates phase ONCE (cumsum of f0/sr in fp32) and
  multiplies by the harmonic index afterwards — ``(k*I) mod 1`` — instead of
  the reference's per-harmonic cumsum (`decoder.py:50`); mathematically
  identical, 15x less scan work.
- noise synthesis stays in the Fourier domain (random phase x predicted
  kernel -> ISTFT) with an explicit PRNG key replacing ``torch.rand``
  (`decoder.py:78`).
- the whole DSP stage runs in fp32 regardless of the compute dtype, like
  the reference's ``@torch.cuda.amp.autocast(enabled=False)`` (`decoder.py:259`).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import AudioConfig, DecoderConfig
from ..dsp.interp import (
    downsample_time_int,
    downsample_time_int_t,
    linear_interp_last,
    upsample_frames_to_samples,
    upsample_time_int,
    upsample_time_int_t,
)
from ..dsp.phase import wrapped_exclusive_prefix
from ..dsp.stft import istft
from .layers import Conv1d, ConvNeXtLayer, Dense1x1CF, FiLM, torch_dense


def oscillate_harmonics(
    f0: jnp.ndarray,
    frame_size: int = 480,
    sample_rate: int = 24000,
    num_harmonics: int = 14,
    min_frequency: float = 20.0,
    phase0: jnp.ndarray | float = 0.0,
) -> jnp.ndarray:
    """f0 ``[B, F]`` (frame rate) -> harmonics ``[B, F*frame_size, H+1]``.

    Linear-interp f0 to waveform rate, integrate phase (fp32 cumsum), emit
    ``sin(2*pi*((k * I) mod 1))`` masked by the interpolated voiced mask
    (reference `decoder.py:24-54`). ``phase0`` (cycles, [B] or scalar) seeds
    the integrator — used by time-sharded inference to keep phase continuous
    across sequence shards.
    """
    C = num_harmonics + 1
    B, F = f0.shape
    Lw = F * frame_size
    f0w = linear_interp_last(f0.astype(jnp.float32), Lw)  # [B, Lw]
    # Two-level mod-1 phase integration (same scheme as the Pallas kernel):
    # intra-frame cumsum stays small, per-frame sums are wrapped mod 1 before
    # the frame-level prefix. Only phase mod 1 matters (integer harmonics),
    # and this keeps fp32 rounding at the ~1e-6-cycle level instead of the
    # unbounded drift of a flat cumsum (reference `decoder.py:50` drifts) —
    # it also makes time-sharded synthesis agree across shard counts.
    d = (f0w / sample_rate).reshape(B, F, frame_size)
    intra = jnp.cumsum(d, axis=-1)  # [B, F, frame]
    frame_sums = intra[..., -1]
    fs_mod = frame_sums - jnp.floor(frame_sums)
    # hierarchical (two-level mod-1) exclusive prefix: no detune on
    # multi-hour utterances (a flat fp32 cumsum drifts past ~30k frames)
    offsets = wrapped_exclusive_prefix(fs_mod)
    phase = (
        jnp.reshape(jnp.asarray(phase0, jnp.float32), (-1, 1, 1))
        + offsets[..., None]
        + intra
    ).reshape(B, Lw)
    k = jnp.arange(1, C + 1, dtype=jnp.float32)
    theta = 2.0 * math.pi * jnp.mod(phase[..., None] * k, 1.0)  # [B, Lw, C]
    uv = linear_interp_last((f0 > min_frequency).astype(jnp.float32), Lw)
    return jnp.sin(theta) * uv[..., None]


def oscillate_noise(
    kernel: jnp.ndarray,
    key: jax.Array,
    frame_size: int = 480,
    n_fft: int = 1920,
    angle: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Filtered noise branch (reference `decoder.py:63-85`).

    kernel: ``[B, F, fft_bin]`` non-negative magnitude filter. A random-phase
    unit-magnitude spectrum is multiplied by the kernel (Fourier-domain
    convolution with gaussian-like noise), one zero frame is prepended
    (mirroring the dropped analysis frame 0), then ISTFT -> ``[B, F*frame_size]``.

    ``angle`` overrides the random phase (deterministic tests / parity runs).
    """
    B, F, bins = kernel.shape
    kernel = kernel.astype(jnp.float32)
    if angle is None:
        angle = jax.random.uniform(
            key, (B, F, bins), minval=-math.pi, maxval=math.pi, dtype=jnp.float32
        )
    noise_stft = jax.lax.complex(jnp.cos(angle), jnp.sin(angle)) * kernel
    noise_stft = jnp.pad(noise_stft, ((0, 0), (1, 0), (0, 0)))
    return istft(noise_stft, n_fft, frame_size)


def _log_f0_feature(f0: jnp.ndarray) -> jnp.ndarray:
    """``log(relu(f0) + 1e-6)`` (reference `decoder.py:128`, `decoder.py:227`)."""
    return jnp.log(jnp.maximum(f0, 0.0) + 1e-6)[..., None]


class SourceNet(nn.Module):
    """Estimates per-harmonic amplitudes and the noise filter kernel
    (reference `decoder.py:102-134`)."""

    cfg: DecoderConfig = DecoderConfig()
    audio: AudioConfig = AudioConfig()
    time_axis_name: str | None = None
    time_halo: int = 0
    time_batch: bool = False

    @nn.compact
    def __call__(
        self, content: jnp.ndarray, f0: jnp.ndarray, energy: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """content [B,F,768], f0 [B,F], energy [B,L] -> (amps [B,F,H+1],
        kernel [B,F,fft_bin])."""
        B, L = energy.shape
        frame = self.audio.hop_size
        # non-overlapping max-pool of waveform-rate energy to frame rate
        # (reference `decoder.py:127`)
        energy_f = jnp.max(energy.reshape(B, L // frame, frame), axis=-1)

        dt = jnp.dtype(self.cfg.compute_dtype)
        ch = self.cfg.source_channels
        x = (
            torch_dense(ch, content.shape[-1], dtype=dt, name="content_in")(content)
            + torch_dense(ch, 1, dtype=dt, name="energy_in")(energy_f[..., None])
            + torch_dense(ch, 1, dtype=dt, name="f0_in")(_log_f0_feature(f0))
        )
        for i in range(self.cfg.source_num_layers):
            x = ConvNeXtLayer(
                self.cfg.source_channels,
                self.cfg.source_kernel_size,
                dtype=dt,
                grn_time_axis=self.time_axis_name,
                grn_time_halo=self.time_halo,
                grn_time_batch=self.time_batch,
                name=f"layer_{i}",
            )(x)
        # elu + 1 keeps both heads positive with nonvanishing gradient
        # (reference `decoder.py:132-133`). Heads in fp32: they feed the DSP.
        x = x.astype(jnp.float32)
        amps = (
            jax.nn.elu(
                torch_dense(self.cfg.num_harmonics + 1, ch, name="to_amps")(x)
            )
            + 1.0
        )
        kernel = (
            jax.nn.elu(torch_dense(self.audio.fft_bin, ch, name="to_kernel")(x)) + 1.0
        )
        return amps, kernel


class Downsample(nn.Module):
    """Linear-interp down + residual dilated conv stack
    (reference `decoder.py:137-157`). ``channels_first`` runs the same math
    on ``[B, C, T]`` (identical param tree; time stays on TPU lanes)."""

    out_features: int
    factor: int = 4
    dtype: jnp.dtype = jnp.float32
    conv_impl: str = "unfold"
    channels_first: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cf = self.channels_first
        c_in = x.shape[1] if cf else x.shape[-1]
        x = (downsample_time_int_t if cf else downsample_time_int)(x, self.factor)
        if cf:
            res = Dense1x1CF(
                self.out_features, c_in, dtype=self.dtype, name="down_res"
            )(x)
        else:
            res = torch_dense(
                self.out_features, c_in, dtype=self.dtype, name="down_res"
            )(x)
        im = self.conv_impl
        x = nn.leaky_relu(x, 0.1)
        x = Conv1d(
            c_in, 3, dilation=1, dtype=self.dtype, impl=im, channels_first=cf,
            name="c1",
        )(x)
        x = nn.leaky_relu(x, 0.1)
        x = Conv1d(
            c_in, 3, dilation=2, dtype=self.dtype, impl=im, channels_first=cf,
            name="c2",
        )(x)
        x = nn.leaky_relu(x, 0.1)
        x = Conv1d(
            self.out_features, 3, dilation=4, dtype=self.dtype, impl=im,
            channels_first=cf, name="c3",
        )(x)
        return x + res


class Upsample(nn.Module):
    """Linear-interp up + two FiLM-conditioned residual groups
    (reference `decoder.py:160-190`). ``channels_first`` as in
    :class:`Downsample`."""

    out_features: int
    factor: int = 4
    dtype: jnp.dtype = jnp.float32
    conv_impl: str = "unfold"
    channels_first: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        cf = self.channels_first
        c_in = x.shape[1] if cf else x.shape[-1]
        im = self.conv_impl
        x = (upsample_time_int_t if cf else upsample_time_int)(x, self.factor)
        res = x
        x = nn.leaky_relu(x, 0.1)
        x = Conv1d(
            c_in, 3, dilation=1, dtype=self.dtype, impl=im, channels_first=cf,
            name="c1",
        )(x)
        x = nn.leaky_relu(x, 0.1)
        x = Conv1d(
            c_in, 3, dilation=3, dtype=self.dtype, impl=im, channels_first=cf,
            name="c2",
        )(x)
        x = FiLM(dtype=self.dtype, channels_first=cf, name="film1")(x, cond)
        x = x + res
        res = x
        x = nn.leaky_relu(x, 0.1)
        x = Conv1d(
            c_in, 3, dilation=9, dtype=self.dtype, impl=im, channels_first=cf,
            name="c3",
        )(x)
        x = nn.leaky_relu(x, 0.1)
        x = Conv1d(
            c_in, 3, dilation=27, dtype=self.dtype, impl=im, channels_first=cf,
            name="c4",
        )(x)
        x = FiLM(dtype=self.dtype, channels_first=cf, name="film2")(x, cond)
        x = x + res
        if cf:
            return Dense1x1CF(
                self.out_features, c_in, dtype=self.dtype, name="c5"
            )(x)
        return torch_dense(self.out_features, c_in, dtype=self.dtype, name="c5")(x)


class FilterNet(nn.Module):
    """Waveform-rate U-Net refining the DSP source into the final waveform
    (reference `decoder.py:193-233`). Down path ingests cat(source, energy);
    skips FiLM-condition the up path; total upsampling = prod(factors) =
    frame_size."""

    cfg: DecoderConfig = DecoderConfig()

    @nn.compact
    def __call__(
        self,
        content: jnp.ndarray,
        f0: jnp.ndarray,
        energy: jnp.ndarray,
        source: jnp.ndarray,
        source_channels_first: bool = False,
    ) -> jnp.ndarray:
        """content [B,F,768], f0 [B,F], energy [B,L], source [B,L,H+2]
        (``[B,H+2,L]`` with ``source_channels_first``) -> [B,L].

        ``cfg.filter_layout == 'cf'`` runs the whole waveform-rate U-Net
        channels-first — identical params and math, but small channel counts
        (17-48) stay on 8-granular sublanes instead of lane-padding to 128,
        cutting HBM traffic several-fold in BOTH the forward and backward
        pass (this is the training-path counterpart of the fused serving
        kernels' transposed layout)."""
        channels = list(self.cfg.filter_channels)
        factors = list(self.cfg.filter_factors)
        dt = jnp.dtype(self.cfg.compute_dtype)
        cf = self.cfg.filter_layout == "cf"

        x = torch_dense(
            channels[0], content.shape[-1], dtype=dt, name="content_in"
        )(content) + torch_dense(channels[0], 1, dtype=dt, name="f0_in")(
            _log_f0_feature(f0)
        )

        if cf:
            x = jnp.swapaxes(x, 1, 2)  # frame rate: cheap
            if not source_channels_first:
                source = jnp.swapaxes(source, 1, 2)
            src = jnp.concatenate([source, energy[:, None, :]], axis=1)
        else:
            if source_channels_first:
                source = jnp.swapaxes(source, 1, 2)
            src = jnp.concatenate([source, energy[..., None]], axis=-1)

        # down path: stem conv at waveform rate, then 4 Downsamples.
        # remat: each block's interior activations (10+ waveform-rate tensors)
        # are recomputed in the backward pass instead of held in HBM
        Down = nn.remat(Downsample) if self.cfg.remat else Downsample
        Up = nn.remat(Upsample) if self.cfg.remat else Upsample
        im = self.cfg.conv_impl
        skips = []
        src = Conv1d(
            channels[-1], 3, dtype=dt, impl=im, channels_first=cf, name="down_0"
        )(src)
        skips.append(src)
        cs = list(reversed(channels[1:]))
        ns = cs[1:] + [channels[0]]
        fs = list(reversed(factors[1:]))
        for i, (n, f) in enumerate(zip(ns, fs)):
            src = Down(
                n, f, dtype=dt, conv_impl=im, channels_first=cf,
                name=f"down_{i + 1}",
            )(src)
            skips.append(src)

        # up path
        ns_up = channels[1:] + [channels[-1]]
        for i, (n, f) in enumerate(zip(ns_up, factors)):
            x = Up(
                n, f, dtype=dt, conv_impl=im, channels_first=cf, name=f"up_{i}"
            )(x, skips[len(skips) - 1 - i])
        out = Conv1d(1, 7, channels_first=cf, name="output_layer")(x)  # fp32
        if cf:
            return out[:, 0, :].astype(jnp.float32)
        return out[..., 0].astype(jnp.float32)


class Decoder(nn.Module):
    """SourceNet -> DSP -> FilterNet (reference `decoder.py:236-266`)."""

    cfg: DecoderConfig = DecoderConfig()
    audio: AudioConfig = AudioConfig()
    time_axis_name: str | None = None
    time_halo: int = 0
    time_batch: bool = False

    def setup(self):
        self.source_net = SourceNet(
            self.cfg, self.audio, self.time_axis_name, self.time_halo,
            self.time_batch,
        )
        self.filter_net = FilterNet(self.cfg)

    def dsp(
        self,
        f0: jnp.ndarray,
        amps: jnp.ndarray,
        kernel: jnp.ndarray,
        key: jax.Array,
        noise_angle: jnp.ndarray | None = None,
        channels_first: bool = False,
        pack_energy: jnp.ndarray | None = None,
        pack_width: int = 0,
        fused_noise: bool = False,
    ) -> jnp.ndarray:
        """Additive harmonics x amplitudes, concat filtered noise -> source
        ``[B, L, H+2]`` (``[B, H+2, L]`` with ``channels_first`` — the
        serving layout: a waveform-rate [B, L, 16] is lane-padded 16->128 on
        TPU, ~8x HBM bloat). Forced fp32 (reference `decoder.py:259-266`).

        ``pack_energy``/``pack_width`` (channels_first only): append the
        energy row and zero rows up to ``pack_width`` inside this same
        concat, producing the fused FilterNet stem's input directly — the
        separate packing pass otherwise costs a full waveform-rate HBM
        round-trip (measured 1.95 ms at batch 16 x 10 s serving)."""
        # Pallas TPU kernels can't lower for CPU/GPU; respect both the global
        # backend and an active jax.default_device(cpu) override (used to
        # draw parameters on host when the TPU sits behind a slow tunnel).
        default_dev = getattr(jax.config, "jax_default_device", None)
        on_cpu = (
            jax.default_backend() in ("cpu", "gpu")
            or (default_dev is not None and default_dev.platform in ("cpu", "gpu"))
        )
        use_pallas = self.cfg.use_pallas == "on" or (
            self.cfg.use_pallas == "auto" and not on_cpu
        )
        if use_pallas:
            from ..ops.pallas.oscillator import oscillator_bank

            harmonics = oscillator_bank(
                f0.astype(jnp.float32),
                amps.astype(jnp.float32),
                self.audio.hop_size,
                self.audio.sample_rate,
                20.0,
                transpose_out=not channels_first,
                # f0 always comes from the frozen encoder (reference
                # `train_decoder.py:67-68,101`) — no df0 consumer exists
                grad_f0=False,
            )
        else:
            harmonics = oscillate_harmonics(
                f0,
                self.audio.hop_size,
                self.audio.sample_rate,
                self.cfg.num_harmonics,
            )
            amps_w = upsample_frames_to_samples(
                amps.astype(jnp.float32), self.audio.hop_size
            )
            harmonics = harmonics * amps_w
            if channels_first:
                harmonics = jnp.swapaxes(harmonics, 1, 2)
        if use_pallas and fused_noise and noise_angle is None:
            # serving only: pallas_oscillate_noise has no vjp — the
            # training step (grads wrt the learned noise filter `kernel`)
            # must keep the XLA branch
            # fused phase-synthesis + iDFT-matmul + OLA kernel; phases come
            # from its hash stream (seeded from `key`) instead of
            # jax.random — explicit-angle (parity) runs keep the XLA path
            from ..ops.pallas.noise import pallas_oscillate_noise

            seed = jax.random.randint(
                key, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
            noise = pallas_oscillate_noise(
                kernel.astype(jnp.float32), seed,
                self.audio.hop_size, self.audio.n_fft,
            )
        else:
            noise = oscillate_noise(
                kernel, key, self.audio.hop_size, self.audio.n_fft,
                angle=noise_angle,
            )
        if channels_first:
            parts = [harmonics, noise[:, None, :]]
            if pack_energy is not None:
                B, L = pack_energy.shape
                n_src = harmonics.shape[1] + 1
                parts.append(pack_energy[:, None, :].astype(harmonics.dtype))
                npad = pack_width - (n_src + 1)
                if npad > 0:
                    parts.append(jnp.zeros((B, npad, L), harmonics.dtype))
            return jnp.concatenate(parts, axis=1)
        return jnp.concatenate([harmonics, noise[..., None]], axis=-1)

    def infer(
        self,
        content: jnp.ndarray,
        f0: jnp.ndarray,
        energy: jnp.ndarray,
        key: jax.Array,
        noise_angle: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        cf = self.cfg.filter_layout == "cf"
        amps, kernel = self.source_net(content, f0, energy)
        source = self.dsp(
            f0, amps, kernel, key, noise_angle=noise_angle, channels_first=cf,
            fused_noise=noise_angle is None,
        )
        return self.filter_net(
            content, f0, energy, source, source_channels_first=cf
        )

    def train_forward(
        self,
        content: jnp.ndarray,
        f0: jnp.ndarray,
        energy: jnp.ndarray,
        key: jax.Array,
    ):
        """Like :meth:`infer` but also returns the DSP source, which feeds the
        auxiliary DSP loss (reference `train_decoder.py:105-109`). The source
        comes back ``[B, H+2, L]`` when ``cfg.filter_layout == 'cf'`` (sum
        over axis 1 for the DSP loss), else ``[B, L, H+2]``."""
        cf = self.cfg.filter_layout == "cf"
        amps, kernel = self.source_net(content, f0, energy)
        source = self.dsp(f0, amps, kernel, key, channels_first=cf)
        fake = self.filter_net(
            content, f0, energy, source, source_channels_first=cf
        )
        return fake, source

    def __call__(self, content, f0, energy, key, noise_angle=None):
        return self.infer(content, f0, energy, key, noise_angle=noise_angle)
