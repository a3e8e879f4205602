"""Typed configuration shared by training, inference, and export.

The reference (uthree/tinyvc) has no config object: hyperparameters live as
constructor defaults (`module/tinyvc/encoder.py:12-20`, `module/tinyvc/decoder.py:103-111`)
and argparse flags per script. Here a single frozen dataclass is the source of
truth so checkpoints, CLIs, and the export path can never disagree.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    """Global signal constants (reference: `module/utils/spectrogram.py:8`,
    `module/tinyvc/encoder.py:101`)."""

    sample_rate: int = 24000
    n_fft: int = 1920
    hop_size: int = 480  # 20 ms -> 50 frames/s
    energy_frame_size: int = 64
    # Serving spectrogram implementation: 'xla' (fp32 rfft, exact),
    # 'pallas' (fused window+DFT-matmul kernel, bf16 MXU, ~2e-3 relative),
    # or 'auto' = pallas on TPU when the decoder runs the bf16 serving
    # profile. Training and the strict fp32 profile always use 'xla'.
    spectrogram_impl: str = "auto"

    @property
    def fft_bin(self) -> int:
        return self.n_fft // 2 + 1


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """Content (SSL-distilled) + pitch heads (reference: `module/tinyvc/encoder.py:11-116`)."""

    # pitch estimator
    pitch_channels: int = 128
    pitch_num_layers: int = 4
    num_pitch_classes: int = 512
    classes_per_octave: int = 48
    min_frequency: float = 20.0
    pitch_topk: int = 4
    # ssl feature estimator
    ssl_channels: int = 384
    ssl_dilations: Tuple[int, ...] = (1, 3, 9, 1, 1, 1)
    ssl_dim: int = 768
    # 'float32' (parity default) or 'bfloat16' (2x MXU peak, half the HBM
    # traffic; norms and the DSP stage stay fp32)
    compute_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Source-filter DDSP vocoder (reference: `module/tinyvc/decoder.py:102-266`)."""

    num_harmonics: int = 14  # plus fundamental -> 15 sines
    # SourceNet
    source_channels: int = 128
    source_kernel_size: int = 7
    source_num_layers: int = 3
    # FilterNet U-Net
    filter_channels: Tuple[int, ...] = (384, 192, 96, 48, 24)
    filter_factors: Tuple[int, ...] = (2, 3, 4, 4, 5)
    content_channels: int = 768
    # 'auto': Pallas kernels on TPU backends, XLA elsewhere; 'on'/'off' force
    use_pallas: str = "auto"
    # fused VMEM-resident Upsample-chain kernel for the waveform-rate U-Net
    # (serving path; ~80-sample edge-replication deviation at utterance
    # ends, see ops/pallas/filter_stage.py). Same 'auto'/'on'/'off' scheme.
    use_fused_filter: str = "auto"
    # route the GAN training step's U-Net through the fused kernels with
    # their custom_vjp backward kernels (filter_stage.py) — fwd AND bwd
    # VMEM-resident. MXU inputs run bf16 (matching XLA's
    # excess-precision demotion of fp32 matmuls); accumulation fp32.
    use_fused_filter_train: str = "auto"
    compute_dtype: str = "float32"  # see EncoderConfig.compute_dtype
    # conv lowering for the U-Net: 'unfold' (k shifted views + one matmul,
    # fastest measured), 'taps', 'phased', 'lax'
    conv_impl: str = "unfold"
    # U-Net activation layout for the flax (training / strict-parity) path:
    # 'cf' keeps waveform-rate tensors [B, C, T] so small channel counts sit
    # on 8-granular sublanes instead of lane-padding to 128 (several-fold
    # less HBM traffic in fwd+bwd); 'cl' is the channels-last [B, T, C] form.
    # Identical parameter tree either way — checkpoints are interchangeable.
    filter_layout: str = "cf"
    # rematerialise the U-Net's Down/Upsample blocks under grad
    # (jax.checkpoint): trades recompute FLOPs for the waveform-rate
    # activation memory that dominates the GAN step's HBM footprint —
    # enables bigger batches / longer chunks per chip. Off by default
    # (inference and default training fit comfortably).
    remat: bool = False


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    """MPD + MRD (reference: `module/tinyvc/discriminator.py:48-144`)."""

    periods: Tuple[int, ...] = (1, 2, 3, 5, 7, 11)
    resolutions: Tuple[int, ...] = (32, 64, 128, 256)
    channels: int = 32
    max_channels: int = 256
    num_layers: int = 4
    # The reference's MRD discards its inter-layer activation
    # (`module/tinyvc/discriminator.py:104` computes leaky_relu and drops the
    # result). `mrd_fixed_activation=False` reproduces that behaviour for
    # parity; True applies the activation as clearly intended.
    mrd_fixed_activation: bool = False
    # Conv compute dtype — the analogue of the reference's `-fp16` autocast
    # training mode (`train_decoder.py:33,100`; its MRD spectrogram is
    # autocast-exempt, `discriminator.py:91`, and stays fp32 here too).
    # Params, weight-norm math and optimizer state remain fp32.
    compute_dtype: str = "float32"
    # MRD conv lowering: 'lax' (all-NCHW conv_general_dilated), 'hybrid'
    # (NCHW for the two small-channel stem convs, NHWC for the deep
    # 128/256-channel layers — channels ride the lane axis at full tile
    # density; numerically identical, layout is internal) or 'unfold'
    # (windows->matmul; see models/discriminator.py WNConv2d for the three
    # measured-slower layout variants). MEASURED (round 3, post-join GAN
    # step on chip): 'hybrid' 37.46 ms vs 'lax' 37.69 — a wash, within
    # run noise; the MRD cost is per-op fixed dispatch, not layout, so
    # only op-count reduction can move it. 'lax' stays the default.
    mrd_conv_impl: str = "lax"


@dataclasses.dataclass(frozen=True)
class RetrievalConfig:
    """kNN feature matching (reference: `module/tinyvc/feature_retrieval.py:15-33`,
    `extract_index.py:18`)."""

    k: int = 4
    alpha: float = 0.0
    metric: str = "cos"  # 'cos' | 'IP' | 'L2'
    index_size: int = 2048
    index_stride: int = 4
    # 'auto' = fused VMEM-resident Pallas kernel (ops/pallas/knn.py) when
    # serving a single VMEM-sized dictionary under the bf16 profile; 'xla'
    # forces the reference implementation (ops/retrieval.py)
    impl: str = "auto"


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference: `train_encoder.py:21-33`,
    `train_decoder.py:18-40`)."""

    batch_size: int = 16
    learning_rate: float = 1e-4
    adam_betas_gan: Tuple[float, float] = (0.8, 0.99)
    grad_clip: float = 1.0
    # decoder GAN schedule
    max_steps: int = 300000
    discriminator_join: int = 100000
    weight_adv: float = 2.0
    weight_dsp: float = 1.0
    weight_spec: float = 1.0
    weight_feat: float = 2.0
    # encoder distillation
    encoder_epochs: int = 60
    distill_weight: float = 45.0
    unvoiced_class_weight: float = 5e-3
    # data
    chunk_length: int = 48000  # 2 s @ 24 kHz (reference: preprocess.py:19)
    # logging / checkpoints
    log_interval: int = 50
    save_interval: int = 500
    # GAN crop fed to the discriminators (reference: train_decoder.py:59-62)
    disc_crop: int = 8000


@dataclasses.dataclass(frozen=True)
class StreamConfig:
    """Streaming SOLA inference (reference: `module/infer/stream.py:30-64`)."""

    block_size: int = 1920
    extra_size: int = 3840
    sola_search_size: int = 1920
    crossfade_size: int = 1920
    last_delay_size: int = 3840
    use_phase_vocoder: bool = False

    @property
    def input_size(self) -> int:
        return max(
            self.block_size
            + self.crossfade_size
            + self.sola_search_size
            + 2 * self.last_delay_size,
            self.block_size + self.extra_size,
        )


@dataclasses.dataclass(frozen=True)
class MelConfig:
    """Mel config of the parity metric (reference: `module/utils/loss.py:41-54`)."""

    sample_rate: int = 24000
    n_fft: int = 1024
    hop_size: int = 256
    n_mels: int = 80


@dataclasses.dataclass(frozen=True)
class TinyVCConfig:
    audio: AudioConfig = dataclasses.field(default_factory=AudioConfig)
    encoder: EncoderConfig = dataclasses.field(default_factory=EncoderConfig)
    decoder: DecoderConfig = dataclasses.field(default_factory=DecoderConfig)
    discriminator: DiscriminatorConfig = dataclasses.field(
        default_factory=DiscriminatorConfig
    )
    retrieval: RetrievalConfig = dataclasses.field(default_factory=RetrievalConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    stream: StreamConfig = dataclasses.field(default_factory=StreamConfig)
    mel: MelConfig = dataclasses.field(default_factory=MelConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "TinyVCConfig":
        d = json.loads(s)

        def build(klass, sub):
            fields = {f.name: f for f in dataclasses.fields(klass)}
            kwargs = {}
            for k, v in sub.items():
                if k not in fields:
                    continue
                if isinstance(v, list):
                    v = tuple(v)
                kwargs[k] = v
            return klass(**kwargs)

        return cls(
            audio=build(AudioConfig, d.get("audio", {})),
            encoder=build(EncoderConfig, d.get("encoder", {})),
            decoder=build(DecoderConfig, d.get("decoder", {})),
            discriminator=build(DiscriminatorConfig, d.get("discriminator", {})),
            retrieval=build(RetrievalConfig, d.get("retrieval", {})),
            train=build(TrainConfig, d.get("train", {})),
            stream=build(StreamConfig, d.get("stream", {})),
            mel=build(MelConfig, d.get("mel", {})),
        )


DEFAULT_CONFIG = TinyVCConfig()


def serving_config() -> TinyVCConfig:
    """The recommended inference profile: encoder (and therefore the kNN
    feature space) in fp32, the vocoder's conv stacks in bf16 — 1.6x faster
    on the U-Net with mel-level deviation ~2x the fp32 baseline (see
    tests/test_mixed_precision.py for the enforced bound). Full-bf16 is NOT
    offered: retrieval neighbours flip under bf16 content features."""
    return TinyVCConfig(decoder=DecoderConfig(compute_dtype="bfloat16"))
