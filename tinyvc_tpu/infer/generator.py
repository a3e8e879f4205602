"""End-to-end conversion pipeline (the TPU counterpart of
`module/infer/generator.py:12-33`).

The core is a pure, jittable function ``convert_fn``:
wave -> spectrogram -> encoder -> kNN match -> pitch shift -> decoder.
``VoiceConverter`` wraps it with parameter storage, shape bucketing, and a
jit cache, so arbitrary-length utterances run through a handful of compiled
programs.

Deliberate deviation from the reference: ``Generator.convert`` accepts dead
``f0_estimation`` / ``device`` arguments (reference `generator.py:26` — f0
always comes from the encoder); we simply do not have them.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TinyVCConfig
from ..dsp import (
    autopad_waveform,
    estimate_energy,
    pad_to_bucket,
    shift_frequency,
    spectrogram,
)
from ..models import Decoder, Encoder
from ..ops import match_features


def _on_cpu_backend() -> bool:
    default_dev = getattr(jax.config, "jax_default_device", None)
    return jax.default_backend() in ("cpu", "gpu") or (
        default_dev is not None and default_dev.platform in ("cpu", "gpu")
    )


def serving_spectrogram(wave: jnp.ndarray, cfg: TinyVCConfig) -> jnp.ndarray:
    """The serving path's spectrogram: the fused Pallas DFT-matmul kernel
    (`ops/pallas/spectrogram.py`, bf16x3 splits — ~3.5e-6 relative, which
    keeps kNN retrieval bit-stable) under the bf16 profile on TPU; the
    exact XLA rfft otherwise (``cfg.audio.spectrogram_impl``)."""
    impl = cfg.audio.spectrogram_impl
    B = wave.shape[0]
    F = wave.shape[1] // cfg.audio.hop_size
    if impl == "auto":
        # Small workloads (streaming blocks, single-utterance encode) run
        # faster on the XLA rfft: the kernel's 128-frame tiles and DFT
        # weight loads don't amortise below ~2k total frames (measured:
        # config1 B=1 x 500 frames lost 18% to the kernel; the 28-frame
        # stream buffer also scope-VMEM-OOMed inside the while-loop body).
        use_pallas = (
            cfg.decoder.compute_dtype == "bfloat16"
            and not _on_cpu_backend()
            and B * F >= 2048
        )
    else:
        use_pallas = impl == "pallas"
    if use_pallas:
        from ..ops.pallas.spectrogram import pallas_spectrogram

        return pallas_spectrogram(
            wave, cfg.audio.n_fft, cfg.audio.hop_size,
            interpret=_on_cpu_backend(),  # bf16x3 default: kNN-bit-stable
        )
    return spectrogram(wave, cfg.audio.n_fft, cfg.audio.hop_size)


def serving_match_features(
    content: jnp.ndarray, target: jnp.ndarray, cfg: TinyVCConfig
) -> jnp.ndarray:
    """kNN matching with the fused VMEM-resident Pallas kernel
    (`ops/pallas/knn.py`) when a single 2D dictionary fits VMEM; the XLA
    path otherwise (3D per-batch dictionaries, very large N, CPU strict)."""
    use_pallas = (
        cfg.retrieval.impl != "xla"
        and target.ndim == 2
        and target.shape[0] * target.shape[1] * 4 <= 12 * 2**20
        and cfg.decoder.compute_dtype == "bfloat16"
    )
    if use_pallas:
        from ..ops.pallas.knn import pallas_match_features

        return pallas_match_features(
            content, target,
            k=cfg.retrieval.k, alpha=cfg.retrieval.alpha,
            metric=cfg.retrieval.metric,
            interpret=_on_cpu_backend(),
        ).astype(content.dtype)
    if target.ndim == 2:
        target = jnp.broadcast_to(
            target[None], (content.shape[0],) + target.shape
        )
    return match_features(
        content, target,
        k=cfg.retrieval.k, alpha=cfg.retrieval.alpha,
        metric=cfg.retrieval.metric,
    )


def encode_fn(
    encoder: Encoder, enc_params: Dict[str, Any], wave: jnp.ndarray, cfg: TinyVCConfig
):
    """wave [B, L] -> (content [B, F, 768], f0 [B, F])."""
    wave = autopad_waveform(wave, cfg.audio.hop_size)
    spec = serving_spectrogram(wave, cfg)
    return encoder.apply(enc_params, spec, method=encoder.infer)


def decode_infer(
    decoder: Decoder,
    dec_params: Dict[str, Any],
    content: jnp.ndarray,
    f0: jnp.ndarray,
    energy: jnp.ndarray,
    key: jax.Array,
    cfg: TinyVCConfig,
    noise_angle: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``Decoder.infer`` with the waveform-rate U-Net routed through the
    fused VMEM-resident Pallas kernel when enabled
    (``cfg.decoder.use_fused_filter``; `ops/fused_filternet.py`)."""
    flag = cfg.decoder.use_fused_filter
    use_fused = flag == "on" or (flag == "auto" and not _on_cpu_backend())
    if not use_fused:
        return decoder.apply(
            dec_params, content, f0, energy, key,
            noise_angle=noise_angle, method=decoder.infer,
        )
    from ..ops.fused_filternet import filternet_fused_apply

    amps, kernel = decoder.apply(
        dec_params, content, f0, energy,
        method=lambda m, c, f_, e: m.source_net(c, f_, e),
    )
    # channels-first source end-to-end: a waveform-rate [B, L, 16] tensor
    # is lane-padded 16->128 on TPU (~8x HBM bloat); [B, 16, L] is not.
    # The dsp concat also packs (energy | zero rows) so the fused stem's
    # input needs no separate packing pass.
    n_src = cfg.decoder.num_harmonics + 2  # harmonics + noise
    pack_width = n_src + 1 + ((-(n_src + 1)) % 8)
    source_t = decoder.apply(
        dec_params, f0, amps, kernel, key, noise_angle,
        method=lambda m, f_, a, k_, key_, na: m.dsp(
            f_, a, k_, key_, noise_angle=na, channels_first=True,
            pack_energy=energy, pack_width=pack_width,
            fused_noise=na is None,
        ),
    )
    return filternet_fused_apply(
        dec_params["params"]["filter_net"], cfg.decoder, content, f0, energy,
        source_t,
        # flag == 'on' on a CPU backend runs the kernels interpreted (tests)
        interpret=_on_cpu_backend(),
        source_channels_first=True,
        source_prepacked=True,
        n_prepacked_src=n_src,
    )


def convert_fn(
    encoder: Encoder,
    decoder: Decoder,
    enc_params: Dict[str, Any],
    dec_params: Dict[str, Any],
    wave: jnp.ndarray,
    target: jnp.ndarray,
    pitch_shift: jnp.ndarray,
    key: jax.Array,
    cfg: TinyVCConfig,
    noise_angle: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full VC pipeline on ``[B, L]`` waveforms with a ``[N, C]`` or
    ``[B, N, C]`` target dictionary. Mirrors `module/infer/generator.py:25-33`.
    """
    wave = autopad_waveform(wave, cfg.audio.hop_size)
    spec = serving_spectrogram(wave, cfg)
    energy = estimate_energy(wave, cfg.audio.energy_frame_size)
    content, f0 = encoder.apply(enc_params, spec, method=encoder.infer)
    matched = serving_match_features(content, target, cfg)
    f0 = shift_frequency(f0, pitch_shift)
    return decode_infer(
        decoder, dec_params, matched, f0, energy, key, cfg,
        noise_angle=noise_angle,
    )


def convert_fn_sharded(
    encoder: Encoder,
    decoder: Decoder,
    enc_params: Dict[str, Any],
    dec_params: Dict[str, Any],
    wave: jnp.ndarray,
    dictionary: jnp.ndarray,
    mask: jnp.ndarray,
    pitch_shift: jnp.ndarray,
    key: jax.Array,
    cfg: TinyVCConfig,
    mesh,
) -> jnp.ndarray:
    """Like :func:`convert_fn` but with the kNN dictionary sharded over the
    mesh's 'model' axis (local top-k + all-gather + re-top-k; see
    `tinyvc_tpu.parallel.sharded_knn`). ``dictionary`` must be pre-padded to
    a multiple of the axis size with ``pad_dictionary``."""
    from ..parallel.sharded_knn import sharded_match_features

    wave = autopad_waveform(wave, cfg.audio.hop_size)
    spec = serving_spectrogram(wave, cfg)
    energy = estimate_energy(wave, cfg.audio.energy_frame_size)
    content, f0 = encoder.apply(enc_params, spec, method=encoder.infer)
    matched = sharded_match_features(
        mesh,
        content,
        dictionary,
        mask,
        k=cfg.retrieval.k,
        alpha=cfg.retrieval.alpha,
        metric=cfg.retrieval.metric,
    )
    f0 = shift_frequency(f0, pitch_shift)
    return decode_infer(decoder, dec_params, matched, f0, energy, key, cfg)


class VoiceConverter:
    """Stateful convenience wrapper: holds params, jits per bucketed shape.

    The reference's `Generator` re-runs eager ops per call; here each
    (batch, bucketed length) pair compiles once and is cached.
    """

    def __init__(
        self,
        enc_params: Dict[str, Any],
        dec_params: Dict[str, Any],
        cfg: TinyVCConfig | None = None,
        bucket_frames: int = 64,
    ):
        self.cfg = cfg or TinyVCConfig()
        self.encoder = Encoder(self.cfg.encoder)
        self.decoder = Decoder(self.cfg.decoder, self.cfg.audio)
        self.enc_params = enc_params
        self.dec_params = dec_params
        self.bucket_frames = bucket_frames

        cfg_ = self.cfg

        @functools.partial(jax.jit, static_argnames=())
        def _convert(enc_p, dec_p, wave, target, pitch_shift, key):
            return convert_fn(
                self.encoder, self.decoder, enc_p, dec_p, wave, target,
                pitch_shift, key, cfg_,
            )

        @jax.jit
        def _encode(enc_p, wave):
            return encode_fn(self.encoder, enc_p, wave, cfg_)

        self._convert = _convert
        self._encode = _encode

    def encode(self, wave: np.ndarray):
        """Host entry: [B, L] or [L] -> (content, f0) with padding stripped."""
        wave = np.atleast_2d(np.asarray(wave, dtype=np.float32))
        padded, L = pad_to_bucket(wave, self.cfg.audio.hop_size, self.bucket_frames)
        content, f0 = self._encode(self.enc_params, jnp.asarray(padded))
        frames = L // self.cfg.audio.hop_size
        return content[:, :frames], f0[:, :frames]

    def build_dictionary(self, wave: np.ndarray) -> jnp.ndarray:
        """Encode a target-speaker waveform into a [N, C] kNN dictionary."""
        content, _ = self.encode(wave)
        return content.reshape(-1, content.shape[-1])

    def convert(
        self,
        wave: np.ndarray,
        target: jnp.ndarray,
        pitch_shift: float = 0.0,
        key: Optional[jax.Array] = None,
    ) -> np.ndarray:
        """Host entry: [B, L] or [L] waveform -> converted waveform, same length."""
        squeeze = np.asarray(wave).ndim == 1
        wave = np.atleast_2d(np.asarray(wave, dtype=np.float32))
        padded, L = pad_to_bucket(wave, self.cfg.audio.hop_size, self.bucket_frames)
        if key is None:
            key = jax.random.PRNGKey(0)
        out = self._convert(
            self.enc_params,
            self.dec_params,
            jnp.asarray(padded),
            jnp.asarray(target),
            jnp.float32(pitch_shift),
            key,
        )
        out = np.asarray(out)[:, :L]
        return out[0] if squeeze else out

    def convert_chunked(
        self,
        wave: np.ndarray,
        target: jnp.ndarray,
        pitch_shift: float = 0.0,
        key: Optional[jax.Array] = None,
        chunk_frames: int = 512,
        halo_frames: int = 96,
        filter_halo: int = 32,
        native: bool = True,
    ) -> np.ndarray:
        """Exact chunked long-utterance conversion: [L] -> [L].

        The reference parses ``--chunk-size``/``--no-chunking`` but never
        implements chunking (`infer.py:27-29,40-41` — vestigial). This is
        the real thing: overlap-save chunks of ``chunk_frames`` frames run
        as a NATIVE batch on one device (`parallel/time_shard.py::
        time_batched_convert(native=True)`), with GRN statistics, harmonic
        phase, and noise indexing stitched exactly — output matches the
        whole-utterance mode at the mel level. Use it to bound jit bucket
        sizes for arbitrarily long inputs (one compile serves every chunk
        count S). Measured (round 5, on chip, B=1 x 60 s): 3089 audio-s/s
        — 1.8x the round-4 vmap lowering (1730; it had to force the fused
        serving kernels off), still ~1.9x below whole-utterance (5964):
        exact overlap-save pays ~1.38x halo recompute by construction and
        must keep the phase-seeded XLA oscillator + per-global-frame noise
        table (the fused oscillator/noise kernels integrate phase from
        zero / hash their own phases, which would break chunk-join
        exactness). Not a memory bound: all S chunk lanes run concurrently
        as batched ops.
        """
        from ..parallel.time_shard import time_batched_convert

        wave = np.asarray(wave, dtype=np.float32)
        assert wave.ndim == 1, "chunked conversion takes a single utterance"
        hop = self.cfg.audio.hop_size
        L0 = wave.shape[0]
        F = -(-L0 // hop)
        S = max(1, -(-F // chunk_frames))
        Fp = S * chunk_frames  # seg == chunk_frames -> one compile per S
        padded = np.zeros((Fp * hop,), np.float32)
        padded[:L0] = wave
        if key is None:
            key = jax.random.PRNGKey(0)

        cache = getattr(self, "_chunked_cache", None)
        if cache is None:
            cache = self._chunked_cache = {}
        sig = (S, Fp, chunk_frames, halo_frames, filter_halo, native)
        fn = cache.get(sig)
        if fn is None:
            cfg_ = self.cfg

            @jax.jit
            def fn(enc_p, dec_p, w, tgt, ps, k):
                return time_batched_convert(
                    enc_p, dec_p, w, tgt, ps, k, cfg_, shards=S,
                    halo_frames=halo_frames, filter_halo=filter_halo,
                    native=native,
                )

            cache[sig] = fn
        out = fn(
            self.enc_params, self.dec_params, jnp.asarray(padded),
            jnp.asarray(target), jnp.float32(pitch_shift), key,
        )
        return np.asarray(out)[:L0]
