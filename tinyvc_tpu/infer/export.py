"""Model export via jax.export (StableHLO) — the TPU-native analogue of the
reference's ONNX export.

Mirrors `export_onnx.py:8-77`'s three-subgraph split with the DSP stage
deliberately outside the exported graphs (a runtime re-implements the
oscillators/ISTFT):

- ``encoder``:    spec [b, f, 961]               -> (content, f0_logits)
- ``source_net``: (content, f0, energy)          -> (amps, kernel)
- ``filter_net``: (content, f0, energy, source)  -> waveform

Batch and length axes are exported symbolically where jax.export supports
it, matching ONNX dynamic axes; a static fallback shape is used otherwise.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import TinyVCConfig
from ..models import Decoder, Encoder


def _export(fn, args, path: str):
    exported = jax.export.export(jax.jit(fn))(*args)
    with open(path, "wb") as f:
        f.write(exported.serialize())
    return exported


def export_all(
    enc_params: Dict[str, Any],
    dec_params: Dict[str, Any],
    output_dir: str,
    cfg: TinyVCConfig | None = None,
    example_frames: int = 100,
) -> Dict[str, str]:
    cfg = cfg or TinyVCConfig()
    os.makedirs(output_dir, exist_ok=True)
    encoder = Encoder(cfg.encoder)
    decoder = Decoder(cfg.decoder, cfg.audio)
    frame = cfg.audio.hop_size

    try:
        scope = jax.export.SymbolicScope()
        b, f = jax.export.symbolic_shape("b, f", scope=scope)
        spec_shape = (b, f, cfg.audio.fft_bin)
        content_shape = (b, f, cfg.decoder.content_channels)
        f0_shape = (b, f)
        energy_shape = (b, f * frame)
        source_shape = (b, f * frame, cfg.decoder.num_harmonics + 2)
        symbolic = True
    except Exception:
        B, F = 1, example_frames
        spec_shape = (B, F, cfg.audio.fft_bin)
        content_shape = (B, F, cfg.decoder.content_channels)
        f0_shape = (B, F)
        energy_shape = (B, F * frame)
        source_shape = (B, F * frame, cfg.decoder.num_harmonics + 2)
        symbolic = False

    dt = jnp.float32
    paths = {}

    def enc_fn(spec):
        return encoder.apply(enc_params, spec)

    paths["encoder"] = os.path.join(output_dir, "encoder.stablehlo")
    _export(
        enc_fn, (jax.ShapeDtypeStruct(spec_shape, dt),), paths["encoder"]
    )

    def src_fn(content, f0, energy):
        return decoder.apply(
            dec_params, content, f0, energy,
            method=lambda m, c, f_, e: m.source_net(c, f_, e),
        )

    paths["source_net"] = os.path.join(output_dir, "source_net.stablehlo")
    _export(
        src_fn,
        (
            jax.ShapeDtypeStruct(content_shape, dt),
            jax.ShapeDtypeStruct(f0_shape, dt),
            jax.ShapeDtypeStruct(energy_shape, dt),
        ),
        paths["source_net"],
    )

    def filt_fn(content, f0, energy, source):
        return decoder.apply(
            dec_params, content, f0, energy, source,
            method=lambda m, c, f_, e, s: m.filter_net(c, f_, e, s),
        )

    paths["filter_net"] = os.path.join(output_dir, "filter_net.stablehlo")
    _export(
        filt_fn,
        (
            jax.ShapeDtypeStruct(content_shape, dt),
            jax.ShapeDtypeStruct(f0_shape, dt),
            jax.ShapeDtypeStruct(energy_shape, dt),
            jax.ShapeDtypeStruct(source_shape, dt),
        ),
        paths["filter_net"],
    )
    paths["symbolic"] = str(symbolic)
    return paths


def load_exported(path: str):
    """Deserialize an exported module and return a callable."""
    with open(path, "rb") as f:
        exported = jax.export.deserialize(f.read())
    return exported.call
