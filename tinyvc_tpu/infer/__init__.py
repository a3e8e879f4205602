"""Inference engine: batch pipeline and streaming state machine."""

from .generator import VoiceConverter, convert_fn, encode_fn

__all__ = ["VoiceConverter", "convert_fn", "encode_fn"]
