"""Waveform padding utilities.

Spec: `module/utils/auto_padding.py:5-11` (zero-pad to a multiple of the
frame size). On TPU we additionally provide *bucketed* padding so jit caches
stay small: utterances are padded up to the next bucket boundary rather than
the next frame, bounding the number of compiled shapes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def autopad_waveform(wf: jnp.ndarray, frame_size: int = 480) -> jnp.ndarray:
    """Zero-pad ``[B, L]`` so L is a multiple of ``frame_size``."""
    L = wf.shape[-1]
    pad = (-L) % frame_size
    if pad:
        wf = jnp.pad(wf, ((0, 0), (0, pad)))
    return wf


def bucket_length(length: int, frame_size: int = 480, bucket_frames: int = 64) -> int:
    """Smallest multiple of ``frame_size * bucket_frames`` >= length.

    With the defaults each bucket step is 64 frames = 1.28 s, so arbitrary
    utterance lengths compile at most a handful of distinct programs.
    """
    step = frame_size * bucket_frames
    return int(np.ceil(length / step) * step)


def pad_to_bucket(
    wf: np.ndarray, frame_size: int = 480, bucket_frames: int = 64
) -> tuple[np.ndarray, int]:
    """Host-side: pad ``[B, L]`` to its bucket; returns (padded, original L)."""
    L = wf.shape[-1]
    target = bucket_length(L, frame_size, bucket_frames)
    if target != L:
        wf = np.pad(wf, [(0, 0)] * (wf.ndim - 1) + [(0, target - L)])
    return wf, L
