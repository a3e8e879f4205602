"""WavLM distillation teacher.

Behavioural spec: `train_encoder.py:54,79-82` — frozen WavLM-Base+ hidden
state 4 on 16 kHz audio, time-interpolated to our frame rate. The teacher is
host-side (torch CPU / transformers) and never enters the TPU graph; in
zero-egress environments where the pretrained weights cannot be downloaded,
features can be precomputed into the dataset cache as ``{idx}.teacher.npy``.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


class WavLMTeacher:
    def __init__(self, model_name: str = "microsoft/wavlm-base-plus", layer: int = 4):
        import torch
        from transformers import WavLMModel

        self._torch = torch
        self.model = WavLMModel.from_pretrained(model_name).eval()
        self.layer = layer

    def __call__(self, wave_16k: np.ndarray) -> np.ndarray:
        """wave_16k [B, L16] -> features [B, Ft, 768]."""
        torch = self._torch
        with torch.no_grad():
            out = self.model(
                torch.from_numpy(wave_16k), output_hidden_states=True
            ).hidden_states[self.layer]
        return out.numpy()


class CachedTeacher:
    """Reads precomputed ``{idx}.teacher.npy`` files from the dataset cache."""

    def __init__(self, cache_dir: str):
        self.cache_dir = cache_dir

    def for_indices(self, indices) -> np.ndarray:
        feats = [
            np.load(os.path.join(self.cache_dir, f"{int(i)}.teacher.npy"))
            for i in indices
        ]
        return np.stack(feats)


def make_teacher(
    cache_dir: str, model_name: str = "microsoft/wavlm-base-plus"
) -> Optional[object]:
    """Prefer cached features; else try to load WavLM; else None (pitch-only
    training, with a warning)."""
    if os.path.exists(os.path.join(cache_dir, "0.teacher.npy")):
        return CachedTeacher(cache_dir)
    try:
        return WavLMTeacher(model_name)
    except Exception as e:  # no weights in zero-egress envs
        print(
            f"[tinyvc_tpu] WavLM teacher unavailable ({type(e).__name__}); "
            "training the pitch head only. Precompute {idx}.teacher.npy files "
            "to enable distillation."
        )
        return None
