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


class MFCCTeacher:
    """Procedural distillation teacher: speaker-normalised MFCCs lifted to
    the WavLM feature width by a fixed orthonormal projection.

    For zero-egress environments (no transformers / pretrained WavLM) the
    content head still needs a distillation target that (a) correlates with
    phonetic content and (b) is reasonably speaker-robust — otherwise the
    kNN retrieval space (`module/tinyvc/feature_retrieval.py:15-33` role)
    never aligns source frames with target-speaker frames and "conversion"
    degenerates to resynthesis. Classic cepstral processing buys both:
    log-mel -> DCT-II -> LOW cepstra only (c1..c9: envelope shape; higher
    cepstra resolve harmonic fine structure, i.e. pitch = speaker) ->
    per-utterance cepstral mean+var normalisation (removes per-speaker/
    channel envelope bias) -> +-4-frame context stacking (phone
    transitions disambiguate) -> a seeded orthonormal 45->768 embedding
    (distances preserved exactly, so cosine/L2 retrieval in the lifted
    space equals retrieval in stacked-MFCC space). Pure numpy — never
    touches an accelerator.

    The recipe was selected by measuring cross-speaker nearest-neighbour
    vowel-match accuracy on parallel two-speaker renditions
    (benchmarks/gen_synth_dataset.py --pair): ~0.91 for (40 mel, c1..c9,
    ctx +-4) vs 0.34 for the naive (80 mel, c1..c19, no context) and
    ~0.27 chance.
    """

    def __init__(self, dim: int = 768, n_mfcc: int = 10, sample_rate: int = 24000,
                 n_fft: int = 1024, hop: int = 480, n_mels: int = 40,
                 f_max: float = 12000.0, context: int = 4, seed: int = 1234):
        from ..dsp.mel import mel_filterbank

        self.sample_rate, self.n_fft, self.hop = sample_rate, n_fft, hop
        self.context = context
        self.fb = mel_filterbank(sample_rate, n_fft, n_mels, 0.0, f_max).astype(
            np.float64
        )
        # DCT-II (orthonormal), rows 1..n_mfcc-1 (c0 dropped: gain)
        k = np.arange(n_mels)
        dct = np.cos(np.pi / n_mels * (k[None, :] + 0.5) * np.arange(n_mfcc)[:, None])
        dct[0] *= 1.0 / np.sqrt(2.0)
        self.dct = (dct * np.sqrt(2.0 / n_mels))[1:]  # [n_mfcc-1, n_mels]
        # fixed orthonormal lift of the stacked features to the WavLM width
        width = (n_mfcc - 1) * (2 * context + 1)
        g = np.random.default_rng(seed).normal(size=(dim, width))
        q, _ = np.linalg.qr(g)  # [dim, width], orthonormal columns
        self.proj = q.astype(np.float64)
        self.window = np.hanning(n_fft + 1)[:-1]

    def _logmel(self, wave: np.ndarray) -> np.ndarray:
        """[L] -> [F, n_mels] log power-mel (centre-padded frames)."""
        pad = self.n_fft // 2
        x = np.pad(wave.astype(np.float64), (pad, pad), mode="reflect")
        n_frames = 1 + (len(x) - self.n_fft) // self.hop
        idx = (np.arange(self.n_fft)[None, :]
               + self.hop * np.arange(n_frames)[:, None])
        frames = x[idx] * self.window
        spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
        return np.log(spec @ self.fb + 1e-6)

    def __call__(self, wave_24k: np.ndarray) -> np.ndarray:
        """wave_24k [B, L] (24 kHz, NOT 16 k — this teacher is native-rate)
        -> features [B, F, dim]."""
        outs = []
        ctx = self.context
        for w in wave_24k:
            mfcc = self._logmel(w) @ self.dct.T  # [F, n_mfcc-1]
            mfcc = mfcc - mfcc.mean(axis=0, keepdims=True)
            mfcc = mfcc / (mfcc.std(axis=0, keepdims=True) + 1e-6)
            padded = np.pad(mfcc, ((ctx, ctx), (0, 0)), mode="edge")
            stacked = np.concatenate(
                [padded[ctx + s: len(mfcc) + ctx + s]
                 for s in range(-ctx, ctx + 1)], axis=1,
            )  # [F, width]
            outs.append(stacked @ self.proj.T)  # [F, dim]
        return np.stack(outs).astype(np.float32)


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
