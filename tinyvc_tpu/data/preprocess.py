"""Dataset preprocessing: decode -> mono -> resample 24 kHz -> 2 s chunks ->
batched on-device F0 labelling -> cache.

Behavioural spec: `preprocess.py:15-72`. Key TPU redesign: the reference
labels F0 per chunk with a CPU numpy round-trip per utterance
(`module/utils/f0_estimation.py:15-18`); here chunks are accumulated and
labelled in large device batches with the jitted YIN (`tinyvc_tpu.dsp.f0`),
orders of magnitude fewer dispatches.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Iterable, List

import jax.numpy as jnp
import numpy as np

from ..dsp.f0 import estimate_f0
from ..dsp.resample import resample
from ..utils.audio_io import SUPPORTED_EXTS, load_audio, save_wav


def find_audio_files(root: str, max_files: int = -1) -> List[Path]:
    paths: List[Path] = []
    for ext in ("mp3", "wav", "ogg"):
        paths += sorted(Path(root).glob(f"**/*.{ext}"))
    if max_files != -1:
        paths = paths[:max_files]
    return paths


def chunk_waveform(wf: np.ndarray, length: int) -> List[np.ndarray]:
    """[L] -> list of [length] chunks, zero-padding the last (reference
    `preprocess.py:50-57`)."""
    chunks = []
    for s in range(0, len(wf), length):
        c = wf[s : s + length]
        if len(c) < length:
            c = np.pad(c, (0, length - len(c)))
        chunks.append(c.astype(np.float32))
    return chunks


def preprocess(
    input_dir: str,
    output_dir: str = "dataset_cache",
    length: int = 48000,
    sample_rate: int = 24000,
    max_files: int = -1,
    f0_algorithm: str = "yin",
    f0_batch: int = 64,
    progress: bool = True,
) -> int:
    """Returns the number of cached chunks."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    files = find_audio_files(input_dir, max_files)

    pending: List[np.ndarray] = []
    counter = 0

    def flush(pending: List[np.ndarray], counter: int) -> int:
        if not pending:
            return counter
        batch = np.stack(pending)
        f0 = np.asarray(
            estimate_f0(jnp.asarray(batch), sample_rate, 480, f0_algorithm)
        )
        for i, chunk in enumerate(pending):
            save_wav(str(out / f"{counter + i}.wav"), chunk, sample_rate)
            np.save(out / f"{counter + i}.f0.npy", f0[i])
        return counter + len(pending)

    iterator: Iterable[Path] = files
    if progress:
        try:
            from tqdm import tqdm

            iterator = tqdm(files)
        except ImportError:
            pass

    for path in iterator:
        wf, sr = load_audio(str(path))
        wf = wf.mean(axis=0)
        if sr != sample_rate:
            wf = np.asarray(resample(jnp.asarray(wf[None]), sr, sample_rate))[0]
        pending.extend(chunk_waveform(wf, length))
        while len(pending) >= f0_batch:
            counter = flush(pending[:f0_batch], counter)
            pending = pending[f0_batch:]
    counter = flush(pending, counter)
    return counter
