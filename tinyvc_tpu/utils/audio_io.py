"""Audio file I/O.

The reference leans on torchaudio's C++ backend for load/save/resample
(`preprocess.py:8,47-49`, `infer.py:60-69`). Here WAV is decoded natively —
by the bundled C++ library (``native/``, loaded via ctypes) when built, with
a numpy fallback — and mp3/ogg decode shells out to ffmpeg when present
(this image has none, so WAV is the primary format).
"""

from __future__ import annotations

import os
import shutil
import struct
import subprocess
import wave as _wave
from typing import Tuple

import numpy as np

SUPPORTED_EXTS = (".wav", ".mp3", ".ogg", ".flac")


def _load_wav_numpy(path: str) -> Tuple[np.ndarray, int]:
    """Decode PCM16/24/32 or float32 WAV -> ([C, L] float32 in [-1,1], sr)."""
    from scipy.io import wavfile

    try:
        sr, data = wavfile.read(path)
    except ValueError:
        # 24-bit or other oddities: minimal manual parse via wave module
        with _wave.open(path, "rb") as w:
            sr = w.getframerate()
            n = w.getnframes()
            sw = w.getsampwidth()
            ch = w.getnchannels()
            raw = w.readframes(n)
        if sw == 3:
            a = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
            data = (
                (
                    a[:, 0].astype(np.int32)
                    | (a[:, 1].astype(np.int32) << 8)
                    | (a[:, 2].astype(np.int32) << 16)
                )
                << 8
            ) >> 8
            data = (data / 2147483648.0 * 256).astype(np.float32).reshape(-1, ch)
        else:
            raise
    if data.ndim == 1:
        data = data[:, None]
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    return data.T.copy(), sr


def _load_via_ffmpeg(path: str, sr: int | None = None) -> Tuple[np.ndarray, int]:
    """Single decode pass at the source rate (or ``sr`` when given); the true
    rate is read with ffprobe so callers resample exactly once."""
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError(
            f"cannot decode {path!r}: non-WAV formats need ffmpeg, which is "
            "not installed in this environment"
        )
    if sr is None:
        ffprobe = shutil.which("ffprobe")
        if ffprobe is not None:
            probe = subprocess.run(
                [
                    ffprobe, "-v", "error", "-select_streams", "a:0",
                    "-show_entries", "stream=sample_rate",
                    "-of", "default=noprint_wrappers=1:nokey=1", path,
                ],
                capture_output=True,
                text=True,
            )
            try:
                sr = int(probe.stdout.strip().splitlines()[0])
            except (ValueError, IndexError):
                sr = None
        if sr is None:
            sr = 48000  # last resort; caller resamples
    out = subprocess.run(
        [ffmpeg, "-i", path, "-f", "f32le", "-ac", "1", "-ar", str(sr), "-"],
        capture_output=True,
        check=True,
    )
    data = np.frombuffer(out.stdout, dtype=np.float32)
    return data[None, :].copy(), sr


def load_audio(path: str) -> Tuple[np.ndarray, int]:
    """-> ([C, L] float32, sample_rate). WAV natively; mp3/ogg via ffmpeg."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".wav":
        native = _native_lib()
        if native is not None:
            out = native.load_wav(path)
            if out is not None:
                return out
        return _load_wav_numpy(path)
    return _load_via_ffmpeg(path)


def save_wav(path: str, wave: np.ndarray, sample_rate: int = 24000) -> None:
    """wave: [L] or [C, L] float32 -> 16-bit PCM WAV."""
    from scipy.io import wavfile

    wave = np.asarray(wave)
    if wave.ndim == 2:
        wave = wave.T  # scipy wants [L, C]
    pcm = np.clip(wave, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    wavfile.write(path, sample_rate, pcm)


_NATIVE = None
_NATIVE_TRIED = False


def _native_lib():
    """The C++ audio library (native/libtinyvc_audio.so), if built."""
    global _NATIVE, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE_TRIED = True
        try:
            from ..data.native_loader import NativeAudio

            _NATIVE = NativeAudio.maybe_create()
        except Exception:
            _NATIVE = None
    return _NATIVE
