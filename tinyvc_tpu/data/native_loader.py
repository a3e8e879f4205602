"""ctypes bindings to the native audio runtime (native/libtinyvc_audio.so).

Provides WAV decode and a multithreaded prefetching batch loader. Every
entry point degrades gracefully when the library has not been built — the
Python implementations in `tinyvc_tpu.data.dataset` / `utils.audio_io` are
the fallback.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libtinyvc_audio.so",
)


def _maybe_build():
    """Build (or rebuild a stale) libtinyvc_audio.so from source. The binary
    is deliberately NOT committed to the repo (unreviewable; platform-bound);
    it is compiled on demand from native/tinyvc_audio.cc."""
    import subprocess

    native_dir = os.path.dirname(_LIB_PATH)
    src = os.path.join(native_dir, "tinyvc_audio.cc")
    if not os.path.exists(src):
        return
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(
        src
    ):
        return
    try:
        subprocess.run(
            ["make", "-C", native_dir], capture_output=True, timeout=120
        )
    except Exception:
        pass


def _load_lib():
    _maybe_build()
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.tvc_load_wav.restype = ctypes.c_long
    lib.tvc_load_wav.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.tvc_save_wav.restype = ctypes.c_int
    lib.tvc_save_wav.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
        ctypes.c_int,
    ]
    lib.tvc_resample.restype = ctypes.c_long
    lib.tvc_resample.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
    ]
    lib.tvc_free.argtypes = [ctypes.c_void_p]
    lib.tvc_loader_create.restype = ctypes.c_void_p
    lib.tvc_loader_create.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_uint64,
    ]
    lib.tvc_loader_next.restype = ctypes.c_int
    lib.tvc_loader_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.tvc_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.tvc_loader_error_count.restype = ctypes.c_long
    lib.tvc_loader_error_count.argtypes = [ctypes.c_void_p]
    return lib


class NativeAudio:
    """WAV decode through the native library."""

    def __init__(self, lib):
        self.lib = lib

    @classmethod
    def maybe_create(cls) -> Optional["NativeAudio"]:
        lib = _load_lib()
        return cls(lib) if lib is not None else None

    def load_wav(self, path: str) -> Optional[Tuple[np.ndarray, int]]:
        out = ctypes.POINTER(ctypes.c_float)()
        sr = ctypes.c_int()
        ch = ctypes.c_int()
        frames = self.lib.tvc_load_wav(
            path.encode(), ctypes.byref(out), ctypes.byref(sr), ctypes.byref(ch)
        )
        if frames < 0:
            return None
        n = frames * ch.value
        data = np.ctypeslib.as_array(out, shape=(n,)).copy()
        self.lib.tvc_free(out)
        # interleaved [L, C] -> [C, L]
        return data.reshape(frames, ch.value).T.copy(), sr.value


class NativePrefetchLoader:
    """Infinite stream of shuffled {wave, f0} batches, prefetched by C++
    worker threads. Used by the training loops (steady-state training wants
    an endless sampler; epoch boundaries are step-count based)."""

    def __init__(
        self,
        cache_dir: str,
        num_items: int,
        batch_size: int,
        chunk_len: int = 48000,
        f0_len: int = 100,
        sample_rate: int = 24000,
        num_threads: int = 2,
        seed: int = 0,
    ):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError(
                "native library not built; run `make -C native` or use the "
                "Python DataLoader"
            )
        self.lib = lib
        self.batch = batch_size
        self.chunk_len = chunk_len
        self.f0_len = f0_len
        self._reported_errors = 0
        self._handle = lib.tvc_loader_create(
            cache_dir.encode(),
            num_items,
            batch_size,
            chunk_len,
            f0_len,
            sample_rate,
            num_threads,
            seed,
        )

    def next(self) -> dict:
        wave = np.empty((self.batch, self.chunk_len), np.float32)
        f0 = np.empty((self.batch, self.f0_len), np.float32)
        rc = self.lib.tvc_loader_next(
            self._handle,
            wave.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            f0.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise RuntimeError("native loader stopped")
        errs = self.lib.tvc_loader_error_count(self._handle)
        if errs > self._reported_errors:
            # corrupt / partially-written cache files decode to silence;
            # surface it instead of silently degrading training
            print(
                f"[tinyvc_tpu] WARNING: native loader hit {errs} decode "
                "failure(s); affected samples were zero-filled. Check the "
                "dataset cache for corrupt {idx}.wav / {idx}.f0.npy files."
            )
            self._reported_errors = errs
        return {"wave": wave, "f0": f0}

    @property
    def error_count(self) -> int:
        """Cumulative decode failures (zero-filled sample slots) so far."""
        return int(self.lib.tvc_loader_error_count(self._handle))

    def close(self):
        if self._handle:
            self.lib.tvc_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
