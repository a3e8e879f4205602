"""Native C++ audio runtime tests (skipped if the library is not built)."""

import os
import subprocess

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
LIB = os.path.join(NATIVE_DIR, "libtinyvc_audio.so")


@pytest.fixture(scope="module", autouse=True)
def built():
    if not os.path.exists(LIB):
        r = subprocess.run(["make", "-C", NATIVE_DIR], capture_output=True)
        if r.returncode != 0:
            pytest.skip("native toolchain unavailable")
    return True


def test_native_wav_decode_matches_python(tmp_path, rng):
    from tinyvc_tpu.data.native_loader import NativeAudio
    from tinyvc_tpu.utils.audio_io import _load_wav_numpy, save_wav

    x = np.clip(rng.standard_normal(5000) * 0.3, -0.99, 0.99).astype(np.float32)
    path = str(tmp_path / "t.wav")
    save_wav(path, x, 24000)

    na = NativeAudio.maybe_create()
    assert na is not None
    out = na.load_wav(path)
    assert out is not None
    data, sr = out
    ref, sr2 = _load_wav_numpy(path)
    assert sr == sr2 == 24000
    np.testing.assert_allclose(data, ref, atol=1e-6)


def test_native_resample_matches_jax(rng):
    import ctypes

    import jax.numpy as jnp

    from tinyvc_tpu.data.native_loader import _load_lib
    from tinyvc_tpu.dsp.resample import resample

    lib = _load_lib()
    x = (np.sin(2 * np.pi * 440 * np.arange(24000) / 24000) * 0.5).astype(
        np.float32
    )
    out_ptr = ctypes.POINTER(ctypes.c_float)()
    n = lib.tvc_resample(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(x),
        24000,
        16000,
        ctypes.byref(out_ptr),
    )
    native = np.ctypeslib.as_array(out_ptr, shape=(n,)).copy()
    lib.tvc_free(out_ptr)
    ours = np.asarray(resample(jnp.asarray(x[None]), 24000, 16000))[0]
    assert n == len(ours)
    np.testing.assert_allclose(native, ours, atol=2e-4)


def test_native_prefetch_loader(tmp_path, rng):
    from tinyvc_tpu.data.native_loader import NativePrefetchLoader
    from tinyvc_tpu.utils.audio_io import save_wav

    cache = tmp_path / "cache"
    cache.mkdir()
    n_items, L, F = 6, 4800, 10
    waves = []
    for i in range(n_items):
        w = np.clip(rng.standard_normal(L) * 0.3, -0.99, 0.99).astype(np.float32)
        save_wav(str(cache / f"{i}.wav"), w, 24000)
        np.save(cache / f"{i}.f0.npy", np.full(F, 100.0 + i, np.float32))
        waves.append(w)

    loader = NativePrefetchLoader(
        str(cache), n_items, batch_size=2, chunk_len=L, f0_len=F, num_threads=2
    )
    seen_f0 = set()
    for _ in range(6):  # 2 epochs worth
        b = loader.next()
        assert b["wave"].shape == (2, L)
        assert b["f0"].shape == (2, F)
        assert np.isfinite(b["wave"]).all()
        for row in b["f0"]:
            seen_f0.add(int(row[0]))
        # each wave row must match one of the saved files (16-bit quantised)
        for row in b["wave"]:
            errs = [np.abs(row - w).max() for w in waves]
            assert min(errs) < 1e-4
    assert seen_f0 == {100 + i for i in range(n_items)}
    loader.close()
