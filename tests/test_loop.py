"""End-to-end training-loop smoke tests on a tiny synthetic cache."""

import os

import numpy as np
import pytest

os.environ.setdefault("HF_HUB_OFFLINE", "1")  # teacher load must fail fast
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")


@pytest.fixture()
def tiny_cache(tmp_path, rng):
    from tinyvc_tpu.utils.audio_io import save_wav

    cache = tmp_path / "cache"
    cache.mkdir()
    L, F = 4800, 10
    for i in range(4):
        w = np.clip(rng.standard_normal(L) * 0.2, -0.9, 0.9).astype(np.float32)
        save_wav(str(cache / f"{i}.wav"), w, 24000)
        np.save(cache / f"{i}.f0.npy", np.full(F, 150.0, np.float32))
    return cache


def test_train_encoder_loop_runs(tiny_cache, tmp_path):
    import dataclasses

    from tests.test_training import small_config
    from tinyvc_tpu.train.loop import train_encoder

    cfg = small_config()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, batch_size=2, log_interval=1, save_interval=1000
        ),
    )
    state = train_encoder(
        cfg,
        dataset_dir=str(tiny_cache),
        ckpt_dir=str(tmp_path / "enc_ckpt"),
        log_dir=str(tmp_path / "logs"),
        epochs=1,
    )
    assert int(state.step) == 2  # 4 items / batch 2

    # resume: second run restores step and continues
    state2 = train_encoder(
        cfg,
        dataset_dir=str(tiny_cache),
        ckpt_dir=str(tmp_path / "enc_ckpt"),
        log_dir=str(tmp_path / "logs"),
        epochs=1,
    )
    assert int(state2.step) == 4


def test_train_encoder_cached_teacher(tiny_cache, tmp_path, rng, monkeypatch):
    """Precomputed {idx}.teacher.npy features drive distillation (the
    zero-egress alternative to a live WavLM teacher)."""
    import dataclasses

    import numpy as np

    from tests.test_training import small_config
    from tinyvc_tpu.train.loop import train_encoder

    cfg = small_config()
    F = 10
    for i in range(4):
        np.save(
            tiny_cache / f"{i}.teacher.npy",
            rng.standard_normal((F, cfg.encoder.ssl_dim)).astype(np.float32),
        )
    monkeypatch.setenv("TINYVC_NO_NATIVE_LOADER", "1")
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, batch_size=2, log_interval=1, save_interval=1000
        ),
    )
    state = train_encoder(
        cfg,
        dataset_dir=str(tiny_cache),
        ckpt_dir=str(tmp_path / "enc_ct"),
        log_dir=str(tmp_path / "logs"),
        epochs=1,
    )
    assert int(state.step) == 2


def test_train_decoder_loop_runs(tiny_cache, tmp_path):
    import dataclasses

    from tests.test_training import small_config
    from tinyvc_tpu.train.loop import train_decoder

    cfg = small_config()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, batch_size=2, log_interval=1, save_interval=1000,
            discriminator_join=1,  # exercise the join transition
        ),
    )
    state = train_decoder(
        cfg,
        dataset_dir=str(tiny_cache),
        encoder_ckpt=str(tmp_path / "missing_enc"),
        ckpt_dir=str(tmp_path / "dec_ckpt"),
        log_dir=str(tmp_path / "logs"),
        max_steps=3,
    )
    assert int(state.step) == 3
