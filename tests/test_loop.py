"""End-to-end training-loop smoke tests on a tiny synthetic cache."""

import pytest

pytestmark = pytest.mark.slow  # long tier; quick tier: -m "not slow"

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


def test_teacherless_step_leaves_content_head_unforced(rng):
    """Without a teacher the distill term must be DROPPED, not targeted at
    zeros (round-1 bug: 45 * L1(z, 0) actively destroyed the content head).
    The SSL branch contributes nothing to the teacher-less loss, so its
    gradient must be exactly zero."""
    import jax
    import jax.numpy as jnp

    from tests.test_training import small_config
    from tinyvc_tpu.dsp import spectrogram
    from tinyvc_tpu.models import Encoder, freq2id
    from tinyvc_tpu.train import encoder_train

    cfg = small_config()
    enc = Encoder(cfg.encoder)
    B, L = 2, 4800
    F = L // cfg.audio.hop_size
    wave = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1)
    spec = spectrogram(wave, cfg.audio.n_fft, cfg.audio.hop_size)
    params = enc.init(jax.random.PRNGKey(0), spec)
    labels = freq2id(jnp.full((B, F), 150.0))
    cw = jnp.ones((cfg.encoder.num_pitch_classes,))
    teacher = jnp.zeros((B, F, cfg.encoder.ssl_dim))

    def loss_no_distill(p):
        return encoder_train.encoder_loss(enc, p, spec, labels, teacher, cw, 0.0)[0]

    grads = jax.grad(loss_no_distill)(params)
    ssl_grads = grads["params"]["ssl_feature_estimator"]
    total = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(ssl_grads))
    assert total == 0.0

    # the buggy formulation (zeros target, weight 45) does NOT have zero
    # grads — guard that the test can tell the difference
    def loss_buggy(p):
        return encoder_train.encoder_loss(enc, p, spec, labels, teacher, cw, 45.0)[0]

    g2 = jax.grad(loss_buggy)(params)["params"]["ssl_feature_estimator"]
    assert sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(g2)) > 0.0

    # and the train_step wired for distill=False reports loss_distill == 0
    step_fn = encoder_train.make_train_step(cfg, distill=False)
    _, state = encoder_train.init_state(cfg, jax.random.PRNGKey(0))
    _, metrics = step_fn(state, wave, jnp.full((B, F), 150.0), teacher,
                         jax.random.PRNGKey(1))
    assert float(metrics["loss_distill"]) == 0.0


def test_precompute_teacher_cli_e2e(tiny_cache, tmp_path, rng, monkeypatch):
    """precompute_teacher (mock teacher) -> train_encoder picks up the cache
    -> distill loss decreases (VERDICT round-1 item 2)."""
    import dataclasses
    import json

    from tests.test_training import small_config
    from tinyvc_tpu.cli import precompute_teacher as ppt
    from tinyvc_tpu.train.loop import train_encoder
    from tinyvc_tpu.utils.metrics import TAG_DISTILL

    cfg = small_config()

    class FakeWavLM:
        """Deterministic per-chunk features: WavLM's 320-sample hop at 16 kHz,
        frame content = mean-pooled energy through a fixed projection."""

        def __init__(self, model_name, layer=4):
            self.proj = np.asarray(
                np.random.default_rng(7).standard_normal((1, cfg.encoder.ssl_dim)),
                np.float32,
            )

        def __call__(self, wave_16k):
            b, l16 = wave_16k.shape
            ft = l16 // 320
            pooled = np.abs(wave_16k[:, : ft * 320].reshape(b, ft, 320)).mean(-1)
            return (pooled[..., None] * self.proj).astype(np.float32)

    monkeypatch.setattr("tinyvc_tpu.train.teacher.WavLMTeacher", FakeWavLM)
    ppt.main(["--dataset-cache", str(tiny_cache)])
    feats = np.load(tiny_cache / "0.teacher.npy")
    assert feats.shape[1] == cfg.encoder.ssl_dim and feats.shape[0] > 0
    # idempotent: second run skips existing files
    ppt.main(["--dataset-cache", str(tiny_cache)])

    monkeypatch.setenv("TINYVC_NO_NATIVE_LOADER", "1")
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, batch_size=2, log_interval=1, save_interval=10000
        ),
    )
    train_encoder(
        cfg,
        dataset_dir=str(tiny_cache),
        ckpt_dir=str(tmp_path / "enc_pt"),
        log_dir=str(tmp_path / "logs_pt"),
        epochs=8,
    )
    with open(tmp_path / "logs_pt" / "metrics.jsonl") as f:
        distill = [json.loads(line)[TAG_DISTILL] for line in f]
    assert len(distill) >= 8
    # trained distill loss must beat the untrained start
    assert min(distill[-3:]) < distill[0]


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
