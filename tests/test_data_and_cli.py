"""Data pipeline + CLI round-trip on synthetic audio, checkpointing, export."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def audio_tree(tmp_path_factory):
    """A tiny source tree of wav files at mixed sample rates."""
    from tinyvc_tpu.utils.audio_io import save_wav

    root = tmp_path_factory.mktemp("audio_src")
    rng = np.random.default_rng(0)
    t24 = np.arange(60000) / 24000
    save_wav(str(root / "a.wav"), (np.sin(2 * np.pi * 220 * t24) * 0.4), 24000)
    t16 = np.arange(40000) / 16000
    save_wav(str(root / "sub" / "b.wav"), np.zeros(1), 24000) if False else None
    (root / "sub").mkdir()
    save_wav(
        str(root / "sub" / "b.wav"),
        (np.sin(2 * np.pi * 330 * t16) * 0.3 + rng.standard_normal(40000) * 0.01),
        16000,
    )
    return root


def test_wav_roundtrip(tmp_path, rng):
    from tinyvc_tpu.utils.audio_io import load_audio, save_wav

    x = np.clip(rng.standard_normal(1000) * 0.3, -0.99, 0.99).astype(np.float32)
    save_wav(str(tmp_path / "x.wav"), x, 24000)
    y, sr = load_audio(str(tmp_path / "x.wav"))
    assert sr == 24000 and y.shape == (1, 1000)
    np.testing.assert_allclose(y[0], x, atol=2.5 / 32768)


def test_preprocess_and_dataset(audio_tree, tmp_path):
    from tinyvc_tpu.data.dataset import DataLoader, Dataset
    from tinyvc_tpu.data.preprocess import preprocess

    cache = tmp_path / "cache"
    n = preprocess(str(audio_tree), str(cache), length=48000, progress=False)
    # a.wav: 60000 samples -> 2 chunks; b.wav: 40000@16k -> 60000@24k -> 2
    assert n == 4
    ds = Dataset(str(cache))
    assert len(ds) == 4
    wf, f0 = ds[0]
    assert wf.shape == (48000,) and f0.shape == (100,)
    # voiced region of the 220 Hz tone should be labelled near 220
    voiced = f0[f0 > 0]
    assert len(voiced) > 50
    assert abs(np.median(voiced) - 220) < 10

    dl = DataLoader(ds, batch_size=2, shuffle=True, seed=1)
    batches = list(dl)
    assert len(batches) == 2
    assert batches[0]["wave"].shape == (2, 48000)
    assert batches[0]["f0"].shape == (2, 100)


def test_extract_index_and_infer(audio_tree, tmp_path, rng):
    from tests.test_training import small_config
    from tinyvc_tpu.data.preprocess import preprocess
    from tinyvc_tpu.infer.index import extract_index
    from tinyvc_tpu.models import Encoder
    from tinyvc_tpu.train import encoder_train

    cfg = small_config()
    cache = tmp_path / "cache"
    preprocess(str(audio_tree), str(cache), length=48000, progress=False)
    _, enc_state = encoder_train.init_state(cfg, jax.random.PRNGKey(0))
    index = extract_index(
        enc_state.params, str(cache), size=64, stride=4, cfg=cfg, batch_size=2
    )
    assert index.shape == (64, cfg.encoder.ssl_dim)
    assert np.isfinite(index).all()


def test_checkpoint_roundtrip(tmp_path):
    from tests.test_training import small_config
    from tinyvc_tpu.train import encoder_train
    from tinyvc_tpu.utils.checkpoint import CheckpointManager

    cfg = small_config()
    _, state = encoder_train.init_state(cfg, jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(7, jax.device_get(state), cfg)
    assert mgr.latest_step() == 7

    _, fresh = encoder_train.init_state(cfg, jax.random.PRNGKey(42))
    restored = mgr.restore(fresh)
    chex_equal = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
        jax.device_get(state.params),
        jax.device_get(restored.params),
    )
    assert all(jax.tree.leaves(chex_equal))
    cfg2 = mgr.restore_config()
    assert cfg2 == cfg
    mgr.close()


@pytest.mark.slow
def test_export_stablehlo_roundtrip(tmp_path, rng):
    from tests.test_training import small_config
    from tinyvc_tpu.infer.export import export_all, load_exported
    from tinyvc_tpu.models import Decoder, Encoder
    from tinyvc_tpu.train import decoder_train, encoder_train

    cfg = small_config()
    _, enc_state = encoder_train.init_state(cfg, jax.random.PRNGKey(0))
    gan_state = decoder_train.init_state(cfg, jax.random.PRNGKey(1))
    paths = export_all(
        enc_state.params, gan_state.gen_params, str(tmp_path / "exp"), cfg,
        example_frames=10,
    )
    enc_call = load_exported(paths["encoder"])
    spec = jnp.asarray(rng.standard_normal((1, 10, 961)).astype(np.float32))
    content, logits = enc_call(spec)
    assert content.shape == (1, 10, cfg.encoder.ssl_dim)

    encoder = Encoder(cfg.encoder)
    ref_content, ref_logits = encoder.apply(enc_state.params, spec)
    np.testing.assert_allclose(
        np.asarray(content), np.asarray(ref_content), atol=1e-5
    )


def test_metrics_writer(tmp_path):
    from tinyvc_tpu.utils.metrics import MetricsWriter

    w = MetricsWriter(str(tmp_path / "logs"), use_tensorboard=False)
    w.write(1, {"loss/x": 0.5})
    w.write(2, {"loss/x": 0.25})
    w.close()
    import json

    lines = open(tmp_path / "logs" / "metrics.jsonl").read().strip().split("\n")
    assert len(lines) == 2
    assert json.loads(lines[1])["loss/x"] == 0.25


def test_noise_generator_semantics(tmp_path, rng):
    """p=0.3 mix of a random crop at random gain (reference
    `module/utils/noise_generator.py:10-33`); p=0 leaves audio untouched,
    p=1 mixes noise into every sample, short noise files are zero-padded."""
    import numpy as np

    from tinyvc_tpu.data.noise import NoiseGenerator
    from tinyvc_tpu.utils.audio_io import save_wav

    noise_dir = tmp_path / "noises"
    noise_dir.mkdir()
    long_noise = rng.standard_normal(48000).astype(np.float32) * 0.1
    save_wav(str(noise_dir / "long.wav"), long_noise, 24000)

    gen = NoiseGenerator(str(noise_dir), seed=3)
    xs = rng.standard_normal((4, 4800)).astype(np.float32) * 0.1

    np.testing.assert_array_equal(gen.add_noise(xs, p=0.0), xs)

    noisy = gen.add_noise(xs, p=1.0)
    assert noisy.shape == xs.shape
    # every sample was mixed with nonzero noise at gain U(0,1)
    diff = noisy - xs
    assert (np.abs(diff).max(axis=1) > 0).all()
    # additive mix: never replaces the signal
    assert not np.allclose(noisy, 0)

    # with p=0.3 over many draws, roughly 30% of samples get noise
    hits = 0
    trials = 50
    for _ in range(trials):
        d = gen.add_noise(xs, p=0.3) - xs
        hits += int((np.abs(d).max(axis=1) > 0).sum())
    frac = hits / (trials * xs.shape[0])
    assert 0.15 < frac < 0.45

    # short noise file: zero-padded crop, no crash (improves on the
    # reference, which raises on noise shorter than the chunk)
    save_wav(str(noise_dir / "short.wav"), long_noise[:1000], 24000)
    gen2 = NoiseGenerator(str(noise_dir), seed=0)
    out = gen2.add_noise(xs, p=1.0)
    assert out.shape == xs.shape and np.isfinite(out).all()


def test_init_distributed_arg_forwarding(monkeypatch):
    """Single-process: no-op. Multi-process: forwards coordinator/count/id to
    jax.distributed.initialize (ADVICE round 1: structurally untested)."""
    import jax

    from tinyvc_tpu.parallel.mesh import init_distributed

    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda *a: calls.append(a)
    )
    init_distributed()  # no args -> no-op
    init_distributed(num_processes=1)  # single process -> no-op
    assert calls == []
    init_distributed("host0:1234", 4, 2)
    assert calls == [("host0:1234", 4, 2)]


def test_webui_importable_and_gated():
    """The webui CLI must be importable without gradio and exit cleanly when
    gradio is missing (gradio is not in this image)."""
    import importlib

    mod = importlib.import_module("tinyvc_tpu.cli.infer_webui")
    assert hasattr(mod, "main")
    try:
        import gradio  # noqa: F401

        has_gradio = True
    except ImportError:
        has_gradio = False
    if not has_gradio:
        import pytest

        with pytest.raises(SystemExit):
            mod.main([])


def test_params_npz_roundtrip(tmp_path):
    """save_params_npz/.npz loading: bitwise round trip of a param tree
    through the params-only serving export (cli/export_params)."""
    import numpy as np

    import jax

    from tests.test_training import small_config
    from tinyvc_tpu.train import encoder_train
    from tinyvc_tpu.utils.model_store import (
        _load_params_npz,
        save_params_npz,
    )

    cfg = small_config()
    _, state = encoder_train.init_state(cfg, jax.random.PRNGKey(3))
    path = str(tmp_path / "enc.npz")
    save_params_npz(path, jax.device_get(state.params))
    back = _load_params_npz(path)
    la, lb = jax.tree.leaves(state.params), jax.tree.leaves(back)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        assert np.array_equal(np.asarray(x), np.asarray(y))
