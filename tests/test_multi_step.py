"""K-steps-per-dispatch training (train/multi_step.py).

The multi-step scan must be the SAME computation as K sequential single
steps fed the same indices and keys — only the dispatch granularity
changes. Plus loop-level integration: boundaries (log/save/join) are never
straddled and checkpoints land at the same steps as the per-step loop.
"""

import dataclasses
import os

import numpy as np
import pytest

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax
import jax.numpy as jnp

from tests.test_training import small_config
from tinyvc_tpu.train import decoder_train, encoder_train
from tinyvc_tpu.train.multi_step import (
    effective_k,
    make_decoder_multi_step,
    make_encoder_multi_step,
)


def test_effective_k_divides_every_boundary():
    assert effective_k(50, 50, 500, 10000, 30000) == 50
    assert effective_k(50, 50, 500, 10000, 30000, 0) == 50  # 0 = no boundary
    assert effective_k(50, 50, 500, 960) == 10
    assert effective_k(7, 50, 500) == 1
    assert effective_k(0) == 1
    assert effective_k(100, 50) == 50


def _cache(rng, n, cfg, with_teacher=True):
    L = cfg.train.chunk_length
    F = L // cfg.audio.hop_size
    waves = jnp.asarray(rng.standard_normal((n, L)).astype(np.float32) * 0.2)
    f0s = jnp.asarray(
        rng.uniform(100.0, 300.0, (n, F)).astype(np.float32)
    )
    teacher = jnp.asarray(
        rng.standard_normal((n, F, cfg.encoder.ssl_dim)).astype(np.float32) * 0.2
    ) if with_teacher else None
    return waves, f0s, teacher


def test_encoder_multi_step_matches_single_steps(rng):
    cfg = small_config()
    _, state = encoder_train.init_state(cfg, jax.random.PRNGKey(0))
    waves, f0s, teacher = _cache(rng, 5, cfg)

    K, B = 3, cfg.train.batch_size
    idx = jnp.asarray(rng.integers(0, 5, (K, B)).astype(np.int32))
    keys = jax.random.split(jax.random.PRNGKey(7), K)

    step_fn = encoder_train.make_train_step(cfg, distill=True)
    ref = state
    for k in range(K):
        ref, ref_metrics = step_fn(
            ref, waves[idx[k]], f0s[idx[k]], teacher[idx[k]], keys[k]
        )

    multi = make_encoder_multi_step(cfg, distill=True)
    out, metrics = multi(state, waves, f0s, teacher, idx, keys)

    assert int(out.step) == int(ref.step) == K
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6),
        jax.device_get(out.params), jax.device_get(ref.params),
    )
    np.testing.assert_allclose(
        float(metrics["loss_f0"]), float(ref_metrics["loss_f0"]), rtol=1e-5
    )


@pytest.mark.slow
def test_decoder_multi_step_matches_single_steps(rng):
    cfg = small_config()
    state = decoder_train.init_state(cfg, jax.random.PRNGKey(1))
    _, enc_state = encoder_train.init_state(cfg, jax.random.PRNGKey(2))
    waves, _, _ = _cache(rng, 5, cfg, with_teacher=False)

    K, B = 2, cfg.train.batch_size
    idx = jnp.asarray(rng.integers(0, 5, (K, B)).astype(np.int32))
    keys = jax.random.split(jax.random.PRNGKey(9), K)

    step_fn = decoder_train.make_train_step(cfg, d_join=True)
    ref = state
    for k in range(K):
        ref, ref_metrics = step_fn(ref, enc_state.params, waves[idx[k]], keys[k])

    multi = make_decoder_multi_step(cfg, d_join=True)
    out, metrics = multi(state, enc_state.params, waves, idx, keys)

    assert int(out.step) == int(ref.step) == K
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5),
        jax.device_get(out.gen_params), jax.device_get(ref.gen_params),
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5),
        jax.device_get(out.disc_params), jax.device_get(ref.disc_params),
    )
    np.testing.assert_allclose(
        float(metrics["loss_spec"]), float(ref_metrics["loss_spec"]), rtol=1e-4
    )
    # skip counters are summed over the window, not last-value
    assert int(metrics["skipped_g"]) == 0 and int(metrics["skipped_d"]) == 0


@pytest.mark.slow
def test_decoder_loop_multistep_end_to_end(tmp_path, rng):
    """Loop-level: device-data + K>1 runs to max_steps, crosses the join
    boundary inside the multi-step path, writes aligned checkpoints, and a
    resumed run continues from the saved step."""
    from tinyvc_tpu.utils.audio_io import save_wav
    from tinyvc_tpu.train.loop import train_decoder

    cache = tmp_path / "cache"
    cache.mkdir()
    L, F = 4800, 10
    for i in range(4):
        w = np.clip(rng.standard_normal(L) * 0.2, -0.9, 0.9).astype(np.float32)
        save_wav(str(cache / f"{i}.wav"), w, 24000)
        np.save(cache / f"{i}.f0.npy", np.full(F, 150.0, np.float32))

    cfg = small_config()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, batch_size=2, log_interval=2, save_interval=4,
            max_steps=6, discriminator_join=4,
        ),
    )
    state = train_decoder(
        cfg,
        dataset_dir=str(cache),
        encoder_ckpt=str(tmp_path / "no_enc"),
        ckpt_dir=str(tmp_path / "dec_ckpt"),
        log_dir=str(tmp_path / "logs"),
        device_data=True,
        steps_per_dispatch=2,
    )
    assert int(state.step) == 6
    # a resumed run restores the saved step and trains on to the new target
    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, max_steps=8)
    )
    state2 = train_decoder(
        cfg2,
        dataset_dir=str(cache),
        encoder_ckpt=str(tmp_path / "no_enc"),
        ckpt_dir=str(tmp_path / "dec_ckpt"),
        log_dir=str(tmp_path / "logs"),
        device_data=True,
        steps_per_dispatch=2,
    )
    assert int(state2.step) == 8
