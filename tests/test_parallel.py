"""Sharding tests on the virtual 8-device CPU mesh: sharded kNN equals the
dense result, and the DP train step runs sharded."""

import numpy as np

import jax
import jax.numpy as jnp

from tinyvc_tpu.ops import match_features
from tinyvc_tpu.parallel import (
    make_mesh,
    pad_dictionary,
    shard_batch,
    sharded_match_features,
)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_knn_matches_dense(rng):
    mesh = make_mesh(data=2, model=4)
    B, T, N, C = 2, 24, 250, 64  # N deliberately not divisible by 4
    src = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    dictionary = jnp.asarray(rng.standard_normal((N, C)).astype(np.float32))

    dense = match_features(src, jnp.broadcast_to(dictionary[None], (B, N, C)), k=4)

    padded, mask = pad_dictionary(dictionary, 4)
    sharded = sharded_match_features(mesh, src, padded, mask, k=4)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense), atol=1e-5)


def test_sharded_knn_payload_variants_match(rng):
    """The index-payload diet (all-gather values + psum of owned winners,
    round-4) must equal both the vector-payload layout and dense, including
    cross-shard tie behaviour (identical candidate ordering)."""
    mesh = make_mesh(data=2, model=4)
    B, T, N, C = 2, 24, 250, 64
    src = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    dictionary = np.asarray(rng.standard_normal((N, C)).astype(np.float32))
    # inject exact duplicate rows across shard boundaries to force ties
    dictionary[200] = dictionary[10]
    dictionary[130] = dictionary[70]
    dictionary = jnp.asarray(dictionary)

    dense = match_features(src, jnp.broadcast_to(dictionary[None], (B, N, C)), k=4)
    padded, mask = pad_dictionary(dictionary, 4)
    for metric in ("cos", "IP", "L2"):
        d = match_features(
            src, jnp.broadcast_to(dictionary[None], (B, N, C)), k=4, metric=metric
        )
        a = sharded_match_features(
            mesh, src, padded, mask, k=4, metric=metric, payload="index"
        )
        b = sharded_match_features(
            mesh, src, padded, mask, k=4, metric=metric, payload="vectors"
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        np.testing.assert_allclose(np.asarray(a), np.asarray(d), atol=1e-5)
    del dense


def test_sharded_knn_small_dictionary(rng):
    """Dictionaries smaller than k rows/shard must still work: pad_dictionary
    guarantees >= k rows per shard and N < k raises (ADVICE round 1)."""
    import pytest

    mesh = make_mesh(data=1, model=8)
    B, T, N, C = 1, 8, 6, 32  # 6 rows over 8 shards, k=4
    src = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    dictionary = jnp.asarray(rng.standard_normal((N, C)).astype(np.float32))
    dense = match_features(src, jnp.broadcast_to(dictionary[None], (B, N, C)), k=4)
    padded, mask = pad_dictionary(dictionary, 8, k=4)
    assert padded.shape[0] == 32  # k * num_shards
    sharded = sharded_match_features(mesh, src, padded, mask, k=4)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense), atol=1e-5)

    with pytest.raises(ValueError):
        pad_dictionary(dictionary[:3], 8, k=4)


def test_sharded_knn_ip_metric(rng):
    mesh = make_mesh(data=1, model=8)
    B, T, N, C = 1, 10, 64, 32
    src = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    dictionary = jnp.asarray(rng.standard_normal((N, C)).astype(np.float32))
    dense = match_features(
        src, jnp.broadcast_to(dictionary[None], (B, N, C)), k=4, metric="IP"
    )
    padded, mask = pad_dictionary(dictionary, 8)
    sharded = sharded_match_features(mesh, src, padded, mask, k=4, metric="IP")
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense), atol=1e-5)


def test_data_parallel_encoder_train_step(rng):
    from tests.test_training import small_config
    from tinyvc_tpu.parallel import replicate
    from tinyvc_tpu.train import encoder_train

    cfg = small_config()
    mesh = make_mesh(data=8, model=1)
    _, state = encoder_train.init_state(cfg, jax.random.PRNGKey(0))
    state = replicate(state, mesh)
    step = encoder_train.make_train_step(cfg)

    B, L = 8, cfg.train.chunk_length
    F = L // cfg.audio.hop_size
    batch = {
        "wave": rng.standard_normal((B, L)).astype(np.float32) * 0.1,
        "f0": (np.abs(rng.standard_normal((B, F))) * 200 + 30).astype(np.float32),
        "teacher": rng.standard_normal((B, F, 32)).astype(np.float32),
    }
    batch = shard_batch(batch, mesh)
    state, metrics = step(
        state, batch["wave"], batch["f0"], batch["teacher"], jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
