"""Train-step tests: loss decreases, CE semantics, GAN phases both compile."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from tinyvc_tpu.config import (
    AudioConfig,
    DecoderConfig,
    DiscriminatorConfig,
    EncoderConfig,
    TinyVCConfig,
    TrainConfig,
)
from tinyvc_tpu.train import decoder_train, encoder_train
from tinyvc_tpu.train.encoder_train import weighted_cross_entropy


def small_config():
    return TinyVCConfig(
        encoder=EncoderConfig(
            pitch_channels=16, pitch_num_layers=1, ssl_channels=16,
            ssl_dilations=(1,), ssl_dim=32,
        ),
        decoder=DecoderConfig(
            source_channels=16, source_num_layers=1,
            filter_channels=(32, 24, 16, 12, 8), content_channels=32,
        ),
        discriminator=DiscriminatorConfig(
            periods=(2, 3), resolutions=(32,), channels=4, max_channels=16,
            num_layers=2,
        ),
        train=TrainConfig(batch_size=2, chunk_length=4800, disc_crop=2400),
    )


def test_weighted_cross_entropy_matches_torch(rng):
    logits = rng.standard_normal((2, 7, 10)).astype(np.float32)
    labels = rng.integers(0, 10, (2, 7))
    w = rng.uniform(0.1, 1.0, 10).astype(np.float32)
    ref = TF.cross_entropy(
        torch.from_numpy(np.transpose(logits, (0, 2, 1))),
        torch.from_numpy(labels),
        weight=torch.from_numpy(w),
    )
    ours = weighted_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w)
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_encoder_train_step_decreases_loss(rng):
    cfg = small_config()
    key = jax.random.PRNGKey(0)
    _, state = encoder_train.init_state(cfg, key)
    step = encoder_train.make_train_step(cfg)

    B, L = 2, cfg.train.chunk_length
    F = L // cfg.audio.hop_size
    wave = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1)
    f0 = jnp.asarray(
        (np.abs(rng.standard_normal((B, F))) * 200 + 30).astype(np.float32)
    )
    teacher = jnp.asarray(rng.standard_normal((B, F, 32)).astype(np.float32))

    losses = []
    for i in range(5):
        state, metrics = step(state, wave, f0, teacher, jax.random.PRNGKey(i + 1))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 5


@pytest.mark.slow
def test_decoder_train_step_both_phases(rng):
    cfg = small_config()
    key = jax.random.PRNGKey(0)
    enc, enc_state = encoder_train.init_state(cfg, key)
    state = decoder_train.init_state(cfg, jax.random.PRNGKey(1))

    B, L = 2, cfg.train.chunk_length
    wave = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1)

    # pre-join phase: only spec + dsp losses
    step_pre = decoder_train.make_train_step(cfg, d_join=False)
    state, metrics = step_pre(state, enc_state.params, wave, jax.random.PRNGKey(2))
    assert "loss_adv" not in metrics
    assert np.isfinite(float(metrics["loss_g"]))
    l0 = float(metrics["loss_g"])
    for i in range(3):
        state, metrics = step_pre(
            state, enc_state.params, wave, jax.random.PRNGKey(3 + i)
        )
    # GAN phase: adversarial + feature-matching terms appear, D updates
    step_post = decoder_train.make_train_step(cfg, d_join=True)
    state, metrics = step_post(state, enc_state.params, wave, jax.random.PRNGKey(9))
    for k in ("loss_adv", "loss_feat", "loss_d"):
        assert k in metrics and np.isfinite(float(metrics[k])), k
    assert int(state.step) == 5


def test_torch_matching_init_distributions(rng):
    """Conv/Dense weights follow torch's kaiming_uniform_(a=sqrt(5)) =
    U(+-sqrt(1/fan_in)); weight-norm g initialises to ||v|| per output
    channel (reference `discriminator.py:14,80`)."""
    from tinyvc_tpu.models.discriminator import WNConv2d
    from tinyvc_tpu.models.layers import Conv1d

    conv = Conv1d(64, 3, dilation=1)
    p = conv.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 48)))["params"]
    k = np.asarray(p["kernel"])  # [3, 48, 64]
    bound = 1.0 / np.sqrt(3 * 48)
    assert np.abs(k).max() <= bound + 1e-7
    # uniform, not clipped-normal: std ~ bound/sqrt(3)
    assert abs(k.std() - bound / np.sqrt(3)) < 0.1 * bound
    b = np.asarray(p["bias"])
    assert np.abs(b).max() <= bound + 1e-7 and np.abs(b).max() > 0

    wn = WNConv2d(8, (5, 1))
    pw = wn.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 4, 3)))["params"]
    v, g = np.asarray(pw["v"]), np.asarray(pw["g"])
    np.testing.assert_allclose(
        g, np.sqrt((v * v).sum(axis=(0, 1, 2))), rtol=1e-5
    )


@pytest.mark.slow
def test_tiny_gan_50_steps_trains_both_players(rng):
    """~50 post-join steps on a fixed batch: the generator's reconstruction
    improves and the discriminator beats its untrained loss — from-scratch
    dynamics, not just 'one step runs' (VERDICT round 1, item 7)."""
    cfg = small_config()
    _, enc_state = encoder_train.init_state(cfg, jax.random.PRNGKey(0))
    state = decoder_train.init_state(cfg, jax.random.PRNGKey(1))
    step = decoder_train.make_train_step(cfg, d_join=True)

    wave = jnp.asarray(
        np.sin(
            2 * np.pi * 220.0 * np.arange(cfg.train.chunk_length) / 24000.0
        ).astype(np.float32)
        * 0.3
    )[None, :].repeat(2, axis=0)
    key = jax.random.PRNGKey(2)
    hist = {"loss_spec": [], "loss_dsp": [], "loss_d": [], "loss_g": []}
    for i in range(50):
        key, sub = jax.random.split(key)
        state, m = step(state, enc_state.params, wave, sub)
        for k in hist:
            hist[k].append(float(m[k]))

    first5 = {k: np.mean(v[:5]) for k, v in hist.items()}
    last5 = {k: np.mean(v[-5:]) for k, v in hist.items()}
    # generator: spectral reconstruction and source losses improve
    assert last5["loss_spec"] < first5["loss_spec"]
    assert last5["loss_dsp"] < first5["loss_dsp"]
    # discriminator: learns to separate real/fake (LSGAN loss falls below
    # the untrained value)
    assert last5["loss_d"] < first5["loss_d"]
    # nothing diverges
    for k, v in hist.items():
        assert np.isfinite(v).all(), k


@pytest.mark.slow
def test_remat_gan_step_matches_standard(rng):
    """decoder.remat recomputes U-Net activations under grad; the step must
    be bit-compatible with the standard step (same params tree, same losses,
    same updated weights to fp tolerance)."""
    import dataclasses

    cfg = small_config()
    rcfg = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, remat=True)
    )
    key = jax.random.PRNGKey(0)
    state = decoder_train.init_state(cfg, key)
    rstate = decoder_train.init_state(rcfg, key)
    # identical parameter trees (remat is a lifted transform, not a rewiring)
    assert jax.tree_util.tree_structure(state.gen_params) == (
        jax.tree_util.tree_structure(rstate.gen_params)
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(state.gen_params),
        jax.tree_util.tree_leaves(rstate.gen_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    _, enc_state = __import__(
        "tinyvc_tpu.train.encoder_train", fromlist=["init_state"]
    ).init_state(cfg, jax.random.PRNGKey(3))
    wave = jnp.asarray(
        rng.standard_normal((2, cfg.train.chunk_length)).astype(np.float32) * 0.1
    )
    k = jax.random.PRNGKey(7)
    step = decoder_train.make_train_step(cfg, d_join=True)
    rstep = decoder_train.make_train_step(rcfg, d_join=True)
    state1, m = step(state, enc_state.params, wave, k)
    rstate1, rm = rstep(rstate, enc_state.params, wave, k)
    for name in ("loss_g", "loss_d", "loss_spec"):
        np.testing.assert_allclose(
            float(m[name]), float(rm[name]), rtol=1e-5, atol=1e-6
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(state1.gen_params),
        jax.tree_util.tree_leaves(rstate1.gen_params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


@pytest.mark.slow
def test_fused_gan_step_matches_standard(rng):
    """The fused-kernel training path (Pallas fwd + custom_vjp bwd kernels,
    interpret mode on CPU) must track the flax/XLA step: same losses to
    fp32 tolerance at step 1 and finite, close losses after a few steps."""
    import dataclasses

    cfg = small_config()
    cfg_fused = dataclasses.replace(
        cfg,
        decoder=dataclasses.replace(
            cfg.decoder, use_fused_filter_train="on"
        ),
    )
    key = jax.random.PRNGKey(0)
    _, enc_state = encoder_train.init_state(cfg, key)
    state_a = decoder_train.init_state(cfg, jax.random.PRNGKey(1))
    state_b = decoder_train.init_state(cfg_fused, jax.random.PRNGKey(1))

    B, L = 2, cfg.train.chunk_length
    wave = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1)

    step_a = decoder_train.make_train_step(cfg, d_join=False)
    step_b = decoder_train.make_train_step(cfg_fused, d_join=False)
    for i in range(3):
        k = jax.random.PRNGKey(10 + i)
        state_a, ma = step_a(state_a, enc_state.params, wave, k)
        state_b, mb = step_b(state_b, enc_state.params, wave, k)
        la, lb = float(ma["loss_g"]), float(mb["loss_g"])
        assert np.isfinite(lb)
        # identical params/noise; only the U-Net edge-band treatment and
        # fp32 summation order differ
        assert abs(la - lb) < 0.05 * abs(la) + 1e-3, (i, la, lb)


@pytest.mark.slow
def test_manual_vjp_post_join_matches_naive(rng):
    """The single-disc-forward manual-vjp post-join step must produce the
    SAME updated parameters and losses as the plain two-value_and_grad
    reference structure (identical math, different trace)."""
    cfg = small_config()
    key = jax.random.PRNGKey(0)
    _, enc_state = encoder_train.init_state(cfg, key)
    state_a = decoder_train.init_state(cfg, jax.random.PRNGKey(1))
    state_b = jax.tree_util.tree_map(lambda x: x, state_a)

    B, L = 2, cfg.train.chunk_length
    wave = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1)

    step_fast = decoder_train.make_train_step(cfg, d_join=True)
    step_naive = decoder_train.make_train_step(
        cfg, d_join=True, naive_post_join=True
    )
    for i in range(2):
        k = jax.random.PRNGKey(7 + i)
        state_a, ma = step_fast(state_a, enc_state.params, wave, k)
        state_b, mb = step_naive(state_b, enc_state.params, wave, k)
        for name in ("loss_g", "loss_d", "loss_adv", "loss_feat"):
            np.testing.assert_allclose(
                float(ma[name]), float(mb[name]), rtol=2e-4, err_msg=name
            )
    flat_a = jax.tree_util.tree_leaves(state_a.gen_params)
    flat_b = jax.tree_util.tree_leaves(state_b.gen_params)
    for xa, xb in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(xa), np.asarray(xb), atol=5e-5
        )
    for xa, xb in zip(
        jax.tree_util.tree_leaves(state_a.disc_params),
        jax.tree_util.tree_leaves(state_b.disc_params),
    ):
        np.testing.assert_allclose(
            np.asarray(xa), np.asarray(xb), atol=5e-5
        )


def test_skip_if_nonfinite_guard():
    """The GAN optimizers' nonfinite guard: a bad step is skipped ENTIRELY
    (zero updates, inner state untouched, counted) and the surrounding
    update sequence is bit-identical to never having seen it (round-4
    burn-in: one inf gradient from TPU subnormal flush previously NaN'd
    every parameter permanently through clip_by_global_norm)."""
    import optax

    from tinyvc_tpu.train.decoder_train import skip_if_nonfinite

    inner = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    tx = skip_if_nonfinite(inner)
    params = {"w": jnp.ones((4,))}
    g1 = {"w": jnp.full((4,), 0.5)}
    g2 = {"w": jnp.asarray([0.1, -0.2, 0.3, 0.4])}

    ist = inner.init(params)
    ub1, ist = inner.update(g1, ist, params)
    ub2, ist = inner.update(g2, ist, params)

    st = tx.init(params)
    u1, st = tx.update(g1, st, params)
    np.testing.assert_array_equal(np.asarray(u1["w"]), np.asarray(ub1["w"]))
    for bad in (jnp.inf, -jnp.inf, jnp.nan):
        ub, stb = tx.update({"w": jnp.asarray([1.0, bad, 0.0, 0.0])}, st, params)
        assert float(jnp.abs(ub["w"]).sum()) == 0.0
        assert int(stb.notfinite_count) == int(st.notfinite_count) + 1
        st = stb
    u3, st = tx.update(g2, st, params)
    np.testing.assert_array_equal(np.asarray(u3["w"]), np.asarray(ub2["w"]))
    assert int(st.notfinite_count) == 3
