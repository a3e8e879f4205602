"""Discriminator parity vs the reference (weight transfer) + loss parity."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from module.tinyvc import Discriminator as RefDiscriminator

from tinyvc_tpu.config import DiscriminatorConfig
from tinyvc_tpu.models.discriminator import Discriminator
from tinyvc_tpu.train.losses import (
    discriminator_adversarial_loss,
    feature_matching_loss,
    generator_adversarial_loss,
    multi_scale_stft_loss,
)
from tinyvc_tpu.utils.torch_compat_disc import discriminator_params_from_torch


@pytest.mark.slow
def test_discriminator_forward_parity(rng):
    torch.manual_seed(5)
    ref = RefDiscriminator().eval()
    x = (rng.standard_normal((2, 8000)) * 0.3).astype(np.float32)
    with torch.no_grad():
        ref_logits, ref_feats = ref(torch.from_numpy(x))

    params = {"params": discriminator_params_from_torch(ref.state_dict())}
    ours_logits, ours_feats = Discriminator(DiscriminatorConfig()).apply(
        params, jnp.asarray(x)
    )

    assert len(ours_logits) == len(ref_logits) == 10
    assert len(ours_feats) == len(ref_feats)
    # both are NCHW ([B, c, t, p] / [B, c, bins, frames]) — direct compare
    for i in range(10):
        ref_l = ref_logits[i].numpy()
        np.testing.assert_allclose(
            np.asarray(ours_logits[i]), ref_l, atol=3e-3, rtol=1e-2
        )

    # the kept-as-option MRD 'unfold' lowering must stay exact too
    import dataclasses

    unf_logits, unf_feats = Discriminator(
        dataclasses.replace(DiscriminatorConfig(), mrd_conv_impl="unfold")
    ).apply(params, jnp.asarray(x))
    for a, b in zip(unf_logits, ours_logits):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    for a, b in zip(unf_feats, ours_feats):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    # 'hybrid' (NCHW stem + NHWC deep layers) must match 'lax' numerically;
    # its deep-layer maps come out NHWC (layout is internal — every consumer
    # is an elementwise reduction), so normalise layout before comparing.
    hyb_logits, hyb_feats = Discriminator(
        dataclasses.replace(DiscriminatorConfig(), mrd_conv_impl="hybrid")
    ).apply(params, jnp.asarray(x))

    def as_nchw(got, want):
        got = np.asarray(got)
        if got.shape != want.shape:  # NHWC-emitted deep-layer map
            got = got.transpose(0, 3, 1, 2)
        assert got.shape == want.shape
        return got

    for a, b in zip(hyb_logits, ours_logits):
        np.testing.assert_allclose(
            as_nchw(a, np.asarray(b)), np.asarray(b), atol=2e-5
        )
    for a, b in zip(hyb_feats, ours_feats):
        np.testing.assert_allclose(
            as_nchw(a, np.asarray(b)), np.asarray(b), atol=2e-5
        )


@pytest.mark.slow
def test_mrd_xres_lowering_matches_lax(rng):
    """'xres' (cross-resolution canvas batching, one vmapped conv per MRD
    layer) must equal 'lax' exactly — incl. the masked invalid regions and
    both quirk modes (VERDICT r3 item 7)."""
    import dataclasses

    import jax

    torch.manual_seed(6)
    ref = RefDiscriminator().eval()
    params = {"params": discriminator_params_from_torch(ref.state_dict())}
    x = jnp.asarray((rng.standard_normal((2, 8000)) * 0.3).astype(np.float32))

    for fixed in (False, True):
        base = dataclasses.replace(
            DiscriminatorConfig(), mrd_fixed_activation=fixed
        )
        lax_logits, lax_feats = Discriminator(base).apply(params, x)
        xres_cfg = dataclasses.replace(base, mrd_conv_impl="xres")
        xres_logits, xres_feats = Discriminator(xres_cfg).apply(params, x)
        assert len(xres_logits) == len(lax_logits)
        assert len(xres_feats) == len(lax_feats)
        for a, b in zip(xres_logits, lax_logits):
            assert a.shape == b.shape
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
        for a, b in zip(xres_feats, lax_feats):
            assert a.shape == b.shape
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    # the param tree is impl-invariant: init under 'xres' == init under 'lax'
    k = jax.random.PRNGKey(0)
    p_lax = Discriminator(DiscriminatorConfig()).init(k, x[:1, :4000])
    p_xres = Discriminator(
        dataclasses.replace(DiscriminatorConfig(), mrd_conv_impl="xres")
    ).init(k, x[:1, :4000])
    assert jax.tree_util.tree_structure(p_lax) == jax.tree_util.tree_structure(
        p_xres
    )


def test_lsgan_and_feature_losses(rng):
    # oracle: the inlined loss code in train_decoder.py:113-149
    logits = [rng.standard_normal((2, 5, 3, 1)).astype(np.float32) for _ in range(4)]
    t = [torch.from_numpy(l) for l in logits]
    ref_g = sum((x**2).mean() / len(t) for x in t)
    ours_g = generator_adversarial_loss([jnp.asarray(l) for l in logits])
    np.testing.assert_allclose(float(ours_g), float(ref_g), rtol=1e-5)

    fake = [rng.standard_normal((2, 5, 3, 1)).astype(np.float32) for _ in range(4)]
    tf_ = [torch.from_numpy(l) for l in fake]
    ref_d = sum((x**2).mean() / len(t) for x in t) + sum(
        ((x - 1) ** 2).mean() / len(tf_) for x in tf_
    )
    ours_d = discriminator_adversarial_loss(
        [jnp.asarray(l) for l in logits], [jnp.asarray(l) for l in fake]
    )
    np.testing.assert_allclose(float(ours_d), float(ref_d), rtol=1e-5)

    ref_feat = sum(
        (a - b).abs().mean() / len(t) for a, b in zip(t, tf_)
    )
    ours_feat = feature_matching_loss(
        [jnp.asarray(l) for l in logits], [jnp.asarray(l) for l in fake]
    )
    np.testing.assert_allclose(float(ours_feat), float(ref_feat), rtol=1e-5)


def test_multi_scale_stft_loss_parity(rng):
    # oracle: module/utils/loss.py:11-38
    x = (rng.standard_normal((2, 4800)) * 0.3).astype(np.float32)
    y = (rng.standard_normal((2, 4800)) * 0.3).astype(np.float32)
    xt, yt = torch.from_numpy(x), torch.from_numpy(y)
    ref = 0.0
    scales = [16, 32, 64, 128, 256, 512]
    for s in scales:
        w = torch.hann_window(s * 4)
        xs = torch.stft(xt, s * 4, s, window=w, return_complex=True).abs()
        ys = torch.stft(yt, s * 4, s, window=w, return_complex=True).abs()
        ref += ((xs - ys) ** 2).mean() + (
            torch.log(xs + 1e-6) - torch.log(ys + 1e-6)
        ).abs().mean()
    ref = ref / len(scales)
    ours = multi_scale_stft_loss(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-3)

    # the TPU training path's windowed-DFT-matmul magnitude: exact in fp32,
    # within ~1% in its production bf16 mode
    exact = multi_scale_stft_loss(jnp.asarray(x), jnp.asarray(y), impl="rfft")
    from tinyvc_tpu.dsp.stft import stft_magnitude_matmul

    loss_mm = 0.0
    for s in scales:
        xs = stft_magnitude_matmul(jnp.asarray(x), s * 4, s, dtype=jnp.float32)
        ys = stft_magnitude_matmul(jnp.asarray(y), s * 4, s, dtype=jnp.float32)
        loss_mm += float(
            ((xs - ys) ** 2).mean()
            + abs(jnp.log(xs + 1e-6) - jnp.log(ys + 1e-6)).mean()
        )
    np.testing.assert_allclose(loss_mm / len(scales), float(exact), rtol=1e-4)
    bf16 = multi_scale_stft_loss(jnp.asarray(x), jnp.asarray(y), impl="matmul")
    np.testing.assert_allclose(float(bf16), float(exact), rtol=2e-2)
