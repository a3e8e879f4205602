"""Fused (phase-plane Pallas) MRD: parity, gradients, losses, train step.

Validation ladder:
1. plane-major XLA chain (`ops/mrd_planes.py`) vs the lax DiscriminatorR —
   validates every piece of static bookkeeping (tap tables, masks, packing)
2. Pallas kernels (interpret mode) vs the plane-major XLA chain — forward
   AND custom_vjp backward (dspec/dW/db)
3. fused Discriminator + valid-count losses vs the lax Discriminator with
   the SAME params (trees are interchangeable by construction)
4. post-join GAN train-step gradients: fused MRD vs lax MRD
"""

import pytest

pytestmark = pytest.mark.slow  # long tier; quick tier: -m "not slow"

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tinyvc_tpu.config import DiscriminatorConfig
from tinyvc_tpu.dsp.stft import stft_magnitude
from tinyvc_tpu.models.discriminator import (
    Discriminator,
    DiscriminatorR,
    fused_mrd_valid_counts,
)
from tinyvc_tpu.ops.mrd_planes import (
    make_plan,
    mrd_chain_xla,
    pack_spec_planes,
    unpack_planes,
)
from tinyvc_tpu.ops.pallas.mrd import mrd_chain
from tinyvc_tpu.train.losses import (
    discriminator_adversarial_loss,
    feature_matching_loss,
    generator_adversarial_loss,
)

T = 8000


def _rand_chain(plan, rng):
    ws, bs = [], []
    for lp in plan.layers:
        ws.append(
            jnp.asarray(
                rng.standard_normal((lp.kh, lp.kw, lp.cin, lp.cout)).astype(
                    np.float32
                )
                * 0.1
            )
        )
        bs.append(
            jnp.asarray(
                rng.standard_normal((lp.cout,)).astype(np.float32) * 0.1
            )
        )
    return tuple(ws), tuple(bs)


def _spec_pm(x, res, plan):
    spec = jnp.swapaxes(
        stft_magnitude(x, res * 4, res, drop_first=False), 1, 2
    )
    return pack_spec_planes(spec, plan)


@pytest.mark.parametrize("res", [32, 64, 128, 256])
def test_plane_chain_matches_lax_discriminator(rng, res):
    x = jnp.asarray((rng.standard_normal((2, T)) * 0.3).astype(np.float32))
    mod = DiscriminatorR(res)
    params = mod.init(jax.random.PRNGKey(res), x)
    _, fmaps = mod.apply(params, x)

    plan = make_plan(res, T)
    p = params["params"]
    names = [f"conv_{i}" for i in range(5)] + ["post"]
    ws, bs = [], []
    for n in names:
        v, g, b = p[n]["v"], p[n]["g"], p[n]["bias"]
        norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2), keepdims=True) + 1e-12)
        ws.append(v / norm * g)
        bs.append(b)
    outs = mrd_chain_xla(_spec_pm(x, res, plan), ws, bs, plan)
    for li, (ref, got_pm) in enumerate(zip(fmaps, outs)):
        got = unpack_planes(got_pm, plan, li)
        scale = float(jnp.max(jnp.abs(ref))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5 * scale
        )


def test_pallas_kernel_matches_plane_chain(rng):
    x = jnp.asarray((rng.standard_normal((2, T)) * 0.3).astype(np.float32))
    for res in (32, 256):
        plan = make_plan(res, T)
        ws, bs = _rand_chain(plan, rng)
        spec_pm = _spec_pm(x, res, plan)
        ref = mrd_chain_xla(spec_pm, ws, bs, plan)
        got = mrd_chain(spec_pm, ws, bs, plan, "float32", True)
        for r, g in zip(ref, got):
            scale = float(jnp.max(jnp.abs(r))) + 1e-9
            np.testing.assert_allclose(
                np.asarray(g.reshape(r.shape)), np.asarray(r),
                atol=2e-5 * scale,
            )


def test_pallas_kernel_gradients_match_autodiff(rng):
    x = jnp.asarray((rng.standard_normal((2, T)) * 0.3).astype(np.float32))
    res = 64
    plan = make_plan(res, T)
    ws, bs = _rand_chain(plan, rng)
    spec_pm = _spec_pm(x, res, plan)

    def loss(impl):
        def f(spec_pm, ws, bs):
            outs = (
                mrd_chain_xla(spec_pm, list(ws), list(bs), plan)
                if impl == "xla"
                else mrd_chain(spec_pm, ws, bs, plan, "float32", True)
            )
            return sum(
                (o.astype(jnp.float32) ** 2).sum() * (0.1 * (i + 1))
                for i, o in enumerate(outs)
            )

        return f

    gr = jax.grad(loss("xla"), argnums=(0, 1, 2))(spec_pm, ws, bs)
    gk = jax.grad(loss("pallas"), argnums=(0, 1, 2))(spec_pm, ws, bs)
    for a, b in [(gr[0], gk[0])] + list(zip(gr[1], gk[1])) + list(
        zip(gr[2], gk[2])
    ):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-5 * scale
        )


def test_bf16_kernel_gradient_fidelity(rng):
    """The production kernels run bf16 MXU inputs (fp32 accumulation).
    Bound the gradient error vs the fp32 chain: cosine similarity of every
    dW/db and of dspec must stay high (the same bound style as
    tests/test_mixed_precision.py for the bf16 discriminator)."""
    x = jnp.asarray((rng.standard_normal((2, T)) * 0.3).astype(np.float32))
    res = 64
    plan = make_plan(res, T)
    ws, bs = _rand_chain(plan, rng)
    spec_pm = _spec_pm(x, res, plan)

    def loss(dtype_name):
        def f(spec_pm, ws, bs):
            outs = mrd_chain(spec_pm, ws, bs, plan, dtype_name, True)
            return sum(
                (o.astype(jnp.float32) ** 2).sum() * (0.1 * (i + 1))
                for i, o in enumerate(outs)
            )

        return f

    g32 = jax.grad(loss("float32"), argnums=(0, 1, 2))(spec_pm, ws, bs)
    g16 = jax.grad(loss("bfloat16"), argnums=(0, 1, 2))(spec_pm, ws, bs)
    for a, b in zip(jax.tree.leaves(g32), jax.tree.leaves(g16)):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)
        assert cos > 0.995, cos


def test_fused_discriminator_losses_match_lax(rng):
    x = jnp.asarray((rng.standard_normal((2, T)) * 0.3).astype(np.float32))
    y = jnp.asarray((rng.standard_normal((2, T)) * 0.3).astype(np.float32))
    lax_d = Discriminator(DiscriminatorConfig())
    params = lax_d.init(jax.random.PRNGKey(0), x)
    fus_d = Discriminator(
        dataclasses.replace(DiscriminatorConfig(), mrd_conv_impl="fused")
    )
    # identical param trees: fused params ARE lax params
    lr, fr = lax_d.apply(params, x)
    lf, ff = lax_d.apply(params, y)
    frl, frf = fus_d.apply(params, x)
    ffl, fff = fus_d.apply(params, y)
    lc, fc = fused_mrd_valid_counts(fus_d.cfg, T)

    np.testing.assert_allclose(
        float(generator_adversarial_loss(ffl, lc)),
        float(generator_adversarial_loss(lf)),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        float(discriminator_adversarial_loss(frl, ffl, lc)),
        float(discriminator_adversarial_loss(lr, lf)),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        float(feature_matching_loss(frf, fff, fc)),
        float(feature_matching_loss(fr, ff)),
        rtol=1e-4,
    )


def test_gan_step_gradients_fused_vs_lax():
    """One post-join step from identical states: the fused-MRD step must
    move the parameters (generator AND discriminator) the same way the
    lax step does."""
    from tests.test_training import small_config
    from tinyvc_tpu.train import decoder_train, encoder_train

    cfg = small_config()
    key = jax.random.PRNGKey(0)
    _, enc_state = encoder_train.init_state(cfg, key)
    state = decoder_train.init_state(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(3)
    wave = jnp.asarray(
        (rng.standard_normal((2, cfg.train.chunk_length)) * 0.1).astype(
            np.float32
        )
    )
    fcfg = dataclasses.replace(
        cfg,
        discriminator=dataclasses.replace(
            cfg.discriminator, mrd_conv_impl="fused"
        ),
    )
    step_lax = decoder_train.make_train_step(cfg, d_join=True)
    step_fus = decoder_train.make_train_step(fcfg, d_join=True)
    s1, m1 = step_lax(state, enc_state.params, wave, jax.random.PRNGKey(7))
    s2, m2 = step_fus(state, enc_state.params, wave, jax.random.PRNGKey(7))
    np.testing.assert_allclose(
        float(m2["loss_g"]), float(m1["loss_g"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(m2["loss_d"]), float(m1["loss_d"]), rtol=2e-4
    )
    for a, b in zip(
        jax.tree.leaves(s1.gen_params), jax.tree.leaves(s2.gen_params)
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-5
        )
    for a, b in zip(
        jax.tree.leaves(s1.disc_params), jax.tree.leaves(s2.disc_params)
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-5
        )
