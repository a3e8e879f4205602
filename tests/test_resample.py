"""Banded-matmul Pallas resampling vs the XLA tent-conv reference
(interpret mode on CPU). Exact parity — same align_corners=False
semantics, fp32 math."""

import numpy as np

import jax
import jax.numpy as jnp

from tinyvc_tpu.dsp.interp import downsample_time_int_t, upsample_time_int_t
from tinyvc_tpu.ops.pallas.resample import (
    pallas_downsample_t,
    pallas_upsample_t,
)


def test_pallas_upsample_matches_tent_conv(rng):
    # the U-Net's factors plus the energy path's x64
    for f, T in [(5, 2560), (4, 1920), (3, 1111), (2, 640), (64, 750)]:
        x = jnp.asarray(rng.standard_normal((2, 8, T)).astype(np.float32))
        ref = upsample_time_int_t(x, f)
        got = pallas_upsample_t(x, f, t_blk=128 * f * 4, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got[:, :, : f * T]), np.asarray(ref), atol=1e-5,
            err_msg=f"factor {f}",
        )


def test_pallas_downsample_matches_decimation(rng):
    for f, T in [(5, 12800), (4, 1920), (3, 1113), (2, 640)]:
        x = jnp.asarray(rng.standard_normal((2, 8, T)).astype(np.float32))
        ref = downsample_time_int_t(x, f)
        got = pallas_downsample_t(x, f, t_blk=256, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got[:, :, : T // f]), np.asarray(ref), atol=1e-5,
            err_msg=f"factor {f}",
        )


def test_pallas_upsample_multi_tile_boundaries(rng):
    """Values must be continuous across tile boundaries (the streaming
    window carries the band margin)."""
    f, T = 4, 4096
    x = jnp.asarray(rng.standard_normal((1, 8, T)).astype(np.float32))
    small = pallas_upsample_t(x, f, t_blk=128 * f, interpret=True)
    big = pallas_upsample_t(x, f, t_blk=128 * f * 8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(small[:, :, : f * T]), np.asarray(big[:, :, : f * T]),
        atol=1e-6,
    )


def test_upsample_vjp_grad_matches_tent_conv(rng):
    """custom_vjp backward (transposed banded map + edge-clamp
    corrections) vs autodiff through the XLA tent conv — exact."""
    from tinyvc_tpu.ops.pallas.resample import upsample_vjp

    for f, T in [(2, 640), (3, 384), (4, 512), (5, 2560)]:
        x = jnp.asarray(rng.standard_normal((2, 8, T)).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((2, 8, f * T)).astype(np.float32)
        )

        def loss_vjp(xx):
            return jnp.sum(upsample_vjp(xx, f, 128 * f * 2, True, f * T) * w)

        def loss_ref(xx):
            return jnp.sum(upsample_time_int_t(xx, f, trim=True) * w)

        g_vjp = jax.grad(loss_vjp)(x)
        g_ref = jax.grad(loss_ref)(x)
        np.testing.assert_allclose(
            np.asarray(g_vjp), np.asarray(g_ref), atol=1e-4,
            err_msg=f"factor {f}",
        )


def test_downsample_vjp_grad_matches_decimation(rng):
    from tinyvc_tpu.ops.pallas.resample import downsample_vjp

    for f, T in [(2, 640), (3, 768), (4, 512), (5, 2560)]:
        x = jnp.asarray(rng.standard_normal((2, 8, T)).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((2, 8, T // f)).astype(np.float32)
        )

        def loss_vjp(xx):
            return jnp.sum(downsample_vjp(xx, f, 256, True, T // f) * w)

        def loss_ref(xx):
            return jnp.sum(downsample_time_int_t(xx, f)[:, :, : T // f] * w)

        g_vjp = jax.grad(loss_vjp)(x)
        g_ref = jax.grad(loss_ref)(x)
        np.testing.assert_allclose(
            np.asarray(g_vjp), np.asarray(g_ref), atol=1e-4,
            err_msg=f"factor {f}",
        )
