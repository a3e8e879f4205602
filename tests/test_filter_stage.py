"""Fused Upsample-chain kernel vs the flax Upsample module (interpret mode).

The kernel extends the utterance with edge-replicated halo input instead of
replicate-padding every intermediate, so only the outermost
receptive-field band (80 samples) at the sequence ends may deviate; the
interior must match tightly.
"""

import numpy as np

import jax
import jax.numpy as jnp

from tinyvc_tpu.models.decoder import Upsample
from tinyvc_tpu.ops.pallas.filter_stage import (
    fused_upsample_chain,
    upsample_params_to_tuple,
)
from tinyvc_tpu.dsp.interp import upsample_time_int


def test_fused_upsample_chain_matches_module(rng):
    B, T, C, Co, f = 2, 600, 24, 24, 4
    up = Upsample(Co, f)
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32) * 0.3)
    cond = jnp.asarray(
        rng.standard_normal((B, T * f, C)).astype(np.float32) * 0.3
    )
    params = up.init(jax.random.PRNGKey(0), x, cond)
    ref = np.asarray(up.apply(params, x, cond))

    xu = upsample_time_int(x, f)
    w = upsample_params_to_tuple(params["params"])
    out = np.asarray(
        fused_upsample_chain(
            xu, cond, *w, dtype_name="float32", t_blk=512, interpret=True
        )
    )
    assert out.shape == ref.shape
    # interior exact (crop the edge receptive-field band)
    crop = 128
    np.testing.assert_allclose(
        out[:, crop:-crop], ref[:, crop:-crop], atol=2e-4, rtol=1e-3
    )
    # edges bounded
    assert np.abs(out - ref).max() < 0.3 * max(np.abs(ref).max(), 1.0)


def test_fused_upsample_chain_bf16(rng):
    """Serving-profile tiles: bf16 compute tracks the fp32 module within
    bf16 rounding (the mel-level bound is enforced by the mixed-precision
    pipeline tests)."""
    B, T, C, Co, f = 1, 720, 24, 24, 4
    up = Upsample(Co, f)
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32) * 0.3)
    cond = jnp.asarray(
        rng.standard_normal((B, T * f, C)).astype(np.float32) * 0.3
    )
    params = up.init(jax.random.PRNGKey(0), x, cond)
    ref = np.asarray(up.apply(params, x, cond))

    xu = upsample_time_int(x, f)
    w = upsample_params_to_tuple(params["params"])
    out = np.asarray(
        fused_upsample_chain(
            xu, cond, *w, dtype_name="bfloat16", t_blk=512, interpret=True
        )
    )
    crop = 128
    err = np.abs(out[:, crop:-crop] - ref[:, crop:-crop]).max()
    scale = np.abs(ref).max()
    assert err < 0.05 * scale, (err, scale)


def test_fused_downsample_chain_matches_module(rng):
    """Down-path kernel (decimation outside, conv chain inside) vs the flax
    Downsample module; interior exact, 14-sample edge band bounded."""
    from tinyvc_tpu.dsp.interp import downsample_time_int_t
    from tinyvc_tpu.models.decoder import Downsample
    from tinyvc_tpu.ops.pallas.filter_stage import (
        downsample_params_to_tuple,
        fused_downsample_chain_t,
    )

    B, T, Co, f = 2, 4000, 48, 5
    down = Downsample(Co, f)
    x = jnp.asarray(rng.standard_normal((B, T, 24)).astype(np.float32) * 0.3)
    params = down.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(down.apply(params, x))  # [B, T/f, Co]

    z_t = downsample_time_int_t(jnp.swapaxes(x, 1, 2), f)
    w = downsample_params_to_tuple(params["params"])
    out = np.asarray(
        jnp.swapaxes(
            fused_downsample_chain_t(
                z_t, *w, dtype_name="float32", t_blk=256, interpret=True
            ),
            1, 2,
        )
    )
    assert out.shape == ref.shape
    crop = 16
    np.testing.assert_allclose(
        out[:, crop:-crop], ref[:, crop:-crop], atol=2e-4, rtol=1e-3
    )
    assert np.abs(out - ref).max() < 0.3 * max(np.abs(ref).max(), 1.0)


def test_fused_stem_conv_matches_module(rng):
    """The stem k=3 conv kernel is exact everywhere: a single conv's
    replicate padding IS the kernel's edge-replicated halo."""
    from tinyvc_tpu.models.layers import Conv1d
    from tinyvc_tpu.ops.pallas.filter_stage import (
        _conv_weights_t,
        fused_conv3_t,
    )

    B, T = 2, 2000
    conv = Conv1d(24, 3)
    x = jnp.asarray(rng.standard_normal((B, T, 17)).astype(np.float32) * 0.3)
    params = conv.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(conv.apply(params, x))

    w, b = _conv_weights_t(params["params"])
    out = np.asarray(
        jnp.swapaxes(
            fused_conv3_t(
                jnp.swapaxes(x, 1, 2), w, b,
                dtype_name="float32", t_blk=256, interpret=True,
            ),
            1, 2,
        )
    )
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_filternet_fused_apply_matches_module(rng):
    """The functional serving path (fused Pallas Upsample stages, interpret
    mode here) tracks the flax FilterNet on the interior; sequence edges use
    edge-replicated halos and may deviate slightly (documented)."""
    from tinyvc_tpu.config import DecoderConfig
    from tinyvc_tpu.models.decoder import FilterNet
    from tinyvc_tpu.ops.fused_filternet import filternet_fused_apply

    cfg = DecoderConfig(
        source_channels=16,
        filter_channels=(48, 32, 24, 16, 8),
        content_channels=32,
    )
    net = FilterNet(cfg)
    B, F = 1, 24
    hop = 480
    L = F * hop
    content = jnp.asarray(rng.standard_normal((B, F, 32)).astype(np.float32) * 0.3)
    f0 = jnp.asarray(
        (np.abs(rng.standard_normal((B, F))) * 200 + 50).astype(np.float32)
    )
    energy = jnp.asarray(np.abs(rng.standard_normal((B, L))).astype(np.float32) * 0.1)
    source = jnp.asarray(
        rng.standard_normal((B, L, cfg.num_harmonics + 2)).astype(np.float32) * 0.3
    )
    params = net.init(jax.random.PRNGKey(0), content, f0, energy, source)
    ref = np.asarray(net.apply(params, content, f0, energy, source))

    out = np.asarray(
        filternet_fused_apply(
            params["params"], cfg, content, f0, energy, source, interpret=True
        )
    )
    assert out.shape == ref.shape
    crop = 2400  # edge band: replicated-input halos accumulate up the chain
    interior_err = np.abs(out[:, crop:-crop] - ref[:, crop:-crop]).max()
    scale = np.abs(ref).max()
    assert interior_err < 1e-3 * max(scale, 1.0), (interior_err, scale)
    # edges bounded
    assert np.abs(out - ref).max() < 0.5 * max(scale, 1.0)

    # the production entry passes the source channels-first ([B, H+2, L],
    # avoiding the lane-padded [B, L, 16] layout) — identical result
    out_cf = np.asarray(
        filternet_fused_apply(
            params["params"], cfg, content, f0, energy,
            jnp.swapaxes(source, 1, 2), interpret=True,
            source_channels_first=True,
        )
    )
    np.testing.assert_allclose(out_cf, out, atol=1e-6, rtol=1e-6)
