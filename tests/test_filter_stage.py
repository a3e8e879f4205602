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
