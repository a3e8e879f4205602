"""Functional FilterNet forward with fused Pallas Upsample stages.

The serving-path counterpart of `models/decoder.py::FilterNet` (reference
`module/tinyvc/decoder.py:193-233`): identical parameter tree (weights are
read straight out of the flax params dict), identical math on the down
path, and the five Upsample conv chains executed by the VMEM-resident
Pallas kernel (`ops/pallas/filter_stage.py`) instead of ~12 XLA HBM passes
per stage.

Kept functional (outside flax) on purpose: flax owns parameters and the
strict/training path; serving binds the same weights to the fused kernel.
Parity vs the module is enforced by tests/test_filter_stage.py.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from ..config import DecoderConfig
from ..dsp.interp import downsample_time_int, upsample_time_int_t
from ..models.layers import replicate_pad_time
from .pallas.filter_stage import fused_upsample_chain_t, upsample_params_to_tuple


def _dense(x, p, dt):
    return (
        jnp.dot(x.astype(dt), p["kernel"].astype(dt)).astype(jnp.float32)
        + p["bias"]
    ).astype(dt)


def _conv1d(x, p, dilation, dt):
    """Unfold conv with replicate padding (mirrors models/layers.py Conv1d
    impl='unfold')."""
    kernel, bias = p["kernel"], p["bias"]
    k = kernel.shape[0]
    d = dilation
    pad = (k * d - d) // 2
    T = x.shape[-2]
    xp = replicate_pad_time(x.astype(dt), pad, pad)
    xu = jnp.concatenate([xp[:, i * d : i * d + T, :] for i in range(k)], axis=-1)
    w = kernel.reshape(k * kernel.shape[1], kernel.shape[2]).astype(dt)
    y = jnp.einsum("btc,cf->btf", xu, w, preferred_element_type=jnp.float32)
    return (y + bias).astype(dt)


def _lrelu(x):
    return jnp.where(x > 0, x, 0.1 * x)


def _downsample(x, p, factor, dt):
    """Downsample block (models/decoder.py::Downsample)."""
    x = downsample_time_int(x, factor)
    res = _dense(x, p["down_res"], dt)
    x = _lrelu(x)
    x = _conv1d(x, p["c1"], 1, dt)
    x = _lrelu(x)
    x = _conv1d(x, p["c2"], 2, dt)
    x = _lrelu(x)
    x = _conv1d(x, p["c3"], 4, dt)
    return x + res


def _t_blk_for(c: int, T: int, dtype_name: str) -> int:
    """VMEM-fitting tile length per stage: channels-first work buffers are
    [~4C, W], so shrink the time tile as C grows (and again for fp32
    tiles, which double every buffer). Tiles stay 128-aligned."""
    # scoped VMEM ~ 56*C*(t+2*HALO) bytes across the chain's live values
    # (films 4C + taps 3C + ~6 C-wide + DMA slots); 4096*24 keeps every
    # stage below the 16 MB limit with margin (C=384 -> t=256).
    budget = 4096 if dtype_name == "bfloat16" else 2048
    t = max(128, (budget * 24 // c) // 128 * 128)
    return max(128, min(t, -(-T // 128) * 128))  # cap: one tile covers T


def _log_f0_feature(f0):
    return jnp.log(jnp.maximum(f0, 0.0) + 1e-6)[..., None]


def filternet_fused_apply(
    fn_params: Dict[str, Any],
    cfg: DecoderConfig,
    content: jnp.ndarray,
    f0: jnp.ndarray,
    energy: jnp.ndarray,
    source: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """fn_params: the ``filter_net`` subtree of the decoder's flax params.
    content [B,F,768], f0 [B,F], energy [B,L], source [B,L,H+2] -> [B,L]."""
    channels = list(cfg.filter_channels)
    factors = list(cfg.filter_factors)
    dt = jnp.dtype(cfg.compute_dtype)

    x = _dense(content, fn_params["content_in"], dt) + _dense(
        _log_f0_feature(f0), fn_params["f0_in"], dt
    )

    src = jnp.concatenate([source.astype(dt), energy[..., None].astype(dt)], axis=-1)

    skips = []
    src = _conv1d(src, fn_params["down_0"], 1, dt)
    skips.append(src)
    cs = list(reversed(channels[1:]))
    ns = cs[1:] + [channels[0]]
    fs = list(reversed(factors[1:]))
    for i, (n, f) in enumerate(zip(ns, fs)):
        src = _downsample(src, fn_params[f"down_{i + 1}"], f, dt)
        skips.append(src)

    # up path runs channels-first end-to-end: one transpose in (frame rate,
    # cheap), per-stage interpolation along the last axis, one transpose out
    ns_up = channels[1:] + [channels[-1]]
    x_t = jnp.swapaxes(x, 1, 2)  # [B, C0, F]
    for i, (n, f) in enumerate(zip(ns_up, factors)):
        cond_t = jnp.swapaxes(skips[len(skips) - 1 - i], 1, 2)
        c_in = x_t.shape[1]
        xu_t = upsample_time_int_t(x_t, f)
        w = upsample_params_to_tuple(fn_params[f"up_{i}"])
        x_t = fused_upsample_chain_t(
            xu_t, cond_t, *w,
            dtype_name=cfg.compute_dtype,
            t_blk=_t_blk_for(c_in, xu_t.shape[2], cfg.compute_dtype),
            interpret=interpret,
        ).astype(dt)
    x = jnp.swapaxes(x_t, 1, 2)  # [B, L, 24]

    out = _conv1d(x.astype(jnp.float32), fn_params["output_layer"], 1, jnp.float32)
    return out[..., 0].astype(jnp.float32)
