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
from ..dsp.interp import downsample_time_int_t, upsample_time_int_t  # noqa: F401
from .pallas.filter_stage import (
    _conv_weights_t,
    down_chain_vjp,
    downsample_params_to_tuple,
    fused_conv3_t,
    fused_downsample_chain_t,
    fused_upsample_chain_t,
    stem_conv_vjp,
    up_chain_vjp,
    upsample_params_to_tuple,
)


def _dense(x, p, dt):
    return (
        jnp.dot(x.astype(dt), p["kernel"].astype(dt)).astype(jnp.float32)
        + p["bias"]
    ).astype(dt)


def _t_blk_for(c: int, T: int, dtype_name: str) -> int:
    """VMEM-fitting tile length per stage: channels-first work buffers are
    [~4C, W], so shrink the time tile as C grows (and again for fp32
    tiles, which double every buffer). Tiles stay 128-aligned.

    Among the VMEM-fitting sizes, prefer one that DIVIDES T: with zero
    alignment overhang the wrappers' crop slices and the pad's overhang
    columns vanish (XLA elides the identity slice) — measured ~1-2 ms of
    pure copies at serving shapes otherwise."""
    # scoped VMEM ~ 56*C*(t+2*HALO) bytes across the chain's live values
    # (films 4C + taps 3C + ~6 C-wide + DMA slots); 4096*24 keeps every
    # stage below the 16 MB limit with margin (C=384 -> t=256).
    budget = 4096 if dtype_name == "bfloat16" else 2048
    t = max(128, (budget * 24 // c) // 128 * 128)
    cover = -(-T // 128) * 128  # one tile covers T
    if cover <= t:
        return max(128, cover)
    best = t
    for cand in range(t, 127, -128):
        if T % cand == 0:
            if cand * 2 > t:  # don't shrink tiles below half the budget
                best = cand
            break
    return max(128, best)


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
    source_channels_first: bool = False,
    differentiable: bool = False,
    dtype_name: str | None = None,
    source_prepacked: bool = False,
    n_prepacked_src: int = 16,
    kernel_min_len: int = 0,
) -> jnp.ndarray:
    """fn_params: the ``filter_net`` subtree of the decoder's flax params.
    content [B,F,768], f0 [B,F], energy [B,L], source [B,L,H+2]
    (or [B,H+2,L] with ``source_channels_first`` — the production serving
    layout; see `decode_infer`) -> [B,L].

    ``differentiable`` routes every stage through its custom_vjp entry
    (Pallas forward AND backward kernels) so the GAN training step can
    backprop through the fused U-Net; serving leaves it off (no residual
    bookkeeping).

    ``dtype_name`` overrides the MXU input dtype (training passes
    'bfloat16' even under the fp32 profile — XLA's own fp32 matmuls demote
    operands to bf16 under ``--xla_allow_excess_precision``, so this
    matches the baseline's effective precision at kernel speed).

    ``kernel_min_len``: stages whose time axis is shorter than this run the
    channels-first flax math instead of the Pallas chain kernels. The
    frame-rate stages are a rounding error of the runtime, and at SMALL
    batch x short-T shapes (batch-native chunked conversion, B ~ 6 chunk
    rows) XLA "helpfully" VMEM-places the chain kernel's whole ANY-space
    operands — 13.6 MB at the C=384 stage — and then blows the 16 MB
    scoped-vmem budget on the output (measured: remote-compile OOM at
    [6, 192, 1280]; serving's B=16 operands exceed VMEM and stay in HBM,
    which is why the whole-utterance path never hit it). 8192 keeps every
    waveform-rate stage (where the kernels' ~2x lives) on the kernels."""
    channels = list(cfg.filter_channels)
    factors = list(cfg.filter_factors)
    dt = jnp.dtype(cfg.compute_dtype)

    x = _dense(content, fn_params["content_in"], dt) + _dense(
        _log_f0_feature(f0), fn_params["f0_in"], dt
    )

    # everything below frame rate runs channels-first; no waveform-rate
    # transposes when the source arrives channels-first (production), none
    # out (the folded output conv emits [B, 1, L]). The stem's 17 channels
    # are zero-padded to the Mosaic sublane granule inside the same concat
    # that appends energy (fused_conv3_t pads the weight columns to match).
    B, L = energy.shape
    if source_prepacked:
        # the DSP stage already appended (energy | zero-pad rows) — see
        # Decoder.dsp(pack_energy=...): the [B, 24, L] packing pass here
        # (1.95 ms at serving shapes) disappears entirely
        assert source_channels_first and source.shape[1] % 8 == 0
        n_src = n_prepacked_src
        src_t = source.astype(dt)
    elif source_channels_first:
        n_src = source.shape[1]
        npad = (-(n_src + 1)) % 8
        src_t = jnp.concatenate(
            [
                source.astype(dt),
                energy[:, None, :].astype(dt),
                jnp.zeros((B, npad, L), dt),
            ],
            axis=1,
        )  # [B, H+2+pad, L]
    else:
        n_src = source.shape[-1]
        npad = (-(n_src + 1)) % 8
        src_t = jnp.swapaxes(
            jnp.concatenate(
                [
                    source.astype(dt),
                    energy[..., None].astype(dt),
                    jnp.zeros((B, L, npad), dt),
                ],
                axis=-1,
            ),
            1, 2,
        )  # [B, H+2+pad, L]

    dname = dtype_name or cfg.compute_dtype

    # Differentiable mode: the backward kernels hold forward weights AND
    # their transposes AND gradient accumulators in VMEM — at the deep
    # stages (C=192/384, frame-rate time lengths) that exceeds the 16 MB
    # budget, and those stages are a rounding error of the runtime anyway.
    # Route a stage through the kernels only when its time axis is long and
    # its channel count small; otherwise fall back to the channels-first
    # flax math (XLA-differentiable, same params).
    def _diff_kernel_ok(c_in: int, T: int) -> bool:
        return T >= 1024 and c_in <= 96

    skips_t = []
    w0, b0 = _conv_weights_t(fn_params["down_0"])
    stem_blk = _t_blk_for(channels[-1], L, dname)
    if differentiable:
        src_t = stem_conv_vjp(
            dname, stem_blk, interpret, n_src + 1, src_t, w0, b0
        )
    else:
        src_t = fused_conv3_t(
            src_t, w0, b0, dtype_name=dname, t_blk=stem_blk,
            interpret=interpret, w_cin=n_src + 1,
        )
    skips_t.append(src_t)
    cs = list(reversed(channels[1:]))
    ns = cs[1:] + [channels[0]]
    fs = list(reversed(factors[1:]))
    cur_len = L
    for i, (n, f) in enumerate(zip(ns, fs)):
        cur_len //= f
        w = downsample_params_to_tuple(fn_params[f"down_{i + 1}"])
        blk = _t_blk_for(max(src_t.shape[1], n), cur_len, dname)
        if differentiable:
            if cur_len * f >= 8192:
                from .pallas.resample import downsample_vjp

                z_t = downsample_vjp(
                    src_t, f, 2560, interpret, cur_len
                )
            else:
                z_t = downsample_time_int_t(src_t, f)
            if not _diff_kernel_ok(max(z_t.shape[1], n), cur_len):
                from ..models.decoder import Downsample as _Down

                src_t = _Down(
                    n, 1, dtype=dt, conv_impl=cfg.conv_impl,
                    channels_first=True,
                ).apply({"params": fn_params[f"down_{i + 1}"]}, z_t)
            else:
                src_t = down_chain_vjp(dname, blk, interpret, z_t, *w)
        else:
            # untrimmed decimation: the crop slice is a full-array copy,
            # and the kernel reads only [0, cur_len) windows anyway. At
            # waveform rates the banded-matmul Pallas kernel replaces the
            # XLA grouped conv (whose channels-minor layout costs
            # full-array transpose copies; ops/pallas/resample.py)
            if cur_len >= 8192:
                from .pallas.resample import pallas_downsample_t

                z_t = pallas_downsample_t(
                    src_t[:, :, : cur_len * f], f, interpret=interpret
                )
            else:
                z_t = downsample_time_int_t(src_t[:, :, : cur_len * f], f,
                                            trim=False)
            if cur_len < kernel_min_len:
                from ..models.decoder import Downsample as _Down

                src_t = _Down(
                    n, 1, dtype=dt, conv_impl=cfg.conv_impl,
                    channels_first=True,
                ).apply(
                    {"params": fn_params[f"down_{i + 1}"]},
                    z_t[:, :, :cur_len],
                ).astype(dt)
            else:
                src_t = fused_downsample_chain_t(
                    z_t, *w, dtype_name=dname, t_blk=blk, interpret=interpret,
                    out_len=cur_len,
                )
        skips_t.append(src_t)

    # up path; the last stage folds the model's k=7 fp32 output conv into
    # its c5 (w_out @ w5 — see filter_stage._chain), so the [B, L, 24] c5
    # activation and the [B, L, 7*24] output-conv unfold never reach HBM
    ns_up = channels[1:] + [channels[-1]]
    x_t = jnp.swapaxes(x, 1, 2)  # [B, C0, F]
    n_up = len(factors)
    for i, (n, f) in enumerate(zip(ns_up, factors)):
        cond_t = skips_t[len(skips_t) - 1 - i]
        c_in = x_t.shape[1]
        # serving: untrimmed tent-conv output; the chain kernel reads only
        # [0, cond_len) windows, so the crop copy never materialises. At
        # waveform rates, Pallas banded-matmul upsampling (see the down
        # path note)
        if not differentiable and cond_t.shape[2] >= 8192:
            from .pallas.resample import pallas_upsample_t

            xu_t = pallas_upsample_t(x_t, f, interpret=interpret)
        elif differentiable and cond_t.shape[2] >= 8192:
            from .pallas.resample import upsample_vjp

            xu_t = upsample_vjp(
                x_t, f, 128 * f * 4, interpret, cond_t.shape[2]
            )
        else:
            xu_t = upsample_time_int_t(x_t, f, trim=differentiable)
        w = upsample_params_to_tuple(fn_params[f"up_{i}"])
        blk = _t_blk_for(c_in, cond_t.shape[2], dname)
        last = i == n_up - 1
        if not differentiable and cond_t.shape[2] < kernel_min_len:
            from ..models.decoder import Upsample as _Up
            from ..models.layers import Conv1d

            x_t = _Up(
                n, 1, dtype=dt, conv_impl=cfg.conv_impl, channels_first=True
            ).apply(
                {"params": fn_params[f"up_{i}"]},
                xu_t[:, :, : cond_t.shape[2]], cond_t,
            ).astype(dt)
            if last:
                ok = fn_params["output_layer"]["kernel"]  # [k, Co, 1]
                x_t = Conv1d(1, ok.shape[0], channels_first=True).apply(
                    {"params": fn_params["output_layer"]},
                    x_t.astype(jnp.float32),
                )
            continue
        if last:
            wconv, bconv, wfilm, bfilm, w5, b5 = w
            ok = fn_params["output_layer"]["kernel"]  # [k, Co, 1]
            k = ok.shape[0]
            w_out = ok[:, :, 0]  # [k, Co]
            w5c = jnp.dot(w_out, w5)  # [k, C]
            b5c = jnp.dot(w_out, b5)  # [k, 1]
            bout = fn_params["output_layer"]["bias"].reshape(1, 1)
            if differentiable:
                x_t = up_chain_vjp(
                    dname, blk, interpret, k,
                    xu_t, cond_t, wconv, bconv, wfilm, bfilm, w5c, b5c, bout,
                )
            else:
                x_t = fused_upsample_chain_t(
                    xu_t, cond_t, wconv, bconv, wfilm, bfilm, w5c, b5c,
                    dtype_name=dname, t_blk=blk,
                    interpret=interpret, fold_k=k, bout=bout,
                )
        elif differentiable and not _diff_kernel_ok(c_in, xu_t.shape[2]):
            from ..models.decoder import Upsample as _Up

            x_t = _Up(
                n, 1, dtype=dt, conv_impl=cfg.conv_impl, channels_first=True
            ).apply({"params": fn_params[f"up_{i}"]}, xu_t, cond_t).astype(dt)
        elif differentiable:
            zero_bout = jnp.zeros((1, 1), jnp.float32)
            x_t = up_chain_vjp(
                dname, blk, interpret, 0, xu_t, cond_t, *w, zero_bout
            ).astype(dt)
        else:
            x_t = fused_upsample_chain_t(
                xu_t, cond_t, *w,
                dtype_name=dname, t_blk=blk, interpret=interpret,
            ).astype(dt)
    return x_t[:, 0, :].astype(jnp.float32)
