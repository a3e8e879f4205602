"""Pallas TPU kernel: fused additive-oscillator bank.

Replaces the XLA chain in `models/decoder.py::oscillate_harmonics` +
amplitude modulation (reference semantics: `module/tinyvc/decoder.py:24-54`
plus the ``harmonics * interp(amps)`` at `decoder.py:261-263`), which
materialises several waveform-rate [B, L, H+1] intermediates in HBM. The
kernel reads only frame-rate inputs (f0, amps) and writes the single
waveform-rate output — HBM traffic drops from ~6 tensors to 1.

Implementation notes:
- phase integration is exact cumsum done as two triangular matmuls on the
  MXU (intra-frame [480 x 480] and inter-frame [P x P]); the carry across
  grid steps lives in SMEM scratch. TPU grid execution is sequential over
  the (B, F/P) grid, so the carry is correct; it resets per batch row.
- every phase accumulator (frame sums, block offsets, carry) is wrapped
  mod 1 — harmonics are integer multiples so only phase mod 1 matters —
  keeping fp32 rounding at the 1e-4-cycle level over arbitrary lengths
  (tighter than the unbounded fp32 cumsum the reference/XLA paths use).
- linear interpolation follows torch align_corners=False: sample i of frame
  p mixes frames (p-1, p) in its first half and (p, p+1) in its second; the
  host passes shifted prev/cur/next copies so the kernel needs no dynamic
  slicing (Mosaic requires 128-aligned lane-dim slices).
- output layout is [B, H+1, L] (lanes carry the waveform axis); the caller
  transposes to the model's [B, L, H+1].
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _osc_kernel(
    f0_ref,  # [1, P, 3]  (prev, cur, next) per frame
    amps_ref,  # [1, P, 3*H1]  (prev | cur | next) blocks
    out_ref,  # [1, H1, P, frame] output block
    carry_ref,  # SMEM [1] phase carry
    *,
    frames_per_block: int,
    frame_size: int,
    num_out: int,
    sample_rate: float,
    min_frequency: float,
):
    P = frames_per_block
    S = P * frame_size
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        carry_ref[0, 0] = 0.0

    f0_prev = f0_ref[0, :, 0:1]  # [P, 1]
    f0_cur = f0_ref[0, :, 1:2]
    f0_next = f0_ref[0, :, 2:3]

    # a[i] = (i + 0.5)/frame - 0.5 (torch align_corners=False coordinates)
    a = (
        jax.lax.broadcasted_iota(jnp.int32, (1, frame_size), 1).astype(jnp.float32)
        + 0.5
    ) / frame_size - 0.5  # [1, frame]

    def interp(prev, cur, nxt):
        lo = prev * (-a) + cur * (1.0 + a)
        hi = cur * (1.0 - a) + nxt * a
        return jnp.where(a < 0.0, lo, hi)  # [P, frame]

    f0_s = interp(f0_prev, f0_cur, f0_next)
    uv_s = interp(
        (f0_prev > min_frequency).astype(jnp.float32),
        (f0_cur > min_frequency).astype(jnp.float32),
        (f0_next > min_frequency).astype(jnp.float32),
    )

    # exact cumsum via triangular matmuls (MXU)
    d = f0_s * (1.0 / sample_rate)  # [P, frame]
    col = jax.lax.broadcasted_iota(jnp.int32, (frame_size, frame_size), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (frame_size, frame_size), 0)
    tri_inc = (row <= col).astype(jnp.float32)  # inclusive
    # HIGHEST precision: the MXU otherwise truncates inputs to bf16, which
    # turns the integrated frequency into an audible detune
    intra = jnp.dot(
        d, tri_inc,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [P, frame]
    frame_sums = intra[:, frame_size - 1 : frame_size]  # [P, 1]
    fs_mod = frame_sums - jnp.floor(frame_sums)  # wrap mod 1 (see header)
    colp = jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)
    rowp = jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
    # offsets[p] = sum_{q < p} fs_mod[q]: strict-lower-triangular [P,P] @ [P,1]
    tri_exc = (colp < rowp).astype(jnp.float32)
    offsets = jnp.dot(
        tri_exc, fs_mod,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [P, 1]
    offsets = offsets - jnp.floor(offsets)
    phase = carry_ref[0, 0] + offsets + intra  # [P, frame]

    total = carry_ref[0, 0] + offsets[P - 1, 0] + fs_mod[P - 1, 0]
    carry_ref[0, 0] = total - jnp.floor(total)

    two_pi = 2.0 * math.pi
    H1 = num_out
    for h in range(H1):
        k = float(h + 1)
        amp_s = interp(
            amps_ref[0, :, h : h + 1],
            amps_ref[0, :, H1 + h : H1 + h + 1],
            amps_ref[0, :, 2 * H1 + h : 2 * H1 + h + 1],
        )
        ph = phase * k
        frac = ph - jnp.floor(ph)
        wave = jnp.sin(two_pi * frac) * uv_s * amp_s
        out_ref[0, h] = wave  # [P, frame]


def _xla_fallback(f0, amps, frame_size, sample_rate, min_frequency):
    from ...dsp.interp import upsample_frames_to_samples
    from ...models.decoder import oscillate_harmonics

    H1 = amps.shape[-1]
    harm = oscillate_harmonics(f0, frame_size, sample_rate, H1 - 1, min_frequency)
    return harm * upsample_frames_to_samples(amps.astype(jnp.float32), frame_size)


def _pallas_forward(
    f0: jnp.ndarray,
    amps: jnp.ndarray,
    frame_size: int,
    sample_rate: int,
    min_frequency: float,
    frames_per_block: int,
    interpret: bool,
    transpose_out: bool = True,
) -> jnp.ndarray:
    B, F = f0.shape
    H1 = amps.shape[-1]
    # Tiling constraints: output lane dim P*frame % 128 == 0 and sublane
    # (frame-count) blocks P % 8 == 0. Pad F up to a multiple of the block
    # so the kernel is always legal (padded frames are edge copies, cropped
    # from the output).
    lane_step = 128 // math.gcd(frame_size, 128)  # 4 for frame 480
    step = max(8, lane_step)
    P = max(step, (frames_per_block // step) * step)
    F_pad = ((F + P - 1) // P) * P
    if F_pad != F:
        pad = F_pad - F
        f0 = jnp.concatenate(
            [f0, jnp.broadcast_to(f0[:, -1:], (B, pad))], axis=1
        )
        amps = jnp.concatenate(
            [amps, jnp.broadcast_to(amps[:, -1:], (B, pad, H1))], axis=1
        )

    f0 = f0.astype(jnp.float32)
    amps = amps.astype(jnp.float32)
    # host-side shifted copies: [B, F, 3] (prev, cur, next), edge-clamped
    f0_pcn = jnp.stack(
        [
            jnp.concatenate([f0[:, :1], f0[:, :-1]], axis=1),
            f0,
            jnp.concatenate([f0[:, 1:], f0[:, -1:]], axis=1),
        ],
        axis=-1,
    )
    amps_pcn = jnp.concatenate(
        [
            jnp.concatenate([amps[:, :1], amps[:, :-1]], axis=1),
            amps,
            jnp.concatenate([amps[:, 1:], amps[:, -1:]], axis=1),
        ],
        axis=-1,
    )  # [B, F, 3*H1]

    kernel = functools.partial(
        _osc_kernel,
        frames_per_block=P,
        frame_size=frame_size,
        num_out=H1,
        sample_rate=float(sample_rate),
        min_frequency=float(min_frequency),
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, F_pad // P),
        in_specs=[
            pl.BlockSpec((1, P, 3), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, P, 3 * H1), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, H1, P, frame_size),
            lambda b, t: (b, 0, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H1, F_pad, frame_size), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        interpret=interpret,
    )(f0_pcn, amps_pcn)
    out = out[:, :, :F].reshape(B, H1, F * frame_size)
    if transpose_out:
        return jnp.swapaxes(out, 1, 2)  # [B, L, H1]
    return out  # [B, H1, L] channels-first (serving: avoids the lane-padded
    # [B, L, 15] layout, which bloats ~8.5x on TPU, plus the transpose)


def _osc_bwd_kernel(
    f0_ref,  # [1, P, 3]  (prev, cur, next) per frame
    g_ref,  # [1, H1, P, frame] cotangent block
    out_ref,  # [1, P, 3*H1] per-frame (prev | cur | next) amp-grad parts
    carry_ref,  # SMEM [1] phase carry
    *,
    frames_per_block: int,
    frame_size: int,
    num_out: int,
    sample_rate: float,
    min_frequency: float,
):
    """Amp-gradient of the oscillator bank, fused.

    The XLA fallback's vjp recomputes ``sin`` at waveform rate in the
    channels-last ``[B, L, H1]`` layout (lane-padded 15 -> 128, ~8.5x HBM
    bloat) — measured 8.5 ms/step of the GAN program. Here phase is
    recomputed from frame-rate f0 exactly as in the forward kernel, and the
    only waveform-rate traffic is ONE read of the cotangent. Per frame p the
    kernel emits the three interpolation-split partial sums
    ``sum_i g[p,i] * sin(..)[p,i] * w_{prev|cur|next}(i)``; the host
    shift-adds them into ``damps[p] = nextC[p-1] + curC[p] + prevC[p+1]``
    (the exact transpose of the forward's edge-clamped (prev, cur, next)
    stacking)."""
    P = frames_per_block
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        carry_ref[0, 0] = 0.0

    f0_prev = f0_ref[0, :, 0:1]
    f0_cur = f0_ref[0, :, 1:2]
    f0_next = f0_ref[0, :, 2:3]

    a = (
        jax.lax.broadcasted_iota(jnp.int32, (1, frame_size), 1).astype(jnp.float32)
        + 0.5
    ) / frame_size - 0.5

    def interp(prev, cur, nxt):
        lo = prev * (-a) + cur * (1.0 + a)
        hi = cur * (1.0 - a) + nxt * a
        return jnp.where(a < 0.0, lo, hi)

    f0_s = interp(f0_prev, f0_cur, f0_next)
    uv_s = interp(
        (f0_prev > min_frequency).astype(jnp.float32),
        (f0_cur > min_frequency).astype(jnp.float32),
        (f0_next > min_frequency).astype(jnp.float32),
    )

    d = f0_s * (1.0 / sample_rate)
    col = jax.lax.broadcasted_iota(jnp.int32, (frame_size, frame_size), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (frame_size, frame_size), 0)
    tri_inc = (row <= col).astype(jnp.float32)
    intra = jnp.dot(
        d, tri_inc,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    frame_sums = intra[:, frame_size - 1 : frame_size]
    fs_mod = frame_sums - jnp.floor(frame_sums)
    colp = jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)
    rowp = jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
    tri_exc = (colp < rowp).astype(jnp.float32)
    offsets = jnp.dot(
        tri_exc, fs_mod,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    offsets = offsets - jnp.floor(offsets)
    phase = carry_ref[0, 0] + offsets + intra

    total = carry_ref[0, 0] + offsets[P - 1, 0] + fs_mod[P - 1, 0]
    carry_ref[0, 0] = total - jnp.floor(total)

    # interpolation weight split (transpose of `interp` w.r.t. its 3 taps)
    w_prev = jnp.where(a < 0.0, -a, 0.0)  # [1, frame]
    w_cur = jnp.where(a < 0.0, 1.0 + a, 1.0 - a)
    w_next = jnp.where(a < 0.0, 0.0, a)

    two_pi = 2.0 * math.pi
    H1 = num_out
    prev_cols, cur_cols, next_cols = [], [], []
    for h in range(H1):
        k = float(h + 1)
        ph = phase * k
        frac = ph - jnp.floor(ph)
        m = jnp.sin(two_pi * frac) * uv_s * g_ref[0, h]  # [P, frame]
        prev_cols.append(jnp.sum(m * w_prev, axis=1, keepdims=True))
        cur_cols.append(jnp.sum(m * w_cur, axis=1, keepdims=True))
        next_cols.append(jnp.sum(m * w_next, axis=1, keepdims=True))
    out_ref[0] = jnp.concatenate(prev_cols + cur_cols + next_cols, axis=1)


def _pallas_backward_amps(
    f0: jnp.ndarray,
    g: jnp.ndarray,  # [B, H1, L] cotangent, channels-first
    frame_size: int,
    sample_rate: int,
    min_frequency: float,
    frames_per_block: int,
    interpret: bool,
) -> jnp.ndarray:
    """damps [B, F, H1] from the waveform-rate cotangent; see `_osc_bwd_kernel`."""
    B, F = f0.shape
    H1 = g.shape[1]
    lane_step = 128 // math.gcd(frame_size, 128)
    step = max(8, lane_step)
    P = max(step, (frames_per_block // step) * step)
    F_pad = ((F + P - 1) // P) * P
    if F_pad != F:
        pad = F_pad - F
        f0 = jnp.concatenate(
            [f0, jnp.broadcast_to(f0[:, -1:], (B, pad))], axis=1
        )
        g = jnp.concatenate(
            [g, jnp.zeros((B, H1, pad * frame_size), g.dtype)], axis=2
        )
    f0 = f0.astype(jnp.float32)
    f0_pcn = jnp.stack(
        [
            jnp.concatenate([f0[:, :1], f0[:, :-1]], axis=1),
            f0,
            jnp.concatenate([f0[:, 1:], f0[:, -1:]], axis=1),
        ],
        axis=-1,
    )
    g4 = g.astype(jnp.float32).reshape(B, H1, F_pad, frame_size)

    kernel = functools.partial(
        _osc_bwd_kernel,
        frames_per_block=P,
        frame_size=frame_size,
        num_out=H1,
        sample_rate=float(sample_rate),
        min_frequency=float(min_frequency),
    )
    parts = pl.pallas_call(
        kernel,
        grid=(B, F_pad // P),
        in_specs=[
            pl.BlockSpec((1, P, 3), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, H1, P, frame_size),
                lambda b, t: (b, 0, t, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, P, 3 * H1), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, F_pad, 3 * H1), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        interpret=interpret,
    )(f0_pcn, g4)
    parts = parts[:, :F]
    prev_c = parts[:, :, :H1]
    cur_c = parts[:, :, H1 : 2 * H1]
    next_c = parts[:, :, 2 * H1 :]
    # transpose of the edge-clamped (prev, cur, next) shifts:
    # frame p receives cur[p], prev[p+1] (it was frame p+1's "prev") and
    # next[p-1]; the clamped edges fold back onto frames 0 / F-1.
    # pad-based shifted adds, not .at[].add: the slice DUS forms copy the
    # whole tensor per update, the pads fuse into ONE add pass (VERDICT r3
    # item 6)
    Fn = cur_c.shape[1]

    def padf(v, lo, hi):
        return jnp.pad(v, ((0, 0), (lo, hi), (0, 0)))

    return (
        cur_c
        + padf(prev_c[:, 1:], 0, 1)          # frame p += prev[p+1]
        + padf(prev_c[:, :1], 0, Fn - 1)     # clamped edge -> frame 0
        + padf(next_c[:, :-1], 1, 0)         # frame p += next[p-1]
        + padf(next_c[:, -1:], Fn - 1, 0)    # clamped edge -> frame F-1
    )


# Differentiation: pallas_call has no JVP/transpose rules, so the GAN
# training step (which backprops through `decoder.dsp` into SourceNet's
# amps head) would fail with the kernel engaged. Wrap it in a custom_vjp:
# forward = Pallas kernel; the amps gradient (the only one the GAN step
# consumes — the encoder that produces f0 is frozen, reference
# `train_decoder.py:67-68`) runs through `_osc_bwd_kernel`; the f0 gradient
# falls back to the vjp of the mathematically identical XLA chain and is
# dead-code-eliminated whenever nothing consumes it.
@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def _osc(f0, amps, frame_size, sample_rate, min_frequency, frames_per_block,
         interpret, transpose_out, grad_f0):
    return _pallas_forward(
        f0, amps, frame_size, sample_rate, min_frequency, frames_per_block,
        interpret, transpose_out,
    )


def _osc_fwd(f0, amps, frame_size, sample_rate, min_frequency,
             frames_per_block, interpret, transpose_out, grad_f0):
    out = _pallas_forward(
        f0, amps, frame_size, sample_rate, min_frequency, frames_per_block,
        interpret, transpose_out,
    )
    return out, (f0, amps)


def _osc_bwd(frame_size, sample_rate, min_frequency, frames_per_block,
             interpret, transpose_out, grad_f0, res, g):
    f0, amps = res
    g_t = jnp.swapaxes(g, 1, 2) if transpose_out else g  # [B, H1, L]
    damps = _pallas_backward_amps(
        f0, g_t, frame_size, sample_rate, min_frequency, frames_per_block,
        interpret,
    ).astype(amps.dtype)
    if not grad_f0:
        # f0 is a label-like signal from the frozen encoder in every
        # training path (reference `train_decoder.py:67-68,101`); skipping
        # the fallback vjp keeps its interp gathers/scatters out of the
        # traced program entirely (tests/test_no_gather.py), instead of
        # relying on XLA DCE to remove the dead chain.
        return jnp.zeros_like(f0), damps
    # f0 gradient: XLA-chain vjp (df0-only)
    g_l = jnp.swapaxes(g_t, 1, 2)  # fallback chain is [B, L, H1]
    _, vjp = jax.vjp(
        lambda f: _xla_fallback(
            f, amps.astype(jnp.float32), frame_size, sample_rate, min_frequency
        ),
        f0.astype(jnp.float32),
    )
    (df0,) = vjp(g_l.astype(jnp.float32))
    return df0.astype(f0.dtype), damps


_osc.defvjp(_osc_fwd, _osc_bwd)


@functools.partial(
    jax.jit,
    static_argnames=(
        "frame_size",
        "sample_rate",
        "min_frequency",
        "frames_per_block",
        "interpret",
        "transpose_out",
        "grad_f0",
    ),
)
def oscillator_bank(
    f0: jnp.ndarray,
    amps: jnp.ndarray,
    frame_size: int = 480,
    sample_rate: int = 24000,
    min_frequency: float = 20.0,
    frames_per_block: int = 24,
    interpret: bool = False,
    transpose_out: bool = True,
    grad_f0: bool = True,
) -> jnp.ndarray:
    """f0 [B, F], amps [B, F, H1] -> modulated harmonics [B, F*frame, H1]
    (or [B, H1, F*frame] with ``transpose_out=False``).

    Fused equivalent of
    ``oscillate_harmonics(f0) * upsample_frames_to_samples(amps)``.
    Differentiable: the amps gradient runs through a Pallas backward
    kernel; the f0 gradient uses the XLA-chain vjp when ``grad_f0`` (pass
    False when f0 comes from a frozen producer — returns zeros and keeps
    the fallback's gathers out of the traced program).
    """
    return _osc(
        f0,
        amps,
        frame_size,
        sample_rate,
        min_frequency,
        frames_per_block,
        interpret,
        transpose_out,
        grad_f0,
    )
