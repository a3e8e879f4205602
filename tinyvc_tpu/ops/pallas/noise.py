"""Fused filtered-noise kernel: phase synthesis + iDFT-matmul + overlap-add.

The XLA noise branch (`models/decoder.py::oscillate_noise`, behavioural
spec reference `module/tinyvc/decoder.py:63-85`) materialises the random
angle [B, F, bins], the complex spectrum, the irfft frames [B, F, n_fft]
and the overlap-add intermediates — ~1.4 ms of the serving dsp stage at
B=16 x 10 s. This kernel keeps a frame tile VMEM-resident end to end:
phases are synthesised in-register (a counter-based murmur3 hash of
(batch, frame, bin) mixed with the caller's seed — uniform in [-pi, pi),
deterministic, and tile-independent), the inverse DFT is two MXU matmuls
against (cos | sin) synthesis matrices, the hann synthesis window is
applied in fp32, and the 4-way overlap-add happens as 32-bit
sublane rotates of per-sub-block dot outputs. Cross-tile overlap is handled by recomputing 3 boundary frames
(~3% extra FLOPs) instead of carrying state — tiles stay independent.

The torch-matching zero-frame prepend and the centre trim fall out of
index arithmetic: the wrapper pads the magnitude spectrum with 2 leading
zero rows, so edge frames synthesise to silence exactly like the
reference's padded iSTFT. Window-envelope normalisation (a per-shape
constant) is one XLA elementwise divide on the [B, L] output.

``angle``: tests pass the explicit angle tensor (same contract as
`oscillate_noise`) and the kernel DMAs it instead of hashing — the OLA /
iDFT math is then exactly comparable against the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...dsp.stft import hann_window


@functools.lru_cache(maxsize=None)
def _idft_matrices(
    n_fft: int, bins_pad: int, hop: int, hop_pad: int
) -> tuple[np.ndarray, np.ndarray]:
    """irfft as matmuls: frame[n] = re @ C + im @ S, with the hermitian
    fold-in weights c_k (1 for DC/nyquist, 2 otherwise) / n_fft. Returned
    pre-split per hop sub-block as ``[ratio, bins_pad, hop_pad]`` (zero
    rows past bins, zero cols past hop) so the kernel runs one aligned dot
    per sub-block — Mosaic cannot lower lane slices at hop offsets."""
    bins = n_fft // 2 + 1
    ratio = n_fft // hop
    k = np.arange(bins, dtype=np.float64)[:, None]
    n = np.arange(n_fft, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    c = np.full((bins, 1), 2.0)
    c[0, 0] = 1.0
    c[-1, 0] = 1.0
    C = (c * np.cos(ang) / n_fft).astype(np.float32)
    S = (-c * np.sin(ang) / n_fft).astype(np.float32)

    def split(M):
        out = np.zeros((ratio, bins_pad, hop_pad), np.float32)
        for r in range(ratio):
            out[r, :bins, :hop] = M[:, r * hop : (r + 1) * hop]
        return out

    return split(C), split(S)


def _murmur_mix(h):
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> jnp.uint32(16))
    return h


def _noise_kernel(
    spec_hbm,  # [B, rows_total, bins] ANY fp32 (2 leading zero rows)
    angle_hbm,  # same shape ANY (explicit-angle mode) or [1, 1, 1] dummy
    seed_ref,  # [1, 1] SMEM int32
    c_ref,  # [ratio, bins_pad, hop_pad] VMEM (dtype)
    s_ref,  # [ratio, bins_pad, hop_pad] VMEM (dtype)
    win_ref,  # [ratio, hop_pad] VMEM fp32
    out_ref,  # [1, t, hop] VMEM fp32
    buf,  # VMEM scratch [2, rows, bins] fp32
    abuf,  # VMEM scratch [2, rows, bins] fp32 (angle mode) or [2, 8, 128]
    sems,  # DMA sems [2, 2]
    *,
    t: int,
    nt: int,
    rows_total: int,
    hop: int,
    dtype,
    use_angle_input: bool,
):
    rows = buf.shape[1]
    bins = buf.shape[2]
    b = pl.program_id(0)
    i = pl.program_id(1)
    step = b * nt + i
    slot = jax.lax.rem(step, 2)

    def dma(slot_idx, bb, ii, which):
        src = spec_hbm if which == 0 else angle_hbm
        dst = buf if which == 0 else abuf
        return pltpu.make_async_copy(
            src.at[bb, pl.ds(ii * t, rows), :],
            dst.at[slot_idx],
            sems.at[slot_idx, which],
        )

    def start(slot_idx, bb, ii):
        dma(slot_idx, bb, ii, 0).start()
        if use_angle_input:
            dma(slot_idx, bb, ii, 1).start()

    def wait(slot_idx):
        dma(slot_idx, 0, 0, 0).wait()
        if use_angle_input:
            dma(slot_idx, 0, 0, 1).wait()

    @pl.when(step == 0)
    def _():
        start(slot, b, i)

    wait(slot)
    last = step == pl.num_programs(0) * nt - 1
    nb_ = jnp.where(i + 1 < nt, b, b + 1)
    ni = jnp.where(i + 1 < nt, i + 1, 0)

    @pl.when(jnp.logical_not(last))
    def _():
        start(1 - slot, nb_, ni)

    mag = buf[slot]  # [rows, bins]
    if use_angle_input:
        theta = abuf[slot]
    else:
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, bins), 0)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, bins), 1)
        p = i * t + row_iota  # padded spec row — tile-independent
        idx = (b * rows_total + p) * 1024 + col_iota
        h = _murmur_mix(idx.astype(jnp.uint32) ^ seed_ref[0, 0].astype(jnp.uint32))
        # keep 23 bits so the int32 view stays non-negative (Mosaic has no
        # uint32 -> f32 cast; int32 -> f32 is supported)
        u = (
            (h >> jnp.uint32(9)).astype(jnp.int32).astype(jnp.float32)
            * jnp.float32(2.0**-23)
        )
        theta = u * jnp.float32(2.0 * np.pi) - jnp.float32(np.pi)
    re = (mag * jnp.cos(theta)).astype(dtype)
    im = (mag * jnp.sin(theta)).astype(dtype)
    # per-sub-block synthesis + overlap-add with trim folded in: out
    # block j (t rows) sums sub-block r of frame l = j + 3 - r; the row
    # shift is a 32-bit sublane rotate (wrapped rows land past row t and
    # are never read)
    ratio = c_ref.shape[0]
    acc = None
    for r in range(ratio):
        y_r = jnp.dot(re, c_ref[r], preferred_element_type=jnp.float32)
        y_r = y_r + jnp.dot(im, s_ref[r], preferred_element_type=jnp.float32)
        y_r = y_r * win_ref[r][None, :]  # [rows, hop_pad]
        sh = (ratio - 1) - r  # rows to shift down: out[j] <- y_r[j + sh]
        if sh:
            y_r = pltpu.roll(y_r, rows - sh, 0)
        acc = y_r if acc is None else acc + y_r
    out_ref[0] = acc[:t]


@functools.partial(
    jax.jit,
    static_argnames=("frame_size", "n_fft", "interpret", "dtype_name"),
)
def pallas_oscillate_noise(
    kernel_mag: jnp.ndarray,
    seed: jnp.ndarray,
    frame_size: int = 480,
    n_fft: int = 1920,
    angle: jnp.ndarray | None = None,
    interpret: bool = False,
    dtype_name: str = "bfloat16",
) -> jnp.ndarray:
    """kernel_mag [B, F, bins] fp32 -> noise [B, F*frame_size] fp32.

    Same contract as `models/decoder.py::oscillate_noise` (random-phase
    unit spectrum * magnitude filter, zero frame prepended, iSTFT), except
    the production phases come from the in-kernel hash stream seeded by
    ``seed`` (int32 scalar) rather than jax.random — pass ``angle``
    explicitly for exact parity runs."""
    assert n_fft == 4 * frame_size
    B, F, bins = kernel_mag.shape
    hop = frame_size
    dtype = jnp.dtype(dtype_name)

    t = 128
    for cand in range(128, 7, -8):
        if F % cand == 0:
            t = cand
            break
    nt = -(-F // t)
    rows = t + 3
    rows += (-rows) % 8
    bins_pad = -(-bins // 128) * 128  # lane-aligned DMA windows
    # padded spec: 2 leading zero rows (g = -1 pad + g = 0 zero-frame),
    # zero tail so every tile's [i*t, i*t + rows) window is in bounds;
    # zero lane pad contributes nothing (magnitude 0)
    rows_total = max(2 + F, (nt - 1) * t + rows)
    specp = jnp.zeros((B, rows_total, bins_pad), jnp.float32)
    specp = jax.lax.dynamic_update_slice(
        specp, kernel_mag.astype(jnp.float32), (0, 2, 0)
    )
    if angle is not None:
        anglep = jnp.zeros((B, rows_total, bins_pad), jnp.float32)
        anglep = jax.lax.dynamic_update_slice(
            anglep, angle.astype(jnp.float32), (0, 2, 0)
        )
        abuf_shape = (2, rows, bins_pad)
    else:
        anglep = jnp.zeros((1, 1, 1), jnp.float32)
        abuf_shape = (2, 8, 128)

    hop_pad = -(-hop // 128) * 128
    C, S = _idft_matrices(n_fft, bins_pad, hop, hop_pad)
    ratio = n_fft // hop
    win = jnp.zeros((ratio, hop_pad), jnp.float32)
    win = win.at[:, :hop].set(
        jnp.asarray(hann_window(n_fft)).reshape(ratio, hop)
    )
    kernel = functools.partial(
        _noise_kernel,
        t=t, nt=nt, rows_total=rows_total, hop=hop, dtype=dtype,
        use_angle_input=angle is not None,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1), lambda b, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                C.shape, lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                S.shape, lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_fft // hop, hop_pad), lambda b, i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, t, hop_pad), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, nt * t, hop_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, rows, bins_pad), jnp.float32),
            pltpu.VMEM(abuf_shape, jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(
        specp,
        anglep,
        jnp.asarray(seed, jnp.int32).reshape(1, 1),
        jnp.asarray(C, dtype),
        jnp.asarray(S, dtype),
        win,
    )
    y = out[:, :F, :hop].reshape(B, F * hop)
    # window-envelope normalisation (istft's per-shape constant), with the
    # same centre trim; constant-folded by XLA
    w2 = (jnp.asarray(hann_window(n_fft)) ** 2).reshape(1, ratio, hop)
    nb = (F + 1) + ratio - 1
    env = jnp.zeros((1, nb, hop), jnp.float32)
    for r in range(ratio):
        env = env.at[:, r : r + F + 1].add(
            jnp.broadcast_to(w2[:, r], (1, F + 1, hop))
        )
    env = env.reshape(1, nb * hop)[:, 2 * hop : 2 * hop + F * hop]
    return y / jnp.maximum(env, 1e-11)
