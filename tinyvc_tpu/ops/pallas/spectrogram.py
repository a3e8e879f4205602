"""Fused magnitude-spectrogram Pallas kernel (window + DFT-matmul).

The XLA spectrogram (`dsp/stft.py::spectrogram`, behavioural spec
reference `module/utils/spectrogram.py:8-15`) materialises the framed
waveform ``[B, F, n_fft]`` (~61 MB at serving shapes) around an rfft —
measured 2.80 ms at B=16 x 10 s, 7.8x the memory floor. This kernel
keeps every frame VMEM-resident: per frame tile it DMAs the hop-sized
block rows it covers, builds the 4-shifted-view frame matrix in VMEM,
applies the hann window in fp32, and multiplies against the packed
(cos | -sin) DFT matrix on the MXU, emitting fp32 magnitudes. HBM
traffic = wave once in + spectrum once out. The DFT matrix is split into
bin blocks of <= 2 MB so the double-buffered (hi, lo) weight pair stays
well under the 16 MB scoped-VMEM budget (which is shared with the
enclosing computation when the kernel runs inside a while-loop body);
the splits ride the slowest grid axis (each loaded once per batch pass,
not per step).

Precision modes (``dtype_name``):

- ``bf16x3`` (default): hi/lo bf16 splits of both operands, three MXU
  passes (f_hi@W_hi + f_hi@W_lo + f_lo@W_hi) — ~1.5e-5 relative, which
  keeps kNN retrieval bit-stable vs the fp32 spectrogram (flip-rate
  measurements: 2e-3 perturbation flips 3% of neighbours, 1e-4 flips 0).
- ``bfloat16``: one pass, ~2e-3 relative. Fastest; perturbs retrieval.
- ``float32``: exact (parity tests / interpret mode).
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
def _dft_splits(n_fft: int, part: int, ns: int, ratio: int) -> np.ndarray:
    """``[ns, ratio, hop, 2*part]`` — bin-split h packs (cos | -sin) for
    output bins [h*part, (h+1)*part), zero-padded past n_fft//2+1, with
    the n axis pre-split into the ratio hop-sized sub-blocks the kernel
    multiplies separately. ns splits keep each VMEM weight block small:
    two splits double-buffered OOMed the 16 MB scoped-vmem budget when
    the kernel ran inside a while-loop body (stream step)."""
    bins = n_fft // 2 + 1
    hop = n_fft // ratio
    hop_pad = -(-hop // 128) * 128  # lane-aligned rows (DMA window rule)
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    w = np.zeros((ns, n_fft, 2 * part), np.float32)
    for h in range(ns):
        k0 = h * part
        nk = min(part, bins - k0)
        if nk <= 0:
            continue
        k = np.arange(k0, k0 + nk, dtype=np.float64)[None, :]
        ang = 2.0 * np.pi * n * k / n_fft
        w[h, :, :nk] = np.cos(ang)
        w[h, :, part : part + nk] = -np.sin(ang)
    w = w.reshape(ns, ratio, hop, 2 * part)
    out = np.zeros((ns, ratio, hop_pad, 2 * part), np.float32)
    out[:, :, :hop] = w
    return out


def _hi_lo(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _spec_kernel(
    blocks_hbm,  # [B, nb, hop_pad] ANY, fp32 (lane-padded rows)
    wh_ref,  # [1, ratio, hop, 2*half] VMEM — hi (or only) DFT half-block
    wl_ref,  # [1, ratio, hop, 2*half] VMEM — lo split (bf16x3) or alias
    win_ref,  # [ratio, hop] VMEM fp32
    out_ref,  # [1, t_frames, 1, half] VMEM
    buf,  # VMEM scratch [2, rows, hop] fp32
    sems,  # DMA sems [2]
    *,
    t_frames: int,
    nt: int,
    ratio: int,
    mode: str,
):
    rows = buf.shape[1]
    h = pl.program_id(0)
    b = pl.program_id(1)
    i = pl.program_id(2)
    step = (h * pl.num_programs(1) + b) * nt + i
    slot = jax.lax.rem(step, 2)

    def dma(slot_idx, bb, ii):
        return pltpu.make_async_copy(
            blocks_hbm.at[bb, pl.ds(ii * t_frames, rows), :],
            buf.at[slot_idx],
            sems.at[slot_idx],
        )

    @pl.when(step == 0)
    def _():
        dma(slot, b, i).start()

    dma(slot, b, i).wait()
    total = pl.num_programs(0) * pl.num_programs(1) * nt
    last = step == total - 1
    # next (h, b, i) in (h slowest, i fastest) order
    ni = jnp.where(i + 1 < nt, i + 1, 0)
    carry_b = i + 1 >= nt
    nb_ = jnp.where(carry_b, b + 1, b)
    nb_ = jnp.where(nb_ >= pl.num_programs(1), 0, nb_)

    @pl.when(jnp.logical_not(last))
    def _():
        dma(1 - slot, nb_, ni).start()

    # per-sub-block matmuls: frame t's n_fft window = ratio hop-blocks
    # S[t .. t+ratio), so the windowed DFT is a SUM of ratio dots — no
    # frame matrix is ever built (and no lane-concat of sublane-shifted
    # slices, which Mosaic cannot lower)
    S = buf[slot]  # [rows, hop]
    y = None
    for r in range(ratio):
        fw = S[r : r + t_frames] * win_ref[r][None, :]
        if mode == "float32":
            p = jnp.dot(
                fw, wh_ref[0, r], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        elif mode == "bfloat16":
            p = jnp.dot(
                fw.astype(jnp.bfloat16), wh_ref[0, r],
                preferred_element_type=jnp.float32,
            )
        else:  # bf16x3
            fh, fl = _hi_lo(fw)
            p = jnp.dot(fh, wh_ref[0, r], preferred_element_type=jnp.float32)
            p = p + jnp.dot(
                fh, wl_ref[0, r], preferred_element_type=jnp.float32
            )
            p = p + jnp.dot(
                fl, wh_ref[0, r], preferred_element_type=jnp.float32
            )
        y = p if y is None else y + p
    part = y.shape[1] // 2
    re = y[:, :part]
    im = y[:, part:]
    out_ref[0, 0] = jnp.sqrt(re * re + im * im)


def _pick_tile(F: int) -> int:
    """Largest multiple of 8 <= 128 dividing F (no output crop), else 128."""
    for cand in range(128, 7, -8):
        if F % cand == 0:
            return cand
    return 128


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop", "interpret", "dtype_name")
)
def pallas_spectrogram(
    x: jnp.ndarray,
    n_fft: int = 1920,
    hop: int = 480,
    interpret: bool = False,
    dtype_name: str = "bf16x3",
) -> jnp.ndarray:
    """Magnitude spectrogram ``[B, L] -> [B, L//hop, n_fft//2+1]`` fp32,
    dropped-frame-0 convention (matches `dsp/stft.py::spectrogram`)."""
    assert n_fft % hop == 0
    ratio = n_fft // hop
    B, L = x.shape
    F = L // hop
    assert F * hop == L, "length must be a hop multiple (auto-padded upstream)"
    bins = n_fft // 2 + 1
    hop_pad128 = -(-hop // 128) * 128
    itemsize = 4 if dtype_name == "float32" else 2
    # bin-split count: each [ratio, hop_pad, 2*part] weight block <= 2 MB so
    # the double-buffered (wh, wl) pair stays ~8 MB of scoped VMEM (16 MB
    # budget, shared with scratch/out even inside while-loop bodies)
    def _part(ns):  # lane-aligned split width for ns bin-splits
        return -(-(-(-bins // ns)) // 128) * 128

    ns = 2
    while ratio * hop_pad128 * 2 * _part(ns) * itemsize > 2 * 2**20 and ns < bins:
        ns *= 2
    part = _part(ns)

    t_frames = _pick_tile(F)
    nt = -(-F // t_frames)
    rows = t_frames + ratio - 1
    rows += (-rows) % 8  # sublane-aligned DMA window
    need_rows = (nt - 1) * t_frames + rows

    # centre reflect pad, then drop the first hop so frame t starts at
    # block row t exactly (drop_first folds into the data layout — DMA
    # window starts stay 8-aligned, which Mosaic requires on tiled refs)
    pad = n_fft // 2
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
    xp = xp[:, hop:]
    tail = need_rows * hop - xp.shape[1]
    if tail > 0:
        xp = jnp.pad(xp, ((0, 0), (0, tail)))
    blocks = xp[:, : need_rows * hop].reshape(B, need_rows, hop)
    # lane-pad each hop row to 128-aligned width; the zero columns die
    # against the zero-padded window/DFT rows
    hop_pad = -(-hop // 128) * 128
    if hop_pad != hop:
        blocks = jnp.pad(blocks, ((0, 0), (0, 0), (0, hop_pad - hop)))

    w = _dft_splits(n_fft, part, ns, ratio)
    if dtype_name == "float32":
        wh = jnp.asarray(w)
        wl = wh  # unused alias (same spec keeps the call signature fixed)
    elif dtype_name == "bfloat16":
        wh = jnp.asarray(w).astype(jnp.bfloat16)
        wl = wh
    else:
        assert dtype_name == "bf16x3", dtype_name
        w32 = jnp.asarray(w)
        wh = w32.astype(jnp.bfloat16)
        wl = (w32 - wh.astype(jnp.float32)).astype(jnp.bfloat16)
    win = jnp.zeros((ratio, hop_pad), jnp.float32)
    win = win.at[:, :hop].set(
        jnp.asarray(hann_window(n_fft)).reshape(ratio, hop)
    )

    kernel = functools.partial(
        _spec_kernel,
        t_frames=t_frames, nt=nt, ratio=ratio, mode=dtype_name,
    )
    wspec = pl.BlockSpec(
        (1,) + w.shape[1:], lambda h, b, i: (h, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        grid=(ns, B, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            wspec,
            wspec,
            pl.BlockSpec(
                (ratio, hop_pad), lambda h, b, i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, t_frames, part), lambda h, b, i: (h, b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (ns, B, nt * t_frames, part), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows, hop_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(blocks, wh, wl, win)
    out = jnp.concatenate([out[h] for h in range(ns)], axis=-1)[:, :F, :bins]
    return out
