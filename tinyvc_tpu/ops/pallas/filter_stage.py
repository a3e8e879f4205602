"""Pallas TPU kernel: fused FilterNet Upsample conv chain (v4, transposed).

The Upsample body (reference `module/tinyvc/decoder.py:160-190`) is four
dilated k=3 convs, two FiLM modulations, two residual adds, and an output
1x1 — under XLA each op round-trips its [B, T, C] activation through HBM
(~12 tensor passes per stage at waveform rate, ~10% MXU utilisation from
the 24-384 channel widths). This kernel keeps the whole chain VMEM-resident
so each stage costs ~3 HBM passes (read packed input, write out).

Layout is the whole story (v1 lost 62 vs 38 ms to XLA on operand-view
DMA/VMEM blowup; v3 fixed the DMA but only TIED XLA at 33.6 ms because a
channels-last [W, 24] tile pads its lane dim to 128 — 5.3x wasted VPU work
and VMEM traffic on every roll/concat/add). v4 runs **channels-first**
inside the kernel:

- tiles are ``[C, W]``: channels on sublanes (8-granular — every FilterNet
  width 24/48/96/192/384 pads to at most 33%), time on lanes. All VPU ops
  and VMEM spills shrink ~4-5x vs channels-last.
- ``xu`` and ``cond`` are packed host-side into ONE ``[B, 2C, Tp]`` array
  (a channel concat, no zero-fill); each grid step issues a single
  double-buffered DMA of a ``[2C, t_blk + 2*HALO]`` window from ANY/HBM
  into VMEM scratch, overlapping the next window's DMA with compute. The
  window's minor (time) dim offsets/sizes are 128-aligned by construction
  (t_blk multiple of 128, HALO = 128).
- ``x = z[:C]``, ``c = z[C:]`` are plain sublane slices (offsets multiple
  of 8 — legal and cheap), films are one ``[4C, C] @ [C, W]`` matmul, conv
  taps are 32-bit lane rotates (``pltpu.roll`` axis 1), tap stacking is a
  sublane concat, and each conv is one ``[C, 3C] @ [3C, W]`` matmul.
- MXU inputs are bf16 in the serving profile; VPU-side values stay fp32.

Roll wrap-around garbage corrupts at most sum(2d) = 80 edge lanes of the
work buffer, inside the HALO band, and is cropped. At the sequence ends the
halo holds edge-replicated *input* rather than each conv's own replicate
padding, so the outermost ~80 output samples may deviate slightly from the
layer-by-layer XLA path (documented; the serving profile uses this kernel,
the strict fp32 profile keeps the XLA path).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DILATIONS = (1, 3, 9, 27)
DILATIONS_DOWN = (1, 2, 4)
HALO = 128  # > 2*(1+3+9+27) = 80 (+3 folded output taps); 128-aligned DMA


def _conv_cf(h, wi, bi, d, dtype):
    """Dilated k=3 conv on a channels-first [C, W] tile: two 32-bit lane
    rotates + sublane concat + one [Co, 3C] @ [3C, W] matmul."""
    W = h.shape[1]
    hm = pltpu.roll(h, d, 1)  # hm[:, t] = h[:, t-d]
    hp = pltpu.roll(h, W - d, 1)  # negative shifts unsupported
    hu = jnp.concatenate([hm, h, hp], axis=0)  # [3C, W] sublane concat
    return jnp.dot(
        wi, hu.astype(dtype), preferred_element_type=jnp.float32
    ) + bi


def _chain(z, wconv, bconv, wfilm, bfilm, w5, b5, bout, dtype, fold_k):
    """The Upsample body on a packed [2C, W] tile (channels-first).

    wconv: [4, C, 3C] (transposed taps); wfilm: [4C, C] packed
    (scale1 | shift1 | scale2 | shift2) rows; w5: [Co, C].
    ``dtype`` is the MXU input dtype — VPU values stay fp32.

    ``fold_k > 0`` folds the model's final k-tap output conv into the stage
    (valid when the stage's c5 output feeds only that conv — up_4): the
    caller pre-combines ``w5' = w_out @ w5`` to [k, C] / ``b5' = w_out @ b5``
    and passes the output bias as ``bout``; the stage then emits the final
    [1, W] waveform directly, so the [24, L] c5 activation never touches
    HBM and the output conv's [7·24, L] unfold never materialises. Runs in
    fp32 (matches the strict output-conv dtype; M=k is MXU-negligible)."""
    C = z.shape[0] // 2
    x = z[:C].astype(jnp.float32)
    c = z[C:].astype(dtype)

    films = (
        jnp.dot(wfilm, c, preferred_element_type=jnp.float32) + bfilm
    )  # [4C, W] fp32

    def conv(h, wi, bi, d):
        return _conv_cf(h, wi, bi, d, dtype)

    def lrelu(h):
        return jnp.where(h > 0, h, 0.1 * h)

    res = x
    h = lrelu(x)
    h = conv(h, wconv[0], bconv[0], DILATIONS[0])
    h = lrelu(h)
    h = conv(h, wconv[1], bconv[1], DILATIONS[1])
    h = h * films[0:C] + films[C : 2 * C]
    h = h + res
    res = h
    h = lrelu(h)
    h = conv(h, wconv[2], bconv[2], DILATIONS[2])
    h = lrelu(h)
    h = conv(h, wconv[3], bconv[3], DILATIONS[3])
    h = h * films[2 * C : 3 * C] + films[3 * C : 4 * C]
    h = h + res
    if not fold_k:
        return (
            jnp.dot(w5, h.astype(dtype), preferred_element_type=jnp.float32)
            + b5
        )
    # folded output conv: p[j] = (w_out @ w5) @ h; out[t] = sum_j p[j, t+j-half]
    p = (
        jnp.dot(
            w5.astype(jnp.float32), h,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        + b5
    )  # [k, W] fp32
    W = p.shape[1]
    half = (fold_k - 1) // 2
    acc = None
    for j in range(fold_k):
        s = half - j
        r = pltpu.roll(p, s if s >= 0 else W + s, 1)[j : j + 1]
        acc = r if acc is None else acc + r
    return acc + bout


def _kernel(
    xz_hbm,  # [B, 2C, Tp] ANY (time-padded: HALO front, HALO+align back)
    wconv_ref,  # [4, C, 3C] VMEM
    bconv_ref,  # [4, C, 1]
    wfilm_ref,  # [4C, C]
    bfilm_ref,  # [4C, 1]
    w5_ref,  # [Co, C] ([k, C] combined when fold_k)
    b5_ref,  # [Co, 1] ([k, 1] when fold_k)
    bout_ref,  # [1, 1] output-conv bias (zeros when not folding)
    out_ref,  # [1, Co, t_blk] VMEM (auto-pipelined)
    buf,  # VMEM scratch [2, 2C, W]
    sems,  # DMA sems [2]
    *,
    t_blk: int,
    nt: int,
    dtype,
    fold_k: int,
):
    W = t_blk + 2 * HALO
    b = pl.program_id(0)
    i = pl.program_id(1)
    step = b * nt + i
    slot = jax.lax.rem(step, 2)

    def dma(slot_idx, bb, ii):
        # window [ii*t_blk, ii*t_blk + W) in padded time coords
        return pltpu.make_async_copy(
            xz_hbm.at[bb, :, pl.ds(ii * t_blk, W)],
            buf.at[slot_idx],
            sems.at[slot_idx],
        )

    @pl.when(step == 0)
    def _():  # warm-up: fetch the first window synchronously
        dma(slot, b, i).start()

    dma(slot, b, i).wait()

    # prefetch the next grid step's window into the other slot
    last = step == pl.num_programs(0) * nt - 1
    nb = jnp.where(i + 1 < nt, b, b + 1)
    ni = jnp.where(i + 1 < nt, i + 1, 0)

    @pl.when(jnp.logical_not(last))
    def _():
        dma(1 - slot, nb, ni).start()

    wconv = [wconv_ref[j].astype(dtype) for j in range(4)]
    bconv = [bconv_ref[j].astype(jnp.float32) for j in range(4)]
    out = _chain(
        buf[slot], wconv, bconv,
        wfilm_ref[:].astype(dtype), bfilm_ref[:].astype(jnp.float32),
        w5_ref[:] if fold_k else w5_ref[:].astype(dtype),
        b5_ref[:].astype(jnp.float32),
        bout_ref[0, 0], dtype, fold_k,
    )
    out_ref[0] = out[:, HALO : HALO + t_blk].astype(out_ref.dtype)


def _stream_window(hbm_refs, row_offsets, buf, sems, b, i, step, slot, *,
                   t_blk: int, nt: int):
    """Single-read streaming windows: per tile, ONE ``core + right-halo``
    DMA per operand (size ``t_blk + HALO`` from UNPADDED [B, C, T] HBM,
    T = nt * t_blk exactly); the next tile's LEFT halo is copied
    VMEM->VMEM from the current buffer before the prefetch, and the
    sequence edges are edge-replicate filled in VMEM. Kills the XLA-side
    pack/edge-pad passes of the padded-window scheme (~2 full HBM
    round-trips per stage) and never re-reads halo bytes from HBM.

    hbm_refs: list of [B, C_j, T] ANY refs; row_offsets: their sublane
    offsets in the shared ``buf`` scratch [2, sumC, t_blk + 2*HALO]."""
    W = t_blk + 2 * HALO

    def dma(slot_idx, bb, ii, last, j):
        n = t_blk if last else t_blk + HALO
        ref = hbm_refs[j]
        r0 = row_offsets[j]
        r1 = row_offsets[j + 1]
        return pltpu.make_async_copy(
            ref.at[bb, :, pl.ds(ii * t_blk, n)],
            buf.at[slot_idx, slice(r0, r1), pl.ds(HALO, n)],
            sems.at[slot_idx, j],
        )

    def start(slot_idx, bb, ii):
        if nt == 1:  # static: the only tile is the last (both edges)
            for j in range(len(hbm_refs)):
                dma(slot_idx, bb, ii, True, j).start()
            return

        @pl.when(ii == nt - 1)
        def _():
            for j in range(len(hbm_refs)):
                dma(slot_idx, bb, ii, True, j).start()

        @pl.when(ii < nt - 1)
        def _():
            for j in range(len(hbm_refs)):
                dma(slot_idx, bb, ii, False, j).start()

    def wait(slot_idx, ii):
        if nt == 1:
            for j in range(len(hbm_refs)):
                dma(slot_idx, 0, 0, True, j).wait()
            return

        @pl.when(ii == nt - 1)
        def _():
            for j in range(len(hbm_refs)):
                dma(slot_idx, 0, 0, True, j).wait()

        @pl.when(ii < nt - 1)
        def _():
            for j in range(len(hbm_refs)):
                dma(slot_idx, 0, 0, False, j).wait()

    @pl.when(step == 0)
    def _():
        start(slot, b, i)

    wait(slot, i)

    # prefetch the next tile: VMEM-copy its left halo out of this window,
    # then start its core DMA into the other slot
    last_step = step == pl.num_programs(0) * nt - 1
    nb = jnp.where(i + 1 < nt, b, b + 1)
    ni = jnp.where(i + 1 < nt, i + 1, 0)

    @pl.when(jnp.logical_not(last_step))
    def _():
        @pl.when(ni > 0)
        def _():
            buf[1 - slot, :, :HALO] = buf[slot, :, t_blk : t_blk + HALO]

        start(1 - slot, nb, ni)

    # sequence-edge fills (edge replication, matching the padded scheme)
    nrows = buf.shape[1]

    @pl.when(i == 0)
    def _():
        buf[slot, :, :HALO] = jnp.broadcast_to(
            buf[slot, :, HALO : HALO + 1], (nrows, HALO)
        )

    @pl.when(i == nt - 1)
    def _():
        buf[slot, :, HALO + t_blk :] = jnp.broadcast_to(
            buf[slot, :, HALO + t_blk - 1 : HALO + t_blk], (nrows, HALO)
        )


def _kernel_stream(
    xu_hbm,  # [B, C, T] ANY, unpadded
    cond_hbm,  # [B, C, T] ANY, unpadded
    wconv_ref, bconv_ref, wfilm_ref, bfilm_ref, w5_ref, b5_ref, bout_ref,
    out_ref,
    buf,  # VMEM scratch [2, 2C, W]
    sems,  # DMA sems [2, 2]
    *,
    t_blk: int,
    nt: int,
    dtype,
    fold_k: int,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    step = b * nt + i
    slot = jax.lax.rem(step, 2)
    C = buf.shape[1] // 2
    _stream_window(
        [xu_hbm, cond_hbm], [0, C, 2 * C], buf, sems, b, i, step, slot,
        t_blk=t_blk, nt=nt,
    )
    wconv = [wconv_ref[j].astype(dtype) for j in range(4)]
    bconv = [bconv_ref[j].astype(jnp.float32) for j in range(4)]
    out = _chain(
        buf[slot], wconv, bconv,
        wfilm_ref[:].astype(dtype), bfilm_ref[:].astype(jnp.float32),
        w5_ref[:] if fold_k else w5_ref[:].astype(dtype),
        b5_ref[:].astype(jnp.float32),
        bout_ref[0, 0], dtype, fold_k,
    )
    out_ref[0] = out[:, HALO : HALO + t_blk].astype(out_ref.dtype)


def upsample_params_to_tuple(p: Dict[str, Any]):
    """Flax Upsample params -> transposed/stacked kernel weight arrays."""
    wconv = jnp.stack(
        [
            p[name]["kernel"].reshape(-1, p[name]["kernel"].shape[-1]).T
            for name in ("c1", "c2", "c3", "c4")
        ]
    )  # [4, C, 3C]
    bconv = jnp.stack([p[name]["bias"] for name in ("c1", "c2", "c3", "c4")])[
        :, :, None
    ]  # [4, C, 1]
    wfilm = jnp.concatenate(
        [
            p["film1"]["to_scale"]["kernel"].T,
            p["film1"]["to_shift"]["kernel"].T,
            p["film2"]["to_scale"]["kernel"].T,
            p["film2"]["to_shift"]["kernel"].T,
        ],
        axis=0,
    )  # [4C, C]
    bfilm = jnp.concatenate(
        [
            p["film1"]["to_scale"]["bias"],
            p["film1"]["to_shift"]["bias"],
            p["film2"]["to_scale"]["bias"],
            p["film2"]["to_shift"]["bias"],
        ]
    )[:, None]  # [4C, 1]
    w5 = p["c5"]["kernel"].T  # [Co, C]
    b5 = p["c5"]["bias"][:, None]  # [Co, 1]
    return wconv, bconv, wfilm, bfilm, w5, b5


@functools.partial(
    jax.jit, static_argnames=("dtype_name", "interpret", "t_blk", "fold_k")
)
def fused_upsample_chain_t(
    xu_t: jnp.ndarray,
    cond_t: jnp.ndarray,
    wconv, bconv, wfilm, bfilm, w5, b5,
    dtype_name: str = "bfloat16",
    t_blk: int = 8192,
    interpret: bool = False,
    fold_k: int = 0,
    bout=None,
) -> jnp.ndarray:
    """Channels-first entry: xu_t, cond_t [B, C, T] -> [B, Co, T].

    Equivalent to the Upsample body after its interpolation step; chained
    stages stay transposed end-to-end (`ops/fused_filternet.py`).

    ``fold_k``: fold the model's final k-tap output conv into this stage —
    ``w5``/``b5`` must then be the pre-combined [k, C]/[k, 1] weights and
    ``bout`` the [1, 1] output bias; the result has Co = 1 (see `_chain`).

    ``xu_t`` may be LONGER than ``cond_t`` (the interp producer's untrimmed
    conv output — see `dsp.interp.upsample_time_int_t(trim=False)`); the
    output length follows ``cond_t`` and the tail is never read.
    """
    assert t_blk % 128 == 0, "time tiles must stay 128-aligned"
    dtype = jnp.dtype(dtype_name)
    B, C, T = cond_t.shape
    assert xu_t.shape[2] >= T
    Co = 1 if fold_k else w5.shape[0]
    if bout is None:
        bout = jnp.zeros((1, 1), jnp.float32)
    align = (-T) % t_blk
    W = t_blk + 2 * HALO
    wspec = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    weights_in = [
        wspec(4, C, 3 * C),
        wspec(4, C, 1),
        wspec(4 * C, C),
        wspec(4 * C, 1),
        wspec(*w5.shape),
        wspec(*b5.shape),
        wspec(1, 1),
    ]
    out_spec = pl.BlockSpec(
        (1, Co, t_blk), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM
    )
    if align == 0:
        # streaming single-read scheme: unpadded operands, no XLA pack/pad
        nt = T // t_blk
        kernel = functools.partial(
            _kernel_stream, t_blk=t_blk, nt=nt, dtype=dtype, fold_k=fold_k
        )
        if dtype != xu_t.dtype:
            xu_t = xu_t.astype(dtype)
            cond_t = cond_t.astype(dtype)
        return pl.pallas_call(
            kernel,
            grid=(B, nt),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2 + weights_in,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((B, Co, T), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, 2 * C, W), dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            interpret=interpret,
        )(xu_t, cond_t, wconv, bconv, wfilm, bfilm, w5, b5, bout)

    xz = jnp.concatenate([xu_t[:, :, :T], cond_t], axis=1)  # [B, 2C, T]
    xz = jnp.pad(xz, ((0, 0), (0, 0), (HALO, HALO + align)), mode="edge")
    if dtype != xz.dtype:
        xz = xz.astype(dtype)
    nt = (T + align) // t_blk

    kernel = functools.partial(
        _kernel, t_blk=t_blk, nt=nt, dtype=dtype, fold_k=fold_k
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + weights_in,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, Co, T + align), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * C, W), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xz, wconv, bconv, wfilm, bfilm, w5, b5, bout)
    return out[:, :, :T]


# ---------------------------------------------------------------------------
# Down-path kernels: the FilterNet down path (stem conv + 4 Downsample conv
# chains, reference `module/tinyvc/decoder.py:137-157,216-221`) has the same
# HBM-pass problem as the up path — under XLA each k=3 unfold materialises a
# [B, T, 3C] concat at waveform rate. Same recipe: channels-first [C, W]
# tiles, double-buffered ANY->VMEM DMA windows, lane-rotate taps, whole
# chain VMEM-resident. No cond/FiLM here, so the kernels are simpler.
# ---------------------------------------------------------------------------


def _chain_down(z, wres, bres, w1, b1, w2, b2, w3, b3, dtype):
    """Downsample body on a [Cin, W] tile (after the interp decimation):
    res = 1x1(z); z -> lrelu -> conv d=1 -> lrelu -> conv d=2 -> lrelu ->
    conv d=4 -> + res (reference `decoder.py:137-157`)."""

    def lrelu(h):
        return jnp.where(h > 0, h, 0.1 * h)

    x = z.astype(jnp.float32)
    res = jnp.dot(
        wres, x.astype(dtype), preferred_element_type=jnp.float32
    ) + bres
    h = lrelu(x)
    h = _conv_cf(h, w1, b1, DILATIONS_DOWN[0], dtype)
    h = lrelu(h)
    h = _conv_cf(h, w2, b2, DILATIONS_DOWN[1], dtype)
    h = lrelu(h)
    h = _conv_cf(h, w3, b3, DILATIONS_DOWN[2], dtype)
    return h + res


def _down_kernel(
    x_hbm,  # [B, Cin, Tp] ANY
    wres_ref, bres_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    out_ref,  # [1, Co, t_blk]
    buf,  # VMEM [2, Cin, W]
    sems,
    *,
    t_blk: int,
    nt: int,
    dtype,
    stem: bool,
):
    W = t_blk + 2 * HALO
    b = pl.program_id(0)
    i = pl.program_id(1)
    step = b * nt + i
    slot = jax.lax.rem(step, 2)

    def dma(slot_idx, bb, ii):
        return pltpu.make_async_copy(
            x_hbm.at[bb, :, pl.ds(ii * t_blk, W)],
            buf.at[slot_idx],
            sems.at[slot_idx],
        )

    @pl.when(step == 0)
    def _():
        dma(slot, b, i).start()

    dma(slot, b, i).wait()
    last = step == pl.num_programs(0) * nt - 1
    nb = jnp.where(i + 1 < nt, b, b + 1)
    ni = jnp.where(i + 1 < nt, i + 1, 0)

    @pl.when(jnp.logical_not(last))
    def _():
        dma(1 - slot, nb, ni).start()

    z = buf[slot]
    if stem:  # single conv: the FilterNet's down_0 stem
        out = _conv_cf(
            z.astype(jnp.float32),
            w1_ref[:].astype(dtype),
            b1_ref[:].astype(jnp.float32),
            1,
            dtype,
        )
    else:
        out = _chain_down(
            z,
            wres_ref[:].astype(dtype), bres_ref[:].astype(jnp.float32),
            w1_ref[:].astype(dtype), b1_ref[:].astype(jnp.float32),
            w2_ref[:].astype(dtype), b2_ref[:].astype(jnp.float32),
            w3_ref[:].astype(dtype), b3_ref[:].astype(jnp.float32),
            dtype,
        )
    out_ref[0] = out[:, HALO : HALO + t_blk].astype(out_ref.dtype)


def _down_kernel_stream(
    x_hbm,  # [B, Cin, T] ANY, unpadded (T = nt * t_blk)
    wres_ref, bres_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    out_ref,
    buf,  # VMEM [2, Cin, W]
    sems,  # [2, 1]
    *,
    t_blk: int,
    nt: int,
    dtype,
    stem: bool,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    step = b * nt + i
    slot = jax.lax.rem(step, 2)
    _stream_window(
        [x_hbm], [0, buf.shape[1]], buf, sems, b, i, step, slot,
        t_blk=t_blk, nt=nt,
    )
    z = buf[slot]
    if stem:
        out = _conv_cf(
            z.astype(jnp.float32),
            w1_ref[:].astype(dtype),
            b1_ref[:].astype(jnp.float32),
            1,
            dtype,
        )
    else:
        out = _chain_down(
            z,
            wres_ref[:].astype(dtype), bres_ref[:].astype(jnp.float32),
            w1_ref[:].astype(dtype), b1_ref[:].astype(jnp.float32),
            w2_ref[:].astype(dtype), b2_ref[:].astype(jnp.float32),
            w3_ref[:].astype(dtype), b3_ref[:].astype(jnp.float32),
            dtype,
        )
    out_ref[0] = out[:, HALO : HALO + t_blk].astype(out_ref.dtype)


def _conv_weights_t(p: Dict[str, Any]):
    """Flax Conv1d params -> transposed [Co, k*Cin] (tap-major rows match
    `_conv_cf`'s (t-d | t | t+d) sublane concat)."""
    k = p["kernel"]
    return k.reshape(-1, k.shape[-1]).T, p["bias"][:, None]


def downsample_params_to_tuple(p: Dict[str, Any]):
    """Flax Downsample params -> kernel weight arrays."""
    w1, b1 = _conv_weights_t(p["c1"])
    w2, b2 = _conv_weights_t(p["c2"])
    w3, b3 = _conv_weights_t(p["c3"])
    wres = p["down_res"]["kernel"].T
    bres = p["down_res"]["bias"][:, None]
    return wres, bres, w1, b1, w2, b2, w3, b3


def _run_down_kernel(
    x_t, weights, Co, dtype_name, t_blk, interpret, stem, out_len=None
):
    dtype = jnp.dtype(dtype_name)
    B, Cin, Tin = x_t.shape
    T = out_len if out_len is not None else Tin
    assert Tin >= T
    align = (-T) % t_blk
    W = t_blk + 2 * HALO
    wspec = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    if align == 0:
        # streaming single-read scheme (see `_stream_window`)
        nt = T // t_blk
        kernel = functools.partial(
            _down_kernel_stream, t_blk=t_blk, nt=nt, dtype=dtype, stem=stem
        )
        xs = x_t.astype(dtype) if dtype != x_t.dtype else x_t
        return pl.pallas_call(
            kernel,
            grid=(B, nt),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
            + [wspec(*w.shape) for w in weights],
            out_specs=pl.BlockSpec(
                (1, Co, t_blk), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, Co, T), dtype),
            scratch_shapes=[
                pltpu.VMEM((2, Cin, W), dtype),
                pltpu.SemaphoreType.DMA((2, 1)),
            ],
            interpret=interpret,
        )(xs, *weights)
    xp = jnp.pad(
        x_t[:, :, :T], ((0, 0), (0, 0), (HALO, HALO + align)), mode="edge"
    )
    if dtype != xp.dtype:
        xp = xp.astype(dtype)
    nt = (T + align) // t_blk
    kernel = functools.partial(
        _down_kernel, t_blk=t_blk, nt=nt, dtype=dtype, stem=stem
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [wspec(*w.shape) for w in weights],
        out_specs=pl.BlockSpec(
            (1, Co, t_blk), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Co, T + align), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, Cin, W), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, *weights)
    return out[:, :, :T]


@functools.partial(
    jax.jit, static_argnames=("dtype_name", "interpret", "t_blk", "out_len")
)
def fused_downsample_chain_t(
    x_t: jnp.ndarray,
    wres, bres, w1, b1, w2, b2, w3, b3,
    dtype_name: str = "bfloat16",
    t_blk: int = 8192,
    interpret: bool = False,
    out_len: int | None = None,
) -> jnp.ndarray:
    """Channels-first Downsample body (after decimation):
    [B, Cin, T] -> [B, Co, out_len or T]. ``x_t`` may be longer than
    ``out_len`` (untrimmed decimation output; the tail is never read)."""
    assert t_blk % 128 == 0
    return _run_down_kernel(
        x_t, (wres, bres, w1, b1, w2, b2, w3, b3), wres.shape[0],
        dtype_name, t_blk, interpret, stem=False, out_len=out_len,
    )


@functools.partial(
    jax.jit, static_argnames=("dtype_name", "interpret", "t_blk", "w_cin")
)
def fused_conv3_t(
    x_t: jnp.ndarray,
    w, b,
    dtype_name: str = "bfloat16",
    t_blk: int = 8192,
    interpret: bool = False,
    w_cin: int | None = None,
) -> jnp.ndarray:
    """Single k=3 d=1 conv, channels-first (the down-path stem):
    [B, Cin, T] -> [B, Co, T] with w [Co, 3*w_cin].

    Mosaic requires sublane-aligned DMA window shapes, so Cin must be a
    multiple of 8. Callers whose true channel count is not (the stem's 17)
    pass input rows zero-padded up to x_t's Cin and the true count as
    ``w_cin``; the weight columns are zero-padded here to match (zero
    input x zero weight — result unchanged)."""
    assert t_blk % 128 == 0
    Co = w.shape[0]
    B, Cin, T = x_t.shape
    if w_cin is None:
        w_cin = Cin
    pad_in = (-Cin) % 8  # callers ideally pre-pad (fused into src concat)
    if pad_in:
        x_t = jnp.concatenate(
            [x_t, jnp.zeros((B, pad_in, T), x_t.dtype)], axis=1
        )
        Cin += pad_in
    if w_cin != Cin:
        wt = w.reshape(Co, 3, w_cin)
        wt = jnp.concatenate(
            [wt, jnp.zeros((Co, 3, Cin - w_cin), w.dtype)], axis=2
        )
        w = wt.reshape(Co, 3 * Cin)
    zeros = jnp.zeros((1, 1), jnp.float32)
    return _run_down_kernel(
        x_t, (zeros, zeros, w, b, zeros, zeros, zeros, zeros), Co,
        dtype_name, t_blk, interpret, stem=True,
    )


def fused_upsample_chain(
    xu: jnp.ndarray,
    cond: jnp.ndarray,
    wconv, bconv, wfilm, bfilm, w5, b5,
    dtype_name: str = "bfloat16",
    t_blk: int = 8192,
    interpret: bool = False,
) -> jnp.ndarray:
    """Channels-last convenience wrapper: xu, cond [B, T, C] -> [B, T, Co]."""
    out = fused_upsample_chain_t(
        jnp.swapaxes(xu, 1, 2), jnp.swapaxes(cond, 1, 2),
        wconv, bconv, wfilm, bfilm, w5, b5,
        dtype_name=dtype_name, t_blk=t_blk, interpret=interpret,
    )
    return jnp.swapaxes(out, 1, 2)


# ---------------------------------------------------------------------------
# Backward kernels (training): the GAN step's waveform-rate U-Net backward
# under XLA costs ~3x the forward in HBM passes (measured 12.8 ms of a
# 56.6 ms step for up_4 alone at batch 16 x 2 s). Same streaming recipe as
# the forward: re-read the packed input window, recompute the chain's
# activations VMEM-resident, backpropagate in VMEM, and emit
#   - input-gradient core tiles (plus two 128-wide spill bands per tile —
#     the conv receptive field is 80 < 128 — shift-added by the wrapper),
#   - weight/bias gradients accumulated across grid steps in VMEM blocks
#     with constant index maps.
#
# Exactness scheme: the cotangent is core-masked before entering the tile
# (each output sample is owned by exactly one tile), so per-tile vjp
# contributions partition the true vjp of the windowed forward; windows
# need only the forward's own HALO margin because cotangent spread (<= RF)
# plus activation dependence (<= RF) stays inside 128. At sequence ends the
# edge-replicated halo's gradient fan-in folds onto the first/last sample
# (matching the forward's documented edge-replication approximation).
# ---------------------------------------------------------------------------


def _conv_cf_T(g, wTi, d, dtype):
    """Transpose (w.r.t. the input) of `_conv_cf`: scatter cotangent through
    the 3 taps. With wT rows packed (W_{+d}^T | W_0^T | W_{-d}^T) this IS
    `_conv_cf` with flipped tap order and no bias."""
    W = g.shape[1]
    gm = pltpu.roll(g, d, 1)  # g[:, t-d]
    gp = pltpu.roll(g, W - d, 1)  # g[:, t+d]
    gu = jnp.concatenate([gm, g, gp], axis=0)  # [3Co, W]
    return jnp.dot(wTi, gu.astype(dtype), preferred_element_type=jnp.float32)


def _taps_cf(h, d, dtype):
    """Stacked (t-d | t | t+d) views of a [C, W] tile (the conv operand)."""
    W = h.shape[1]
    hm = pltpu.roll(h, d, 1)
    hp = pltpu.roll(h, W - d, 1)
    return jnp.concatenate([hm, h, hp], axis=0).astype(dtype)  # [3C, W]


def upsample_bwd_weights(wconv, w5):
    """Precompute the transposed-tap weights the backward kernel needs.

    wconv [4, C, 3C] (rows Co, cols tap-major (t-d | t | t+d) * Cin) ->
    wconvT [4, C, 3C] with rows Cin and cols (W_{+d}^T | W_0^T | W_{-d}^T);
    w5 [Co, C] -> w5T [C, Co]."""
    C = wconv.shape[1]
    parts = []
    for j in range(4):
        w = wconv[j]  # [Co, 3C]
        wm, w0, wp = w[:, :C], w[:, C : 2 * C], w[:, 2 * C :]
        parts.append(jnp.concatenate([wp.T, w0.T, wm.T], axis=1))  # [C, 3Co]
    return jnp.stack(parts), w5.T


def _up_bwd_kernel(
    xz_hbm,  # [B, 2C, Tp] ANY — the forward's packed, edge-padded input
    gy_ref,  # [1, G, t_blk] VMEM — cotangent core tile (zero-padded rows)
    wconv_ref, bconv_ref, wfilm_ref, bfilm_ref, w5_ref,  # forward weights
    wconvT_ref, w5T_ref,  # transposed weights (see upsample_bwd_weights)
    gx_ref,  # [1, C, t_blk] input-grad core
    gc_ref,  # [1, C, t_blk] cond-grad core
    gxl_ref,  # [1, C, HALO] left spill band
    gxr_ref,  # [1, C, HALO] right spill band
    gcl_ref,  # [1, C, HALO] cond-grad left spill band
    gcr_ref,  # [1, C, HALO] cond-grad right spill band
    gwconv_ref, gbconv_ref, gwfilm_ref, gbfilm_ref, gw5_ref, gb5_ref,
    gbout_ref,  # accumulated weight grads (constant index maps)
    buf,  # VMEM scratch [2, 2C, W]
    sems,
    *,
    t_blk: int,
    nt: int,
    dtype,
    fold_k: int,
):
    W = t_blk + 2 * HALO
    b = pl.program_id(0)
    i = pl.program_id(1)
    step = b * nt + i
    slot = jax.lax.rem(step, 2)

    def dma(slot_idx, bb, ii):
        return pltpu.make_async_copy(
            xz_hbm.at[bb, :, pl.ds(ii * t_blk, W)],
            buf.at[slot_idx],
            sems.at[slot_idx],
        )

    @pl.when(step == 0)
    def _():
        dma(slot, b, i).start()

    dma(slot, b, i).wait()
    last = step == pl.num_programs(0) * nt - 1
    nb = jnp.where(i + 1 < nt, b, b + 1)
    ni = jnp.where(i + 1 < nt, i + 1, 0)

    @pl.when(jnp.logical_not(last))
    def _():
        dma(1 - slot, nb, ni).start()

    @pl.when(step == 0)
    def _():
        gwconv_ref[...] = jnp.zeros_like(gwconv_ref)
        gbconv_ref[...] = jnp.zeros_like(gbconv_ref)
        gwfilm_ref[...] = jnp.zeros_like(gwfilm_ref)
        gbfilm_ref[...] = jnp.zeros_like(gbfilm_ref)
        gw5_ref[...] = jnp.zeros_like(gw5_ref)
        gb5_ref[...] = jnp.zeros_like(gb5_ref)
        gbout_ref[...] = jnp.zeros_like(gbout_ref)

    wconv = [wconv_ref[j].astype(dtype) for j in range(4)]
    bconv = [bconv_ref[j].astype(jnp.float32) for j in range(4)]
    wconvT = [wconvT_ref[j].astype(dtype) for j in range(4)]
    wfilm = wfilm_ref[:].astype(dtype)
    bfilm = bfilm_ref[:].astype(jnp.float32)

    z = buf[slot]
    C = z.shape[0] // 2
    x = z[:C].astype(jnp.float32)
    c = z[C:].astype(dtype)

    # ---- recompute the forward chain, keeping what the backward needs ----
    films = jnp.dot(wfilm, c, preferred_element_type=jnp.float32) + bfilm
    s1, t1 = films[0:C], films[C : 2 * C]
    s2, t2 = films[2 * C : 3 * C], films[3 * C : 4 * C]

    def lrelu(h):
        return jnp.where(h > 0, h, 0.1 * h)

    def dlrelu(h):
        return jnp.where(h > 0, 1.0, 0.1)

    a0 = lrelu(x)
    hu1 = _taps_cf(a0, DILATIONS[0], dtype)
    u1 = jnp.dot(wconv[0], hu1, preferred_element_type=jnp.float32) + bconv[0]
    a1 = lrelu(u1)
    hu2 = _taps_cf(a1, DILATIONS[1], dtype)
    u2 = jnp.dot(wconv[1], hu2, preferred_element_type=jnp.float32) + bconv[1]
    r1 = u2 * s1 + t1 + x
    a2 = lrelu(r1)
    hu3 = _taps_cf(a2, DILATIONS[2], dtype)
    u3 = jnp.dot(wconv[2], hu3, preferred_element_type=jnp.float32) + bconv[2]
    a3 = lrelu(u3)
    hu4 = _taps_cf(a3, DILATIONS[3], dtype)
    u4 = jnp.dot(wconv[3], hu4, preferred_element_type=jnp.float32) + bconv[3]
    r2 = u4 * s2 + t2 + r1

    # ---- cotangent entry: core-masked gy, placed into the window frame ----
    co = 1 if fold_k else w5_ref.shape[0]
    gy_core = gy_ref[0, :co].astype(jnp.float32)  # [Co, t_blk]
    zpad = jnp.zeros((co, HALO), jnp.float32)
    gyw = jnp.concatenate([zpad, gy_core, zpad], axis=1)  # [Co, W]

    if fold_k:
        # out[t] = sum_j p[j, t + j - half] + bout; p = w5c @ r2 + b5c
        half = (fold_k - 1) // 2
        rows = []
        for j in range(fold_k):
            s = (j - half) % W
            rows.append(pltpu.roll(gyw, s, 1)[0:1])  # gyw row 0 is the wave
        g_p = jnp.concatenate(rows, axis=0)  # [k, W] masked by construction
        gbout_ref[...] += jnp.sum(gy_core[0]).reshape(1, 1)
        gw5_ref[...] += jnp.dot(
            g_p.astype(dtype), r2.T.astype(dtype),
            preferred_element_type=jnp.float32,
        )
        gb5_ref[...] += jnp.sum(g_p, axis=1, keepdims=True)
        g_r2 = jnp.dot(
            w5T_ref[:].astype(dtype), g_p.astype(dtype),
            preferred_element_type=jnp.float32,
        )
    else:
        g_y = gyw  # [Co, W]
        gw5_ref[...] += jnp.dot(
            g_y.astype(dtype), r2.T.astype(dtype),
            preferred_element_type=jnp.float32,
        )
        gb5_ref[...] += jnp.sum(g_y, axis=1, keepdims=True)
        pass  # no output bias when not folding (gbout stays zero)
        g_r2 = jnp.dot(
            w5T_ref[:].astype(dtype), g_y.astype(dtype),
            preferred_element_type=jnp.float32,
        )

    # ---- backward through the chain (all within the window) ----
    g_u4 = g_r2 * s2
    g_films_2 = g_r2 * u4  # d/ds2
    g_r1 = g_r2  # residual

    gw4 = jnp.dot(
        g_u4.astype(dtype), hu4.T, preferred_element_type=jnp.float32
    )
    g_a3 = _conv_cf_T(g_u4, wconvT[3], DILATIONS[3], dtype)
    g_u3 = g_a3 * dlrelu(u3)
    gw3 = jnp.dot(
        g_u3.astype(dtype), hu3.T, preferred_element_type=jnp.float32
    )
    g_a2 = _conv_cf_T(g_u3, wconvT[2], DILATIONS[2], dtype)
    g_r1 = g_r1 + g_a2 * dlrelu(r1)

    g_u2 = g_r1 * s1
    g_films_1 = g_r1 * u2
    g_x = g_r1  # residual into x

    gw2 = jnp.dot(
        g_u2.astype(dtype), hu2.T, preferred_element_type=jnp.float32
    )
    g_a1 = _conv_cf_T(g_u2, wconvT[1], DILATIONS[1], dtype)
    g_u1 = g_a1 * dlrelu(u1)
    gw1 = jnp.dot(
        g_u1.astype(dtype), hu1.T, preferred_element_type=jnp.float32
    )
    g_a0 = _conv_cf_T(g_u1, wconvT[0], DILATIONS[0], dtype)
    g_x = g_x + g_a0 * dlrelu(x)

    # FiLM: films rows are (s1 | t1 | s2 | t2)
    g_films = jnp.concatenate([g_films_1, g_r1, g_films_2, g_r2], axis=0)
    gwfilm_ref[...] += jnp.dot(
        g_films.astype(dtype), z[C:].T.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    gbfilm_ref[...] += jnp.sum(g_films, axis=1, keepdims=True)
    g_c = jnp.dot(
        wfilm.T, g_films.astype(dtype), preferred_element_type=jnp.float32
    )

    gwconv_ref[...] += jnp.stack([gw1, gw2, gw3, gw4])
    gbconv_ref[...] += jnp.stack(
        [
            jnp.sum(g_u1, axis=1, keepdims=True),
            jnp.sum(g_u2, axis=1, keepdims=True),
            jnp.sum(g_u3, axis=1, keepdims=True),
            jnp.sum(g_u4, axis=1, keepdims=True),
        ]
    )

    gx_ref[0] = g_x[:, HALO : HALO + t_blk]
    gc_ref[0] = g_c[:, HALO : HALO + t_blk]
    gxl_ref[0] = g_x[:, :HALO]
    gxr_ref[0] = g_x[:, HALO + t_blk :]
    gcl_ref[0] = g_c[:, :HALO]
    gcr_ref[0] = g_c[:, HALO + t_blk :]


def _spill_add(g_core, gl, gr, T):
    """Shift-add the per-tile spill bands into the core input-grad array.

    g_core [B, C, nt*t_blk]; gl/gr [B, C, nt*HALO]: tile i's left band
    covers positions [i*t_blk - HALO, i*t_blk), its right band
    [(i+1)*t_blk, (i+1)*t_blk + HALO). Bands beyond the sequence fold onto
    the first/last sample (the edge-replicated pad's gradient fan-in)."""
    B, C, Ta = g_core.shape
    nt = gl.shape[2] // HALO
    t_blk = Ta // nt
    g4 = g_core.reshape(B, C, nt, t_blk)
    gl4 = gl.reshape(B, C, nt, HALO)
    gr4 = gr.reshape(B, C, nt, HALO)
    if nt > 1:
        # zero-pad + add instead of .at[].add: XLA fuses the pads into ONE
        # read-add-write pass, while each DUS is a full-tensor copy
        # (~0.25 ms apiece at training shapes, profiled)
        g4 = (
            g4
            + jnp.pad(
                gl4[:, :, 1:],
                ((0, 0), (0, 0), (0, 1), (t_blk - HALO, 0)),
            )
            + jnp.pad(
                gr4[:, :, :-1],
                ((0, 0), (0, 0), (1, 0), (0, t_blk - HALO)),
            )
        )
    g = g4.reshape(B, C, Ta)
    # sequence edges: fold the outer bands (and any alignment overhang).
    # pad-based adds, not .at[].add — a single-position DUS still lowers to
    # a full-tensor copy, while XLA fuses these pads into one add pass
    # (VERDICT r3 item 6 / NOTES lever #1)
    head = jnp.sum(gl4[:, :, 0], axis=-1)
    tail = jnp.sum(gr4[:, :, -1], axis=-1)
    if Ta > T:
        tail = tail + jnp.sum(g[:, :, T:], axis=-1)
        g = g[:, :, :T]
    return (
        g
        + jnp.pad(head[:, :, None], ((0, 0), (0, 0), (0, T - 1)))
        + jnp.pad(tail[:, :, None], ((0, 0), (0, 0), (T - 1, 0)))
    )


@functools.partial(
    jax.jit, static_argnames=("dtype_name", "interpret", "t_blk", "fold_k")
)
def fused_upsample_chain_t_bwd(
    xu_t, cond_t, wconv, bconv, wfilm, bfilm, w5, b5,
    gy,
    dtype_name: str = "bfloat16",
    t_blk: int = 8192,
    interpret: bool = False,
    fold_k: int = 0,
):
    """Backward of :func:`fused_upsample_chain_t`.

    gy [B, Co, T] (Co = 1 when folding) -> grads for
    (xu_t, cond_t, wconv, bconv, wfilm, bfilm, w5, b5, bout)."""
    assert t_blk % 128 == 0
    dtype = jnp.dtype(dtype_name)
    B, C, T = xu_t.shape
    Co = w5.shape[0]
    align = (-T) % t_blk
    xz = jnp.concatenate([xu_t, cond_t], axis=1)
    xz = jnp.pad(xz, ((0, 0), (0, 0), (HALO, HALO + align)), mode="edge")
    if dtype != xz.dtype:
        xz = xz.astype(dtype)
    nt = (T + align) // t_blk
    W = t_blk + 2 * HALO
    # cotangent rows padded to the sublane granule (zero rows are inert)
    G = max(8, -(-Co // 8) * 8)
    gyp = jnp.pad(
        gy.astype(jnp.float32), ((0, 0), (0, G - Co), (0, align))
    )

    wconvT, w5T = upsample_bwd_weights(wconv, w5)

    kernel = functools.partial(
        _up_bwd_kernel, t_blk=t_blk, nt=nt, dtype=dtype, fold_k=fold_k
    )
    wspec = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    tspec = lambda ch, w: pl.BlockSpec(  # noqa: E731
        (1, ch, w), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM
    )
    out_shapes = (
        jax.ShapeDtypeStruct((B, C, T + align), jnp.float32),  # gx
        jax.ShapeDtypeStruct((B, C, T + align), jnp.float32),  # gc
        jax.ShapeDtypeStruct((B, C, nt * HALO), jnp.float32),  # gxl
        jax.ShapeDtypeStruct((B, C, nt * HALO), jnp.float32),  # gxr
        jax.ShapeDtypeStruct((B, C, nt * HALO), jnp.float32),  # gcl
        jax.ShapeDtypeStruct((B, C, nt * HALO), jnp.float32),  # gcr
        jax.ShapeDtypeStruct(wconv.shape, jnp.float32),
        jax.ShapeDtypeStruct(bconv.shape, jnp.float32),
        jax.ShapeDtypeStruct(wfilm.shape, jnp.float32),
        jax.ShapeDtypeStruct(bfilm.shape, jnp.float32),
        jax.ShapeDtypeStruct(w5.shape, jnp.float32),
        jax.ShapeDtypeStruct(b5.shape, jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )
    out_specs = [
        tspec(C, t_blk),
        tspec(C, t_blk),
        tspec(C, HALO),
        tspec(C, HALO),
        tspec(C, HALO),
        tspec(C, HALO),
        wspec(*wconv.shape),
        wspec(*bconv.shape),
        wspec(*wfilm.shape),
        wspec(*bfilm.shape),
        wspec(*w5.shape),
        wspec(*b5.shape),
        wspec(1, 1),
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            tspec(G, t_blk),
            wspec(*wconv.shape),
            wspec(*bconv.shape),
            wspec(*wfilm.shape),
            wspec(*bfilm.shape),
            wspec(*w5.shape),
            wspec(*wconvT.shape),
            wspec(*w5T.shape),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((2, 2 * C, W), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xz, gyp, wconv, bconv, wfilm, bfilm, w5, wconvT, w5T)
    (gx, gc, gxl, gxr, gcl, gcr,
     gwconv, gbconv, gwfilm, gbfilm, gw5, gb5, gbout) = outs
    gx = _spill_add(gx, gxl, gxr, T)
    gc = _spill_add(gc, gcl, gcr, T)
    return gx, gc, gwconv, gbconv, gwfilm, gbfilm, gw5, gb5, gbout


def down_bwd_weights(wres, w1, w2, w3):
    """Transposed-tap weights for the Downsample backward kernel."""

    def flipT(w):
        C = w.shape[1] // 3
        wm, w0, wp = w[:, :C], w[:, C : 2 * C], w[:, 2 * C :]
        return jnp.concatenate([wp.T, w0.T, wm.T], axis=1)

    return wres.T, flipT(w1), flipT(w2), flipT(w3)


def _down_bwd_kernel(
    x_hbm,  # [B, Cin, Tp] ANY — edge-padded forward input
    gy_ref,  # [1, G, t_blk] VMEM — cotangent core tile (rows padded to 8)
    wres_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
    wresT_ref, w1T_ref, w2T_ref, w3T_ref,
    gx_ref, gxl_ref, gxr_ref,
    gwres_ref, gbres_ref, gw1_ref, gb1_ref, gw2_ref, gb2_ref, gw3_ref, gb3_ref,
    buf,
    sems,
    *,
    t_blk: int,
    nt: int,
    dtype,
    stem: bool,
    co: int,
):
    W = t_blk + 2 * HALO
    b = pl.program_id(0)
    i = pl.program_id(1)
    step = b * nt + i
    slot = jax.lax.rem(step, 2)

    def dma(slot_idx, bb, ii):
        return pltpu.make_async_copy(
            x_hbm.at[bb, :, pl.ds(ii * t_blk, W)],
            buf.at[slot_idx],
            sems.at[slot_idx],
        )

    @pl.when(step == 0)
    def _():
        dma(slot, b, i).start()

    dma(slot, b, i).wait()
    last = step == pl.num_programs(0) * nt - 1
    nb = jnp.where(i + 1 < nt, b, b + 1)
    ni = jnp.where(i + 1 < nt, i + 1, 0)

    @pl.when(jnp.logical_not(last))
    def _():
        dma(1 - slot, nb, ni).start()

    @pl.when(step == 0)
    def _():
        gwres_ref[...] = jnp.zeros_like(gwres_ref)
        gbres_ref[...] = jnp.zeros_like(gbres_ref)
        gw1_ref[...] = jnp.zeros_like(gw1_ref)
        gb1_ref[...] = jnp.zeros_like(gb1_ref)
        gw2_ref[...] = jnp.zeros_like(gw2_ref)
        gb2_ref[...] = jnp.zeros_like(gb2_ref)
        gw3_ref[...] = jnp.zeros_like(gw3_ref)
        gb3_ref[...] = jnp.zeros_like(gb3_ref)

    x = buf[slot].astype(jnp.float32)
    gy_core = gy_ref[0, :co].astype(jnp.float32)  # [Co, t_blk]
    zpad = jnp.zeros((co, HALO), jnp.float32)
    gym = jnp.concatenate([zpad, gy_core, zpad], axis=1)  # [Co, W]

    def dlrelu(h):
        return jnp.where(h > 0, 1.0, 0.1)

    if stem:
        hu = _taps_cf(x, 1, dtype)
        gw1_ref[...] += jnp.dot(
            gym.astype(dtype), hu.T, preferred_element_type=jnp.float32
        )
        gb1_ref[...] += jnp.sum(gym, axis=1, keepdims=True)
        g_x = _conv_cf_T(gym, w1T_ref[:].astype(dtype), 1, dtype)
    else:
        def lrelu(h):
            return jnp.where(h > 0, h, 0.1 * h)

        w1 = w1_ref[:].astype(dtype)
        w2 = w2_ref[:].astype(dtype)
        a0 = lrelu(x)
        hu1 = _taps_cf(a0, DILATIONS_DOWN[0], dtype)
        # recompute with biases — they shift the lrelu kinks and the values
        # feeding the later convs, exactly as the forward `_chain_down`
        u1 = (
            jnp.dot(w1, hu1, preferred_element_type=jnp.float32)
            + b1_ref[:].astype(jnp.float32)
        )
        a1 = lrelu(u1)
        hu2 = _taps_cf(a1, DILATIONS_DOWN[1], dtype)
        u2 = (
            jnp.dot(w2, hu2, preferred_element_type=jnp.float32)
            + b2_ref[:].astype(jnp.float32)
        )
        a2 = lrelu(u2)
        hu3 = _taps_cf(a2, DILATIONS_DOWN[2], dtype)

        g_u3 = gym
        gw3_ref[...] += jnp.dot(
            g_u3.astype(dtype), hu3.T, preferred_element_type=jnp.float32
        )
        gb3_ref[...] += jnp.sum(g_u3, axis=1, keepdims=True)
        g_a2 = _conv_cf_T(g_u3, w3T_ref[:].astype(dtype), DILATIONS_DOWN[2], dtype)
        g_u2 = g_a2 * dlrelu(u2)
        gw2_ref[...] += jnp.dot(
            g_u2.astype(dtype), hu2.T, preferred_element_type=jnp.float32
        )
        gb2_ref[...] += jnp.sum(g_u2, axis=1, keepdims=True)
        g_a1 = _conv_cf_T(g_u2, w2T_ref[:].astype(dtype), DILATIONS_DOWN[1], dtype)
        g_u1 = g_a1 * dlrelu(u1)
        gw1_ref[...] += jnp.dot(
            g_u1.astype(dtype), hu1.T, preferred_element_type=jnp.float32
        )
        gb1_ref[...] += jnp.sum(g_u1, axis=1, keepdims=True)
        g_a0 = _conv_cf_T(g_u1, w1T_ref[:].astype(dtype), DILATIONS_DOWN[0], dtype)
        # residual 1x1: res = wres @ x
        gwres_ref[...] += jnp.dot(
            gym.astype(dtype), x.T.astype(dtype),
            preferred_element_type=jnp.float32,
        )
        gbres_ref[...] += jnp.sum(gym, axis=1, keepdims=True)
        g_x = jnp.dot(
            wresT_ref[:].astype(dtype), gym.astype(dtype),
            preferred_element_type=jnp.float32,
        ) + g_a0 * dlrelu(x)

    gx_ref[0] = g_x[:, HALO : HALO + t_blk]
    gxl_ref[0] = g_x[:, :HALO]
    gxr_ref[0] = g_x[:, HALO + t_blk :]


def _run_down_bwd(
    x_t, gy, weights_fwd, weightsT, out_weight_shapes, dtype_name, t_blk,
    interpret, stem,
):
    dtype = jnp.dtype(dtype_name)
    B, Cin, T = x_t.shape
    Co = gy.shape[1]
    align = (-T) % t_blk
    xp = jnp.pad(x_t, ((0, 0), (0, 0), (HALO, HALO + align)), mode="edge")
    if dtype != xp.dtype:
        xp = xp.astype(dtype)
    nt = (T + align) // t_blk
    W = t_blk + 2 * HALO
    G = max(8, -(-Co // 8) * 8)
    gyp = jnp.pad(gy.astype(jnp.float32), ((0, 0), (0, G - Co), (0, align)))

    kernel = functools.partial(
        _down_bwd_kernel, t_blk=t_blk, nt=nt, dtype=dtype, stem=stem, co=Co
    )
    wspec = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    tspec = lambda ch, w: pl.BlockSpec(  # noqa: E731
        (1, ch, w), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM
    )
    out_shapes = (
        jax.ShapeDtypeStruct((B, Cin, T + align), jnp.float32),
        jax.ShapeDtypeStruct((B, Cin, nt * HALO), jnp.float32),
        jax.ShapeDtypeStruct((B, Cin, nt * HALO), jnp.float32),
    ) + tuple(jax.ShapeDtypeStruct(s, jnp.float32) for s in out_weight_shapes)
    out_specs = [
        tspec(Cin, t_blk), tspec(Cin, HALO), tspec(Cin, HALO),
    ] + [wspec(*s) for s in out_weight_shapes]
    outs = pl.pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), tspec(G, t_blk)]
        + [wspec(*w.shape) for w in weights_fwd]
        + [wspec(*w.shape) for w in weightsT],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((2, Cin, W), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, gyp, *weights_fwd, *weightsT)
    gx = _spill_add(outs[0], outs[1], outs[2], T)
    return (gx,) + outs[3:]


@functools.partial(
    jax.jit, static_argnames=("dtype_name", "interpret", "t_blk")
)
def fused_downsample_chain_t_bwd(
    x_t, wres, bres, w1, b1, w2, b2, w3, b3, gy,
    dtype_name: str = "bfloat16",
    t_blk: int = 8192,
    interpret: bool = False,
):
    """Backward of :func:`fused_downsample_chain_t`: gy [B, Co, T] ->
    (gx, gwres, gbres, gw1, gb1, gw2, gb2, gw3, gb3)."""
    assert t_blk % 128 == 0
    wresT, w1T, w2T, w3T = down_bwd_weights(wres, w1, w2, w3)
    gx, gwres, gbres, gw1, gb1, gw2, gb2, gw3, gb3 = _run_down_bwd(
        x_t, gy,
        (wres, w1, b1, w2, b2, w3),
        (wresT, w1T, w2T, w3T),
        (wres.shape, bres.shape, w1.shape, b1.shape, w2.shape, b2.shape,
         w3.shape, b3.shape),
        dtype_name, t_blk, interpret, stem=False,
    )
    return gx, gwres, gbres, gw1, gb1, gw2, gb2, gw3, gb3


@functools.partial(
    jax.jit, static_argnames=("dtype_name", "interpret", "t_blk", "w_cin")
)
def fused_conv3_t_bwd(
    x_t, w, b, gy,
    dtype_name: str = "bfloat16",
    t_blk: int = 8192,
    interpret: bool = False,
    w_cin: int | None = None,
):
    """Backward of :func:`fused_conv3_t` (the down-path stem conv):
    gy [B, Co, T] -> (gx [B, Cin_padded, T], gw [Co, 3*w_cin], gb).

    Channel padding mirrors the forward: gx rows beyond the true input
    channels are zero (zero weight columns), and the weight gradient is
    sliced back to the caller's ``w_cin`` columns."""
    assert t_blk % 128 == 0
    Co = w.shape[0]
    B, Cin, T = x_t.shape
    if w_cin is None:
        w_cin = Cin
    pad_in = (-Cin) % 8
    if pad_in:
        x_t = jnp.concatenate(
            [x_t, jnp.zeros((B, pad_in, T), x_t.dtype)], axis=1
        )
        Cin += pad_in
    wp = w
    if w_cin != Cin:
        wt = w.reshape(Co, 3, w_cin)
        wt = jnp.concatenate(
            [wt, jnp.zeros((Co, 3, Cin - w_cin), w.dtype)], axis=2
        )
        wp = wt.reshape(Co, 3 * Cin)
    wm, w0, wpl = wp[:, :Cin], wp[:, Cin : 2 * Cin], wp[:, 2 * Cin :]
    w1T = jnp.concatenate([wpl.T, w0.T, wm.T], axis=1)  # [Cin, 3Co]
    zeros = jnp.zeros((1, 1), jnp.float32)
    gx, _, _, gw, gb, _, _, _, _ = _run_down_bwd(
        x_t, gy,
        (zeros, wp, b, zeros, zeros, zeros),
        (zeros, w1T, zeros, zeros),
        ((1, 1), (1, 1), wp.shape, b.shape, (1, 1), (1, 1), (1, 1), (1, 1)),
        dtype_name, t_blk, interpret, stem=True,
    )
    if w_cin != Cin:
        gw = gw.reshape(Co, 3, Cin)[:, :, :w_cin].reshape(Co, 3 * w_cin)
    gx = gx[:, : Cin - pad_in] if pad_in else gx
    return gx, gw, gb


# ---------------------------------------------------------------------------
# Differentiable entry points: forward = the fused serving kernels, backward
# = the fused backward kernels above. These make the whole waveform-rate
# U-Net trainable THROUGH the Pallas path (the GAN step's dominant cost
# under XLA), with the interp/pack glue between stages left to JAX autodiff.
# ---------------------------------------------------------------------------


def _bwd_blk(t_blk: int) -> int:
    """The backward kernels keep ~2.5x the forward's live VMEM (tap stacks +
    recomputed activations + gradient flows): halve the tile (and re-round
    to the 128 alignment — divisor-aware forward tiles such as 3200 are
    not powers of two)."""
    return max(128, (t_blk // 2) // 128 * 128)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def up_chain_vjp(dtype_name, t_blk, interpret, fold_k,
                 xu, cond, wconv, bconv, wfilm, bfilm, w5, b5, bout):
    return fused_upsample_chain_t(
        xu, cond, wconv, bconv, wfilm, bfilm, w5, b5,
        dtype_name=dtype_name, t_blk=t_blk, interpret=interpret,
        fold_k=fold_k, bout=bout,
    )


def _up_chain_fwd(dtype_name, t_blk, interpret, fold_k,
                  xu, cond, wconv, bconv, wfilm, bfilm, w5, b5, bout):
    out = up_chain_vjp(
        dtype_name, t_blk, interpret, fold_k,
        xu, cond, wconv, bconv, wfilm, bfilm, w5, b5, bout,
    )
    return out, (xu, cond, wconv, bconv, wfilm, bfilm, w5, b5)


def _up_chain_bwd(dtype_name, t_blk, interpret, fold_k, res, g):
    xu, cond, wconv, bconv, wfilm, bfilm, w5, b5 = res
    gx, gc, gwconv, gbconv, gwfilm, gbfilm, gw5, gb5, gbout = (
        fused_upsample_chain_t_bwd(
            xu, cond, wconv, bconv, wfilm, bfilm, w5, b5, g,
            dtype_name=dtype_name, t_blk=_bwd_blk(t_blk),
            interpret=interpret, fold_k=fold_k,
        )
    )
    return (
        gx.astype(xu.dtype), gc.astype(cond.dtype),
        gwconv.astype(wconv.dtype), gbconv.astype(bconv.dtype),
        gwfilm.astype(wfilm.dtype), gbfilm.astype(bfilm.dtype),
        gw5.astype(w5.dtype), gb5.astype(b5.dtype),
        gbout.astype(jnp.float32),
    )


up_chain_vjp.defvjp(_up_chain_fwd, _up_chain_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def down_chain_vjp(dtype_name, t_blk, interpret,
                   z, wres, bres, w1, b1, w2, b2, w3, b3):
    return fused_downsample_chain_t(
        z, wres, bres, w1, b1, w2, b2, w3, b3,
        dtype_name=dtype_name, t_blk=t_blk, interpret=interpret,
    )


def _down_chain_fwd(dtype_name, t_blk, interpret,
                    z, wres, bres, w1, b1, w2, b2, w3, b3):
    out = down_chain_vjp(
        dtype_name, t_blk, interpret, z, wres, bres, w1, b1, w2, b2, w3, b3
    )
    return out, (z, wres, bres, w1, b1, w2, b2, w3, b3)


def _down_chain_bwd(dtype_name, t_blk, interpret, res, g):
    z, wres, bres, w1, b1, w2, b2, w3, b3 = res
    gz, gwres, gbres, gw1, gb1, gw2, gb2, gw3, gb3 = (
        fused_downsample_chain_t_bwd(
            z, wres, bres, w1, b1, w2, b2, w3, b3, g.astype(jnp.float32),
            dtype_name=dtype_name, t_blk=_bwd_blk(t_blk),
            interpret=interpret,
        )
    )
    return (
        gz.astype(z.dtype), gwres.astype(wres.dtype), gbres.astype(bres.dtype),
        gw1.astype(w1.dtype), gb1.astype(b1.dtype),
        gw2.astype(w2.dtype), gb2.astype(b2.dtype),
        gw3.astype(w3.dtype), gb3.astype(b3.dtype),
    )


down_chain_vjp.defvjp(_down_chain_fwd, _down_chain_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def stem_conv_vjp(dtype_name, t_blk, interpret, w_cin, x, w, b):
    return fused_conv3_t(
        x, w, b, dtype_name=dtype_name, t_blk=t_blk, interpret=interpret,
        w_cin=w_cin,
    )


def _stem_fwd(dtype_name, t_blk, interpret, w_cin, x, w, b):
    return stem_conv_vjp(dtype_name, t_blk, interpret, w_cin, x, w, b), (x, w, b)


def _stem_bwd(dtype_name, t_blk, interpret, w_cin, res, g):
    x, w, b = res
    gx, gw, gb = fused_conv3_t_bwd(
        x, w, b, g.astype(jnp.float32),
        dtype_name=dtype_name, t_blk=_bwd_blk(t_blk), interpret=interpret,
        w_cin=w_cin,
    )
    return gx.astype(x.dtype), gw.astype(w.dtype), gb.astype(b.dtype)


stem_conv_vjp.defvjp(_stem_fwd, _stem_bwd)
