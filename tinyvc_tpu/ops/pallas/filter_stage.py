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
    """
    assert t_blk % 128 == 0, "time tiles must stay 128-aligned"
    dtype = jnp.dtype(dtype_name)
    B, C, T = xu_t.shape
    Co = 1 if fold_k else w5.shape[0]
    if bout is None:
        bout = jnp.zeros((1, 1), jnp.float32)
    align = (-T) % t_blk
    xz = jnp.concatenate([xu_t, cond_t], axis=1)  # [B, 2C, T]
    xz = jnp.pad(xz, ((0, 0), (0, 0), (HALO, HALO + align)), mode="edge")
    if dtype != xz.dtype:
        xz = xz.astype(dtype)
    nt = (T + align) // t_blk
    W = t_blk + 2 * HALO

    kernel = functools.partial(
        _kernel, t_blk=t_blk, nt=nt, dtype=dtype, fold_k=fold_k
    )
    wspec = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            wspec(4, C, 3 * C),
            wspec(4, C, 1),
            wspec(4 * C, C),
            wspec(4 * C, 1),
            wspec(*w5.shape),
            wspec(*b5.shape),
            wspec(1, 1),
        ],
        out_specs=pl.BlockSpec(
            (1, Co, t_blk), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM
        ),
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
    x_t, weights, Co, dtype_name, t_blk, interpret, stem
):
    dtype = jnp.dtype(dtype_name)
    B, Cin, T = x_t.shape
    align = (-T) % t_blk
    xp = jnp.pad(x_t, ((0, 0), (0, 0), (HALO, HALO + align)), mode="edge")
    if dtype != xp.dtype:
        xp = xp.astype(dtype)
    nt = (T + align) // t_blk
    W = t_blk + 2 * HALO
    kernel = functools.partial(
        _down_kernel, t_blk=t_blk, nt=nt, dtype=dtype, stem=stem
    )
    wspec = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM
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
    jax.jit, static_argnames=("dtype_name", "interpret", "t_blk")
)
def fused_downsample_chain_t(
    x_t: jnp.ndarray,
    wres, bres, w1, b1, w2, b2, w3, b3,
    dtype_name: str = "bfloat16",
    t_blk: int = 8192,
    interpret: bool = False,
) -> jnp.ndarray:
    """Channels-first Downsample body (after decimation):
    [B, Cin, T] -> [B, Co, T]."""
    assert t_blk % 128 == 0
    return _run_down_kernel(
        x_t, (wres, bres, w1, b1, w2, b2, w3, b3), wres.shape[0],
        dtype_name, t_blk, interpret, stem=False,
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
