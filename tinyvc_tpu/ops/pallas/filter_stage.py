"""Pallas TPU kernel: fused FilterNet Upsample conv chain.

The Upsample body (reference `module/tinyvc/decoder.py:160-190`) is four
dilated k=3 convs, two FiLM modulations, two residual adds, and an output
1x1 — under XLA each op round-trips its [B, T, C] activation through HBM
(~12 tensor passes per stage at waveform rate). This kernel keeps the whole
chain VMEM-resident: each grid step sees one time tile plus its neighbour
tiles (three block-aligned views — Mosaic cannot slice a 24-lane dim, so
halos come from whole neighbour blocks), assembles tile+halo in VMEM, runs
the chain with ``pltpu.roll`` for the conv taps, and writes only the output
tile.

Roll wrap-around garbage corrupts at most sum(2d) = 80 edge rows of the
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
HALO = 128  # > 2*(1+3+9+27) = 80, multiple of 8


def _chain(x, c, wconv, bconv, wfilm, bfilm, w5, b5, dtype):
    """The Upsample body on a [W, C] tile. wconv: [4, 3C, C];
    wfilm: [4, C, C] as (scale1, shift1, scale2, shift2)."""

    def conv(h, wi, bi, d):
        hm = pltpu.roll(h, d, 0)
        hp = pltpu.roll(h, h.shape[0] - d, 0)  # negative shifts unsupported
        hu = jnp.concatenate([hm, h, hp], axis=-1)
        return (
            jnp.dot(hu, wi, preferred_element_type=jnp.float32).astype(dtype) + bi
        )

    def film(h, j):
        scale = (
            jnp.dot(c, wfilm[2 * j], preferred_element_type=jnp.float32).astype(dtype)
            + bfilm[2 * j]
        )
        shift = (
            jnp.dot(c, wfilm[2 * j + 1], preferred_element_type=jnp.float32).astype(
                dtype
            )
            + bfilm[2 * j + 1]
        )
        return h * scale + shift

    def lrelu(h):
        return jnp.where(h > 0, h, 0.1 * h)

    res = x
    h = lrelu(x)
    h = conv(h, wconv[0], bconv[0], DILATIONS[0])
    h = lrelu(h)
    h = conv(h, wconv[1], bconv[1], DILATIONS[1])
    h = film(h, 0)
    h = h + res
    res = h
    h = lrelu(h)
    h = conv(h, wconv[2], bconv[2], DILATIONS[2])
    h = lrelu(h)
    h = conv(h, wconv[3], bconv[3], DILATIONS[3])
    h = film(h, 1)
    h = h + res
    return jnp.dot(h, w5, preferred_element_type=jnp.float32).astype(dtype) + b5


def _assemble(prev_ref, cur_ref, next_ref, t_blk):
    """[tile + halo] from three neighbour blocks: [W, C]."""
    return jnp.concatenate(
        [prev_ref[0, t_blk - HALO :], cur_ref[0], next_ref[0, :HALO]], axis=0
    )


def _kernel(
    xu_prev, xu_cur, xu_next,  # [1, t_blk, C] VMEM views
    c_prev, c_cur, c_next,
    wconv_ref,  # [4, 3C, C]
    bconv_ref,  # [4, 1, C]
    wfilm_ref,  # [4, C, C]
    bfilm_ref,  # [4, 1, C]
    w5_ref,  # [C, Co]
    b5_ref,  # [1, Co]
    out_ref,  # [1, t_blk, Co]
    *,
    t_blk: int,
    dtype,
):
    x = _assemble(xu_prev, xu_cur, xu_next, t_blk).astype(dtype)
    c = _assemble(c_prev, c_cur, c_next, t_blk).astype(dtype)
    wconv = [wconv_ref[j].astype(dtype) for j in range(4)]
    bconv = [bconv_ref[j].astype(dtype) for j in range(4)]
    wfilm = [wfilm_ref[j].astype(dtype) for j in range(4)]
    bfilm = [bfilm_ref[j].astype(dtype) for j in range(4)]
    out = _chain(
        x, c, wconv, bconv, wfilm, bfilm,
        w5_ref[:].astype(dtype), b5_ref[:].astype(dtype), dtype,
    )
    out_ref[0] = out[HALO : HALO + t_blk].astype(out_ref.dtype)


def upsample_params_to_tuple(p: Dict[str, Any]):
    """Flax Upsample params -> stacked kernel weight arrays."""
    wconv = jnp.stack(
        [
            p[name]["kernel"].reshape(-1, p[name]["kernel"].shape[-1])
            for name in ("c1", "c2", "c3", "c4")
        ]
    )  # [4, 3C, C]
    bconv = jnp.stack([p[name]["bias"] for name in ("c1", "c2", "c3", "c4")])[
        :, None, :
    ]
    wfilm = jnp.stack(
        [
            p["film1"]["to_scale"]["kernel"],
            p["film1"]["to_shift"]["kernel"],
            p["film2"]["to_scale"]["kernel"],
            p["film2"]["to_shift"]["kernel"],
        ]
    )
    bfilm = jnp.stack(
        [
            p["film1"]["to_scale"]["bias"],
            p["film1"]["to_shift"]["bias"],
            p["film2"]["to_scale"]["bias"],
            p["film2"]["to_shift"]["bias"],
        ]
    )[:, None, :]
    w5 = p["c5"]["kernel"]
    b5 = p["c5"]["bias"][None, :]
    return wconv, bconv, wfilm, bfilm, w5, b5


@functools.partial(jax.jit, static_argnames=("dtype_name", "interpret", "t_blk"))
def fused_upsample_chain(
    xu: jnp.ndarray,
    cond: jnp.ndarray,
    wconv, bconv, wfilm, bfilm, w5, b5,
    dtype_name: str = "float32",
    t_blk: int = 4096,
    interpret: bool = False,
) -> jnp.ndarray:
    """xu, cond: [B, T, C] (already upsampled) -> [B, T, Co].

    Equivalent to the Upsample body after its interpolation step.
    """
    dtype = jnp.dtype(dtype_name)
    B, T, C = xu.shape
    Co = w5.shape[-1]
    # edge-pad a whole block on each side (provides prev/next for the edge
    # tiles) plus tail alignment
    align = (-T) % t_blk
    xu_p = jnp.pad(xu, ((0, 0), (t_blk, t_blk + align), (0, 0)), mode="edge")
    cond_p = jnp.pad(cond, ((0, 0), (t_blk, t_blk + align), (0, 0)), mode="edge")
    nt = (T + align) // t_blk

    kernel = functools.partial(_kernel, t_blk=t_blk, dtype=dtype)
    blk = lambda off: pl.BlockSpec(  # noqa: E731
        (1, t_blk, C), lambda b, i, off=off: (b, i + off, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=[
            blk(0), blk(1), blk(2),  # xu prev/cur/next
            blk(0), blk(1), blk(2),  # cond prev/cur/next
            pl.BlockSpec((4, wconv.shape[1], C), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 1, C), lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, C, C), lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 1, C), lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Co), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Co), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t_blk, Co), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T + align, Co), jnp.float32),
        interpret=interpret,
    )(xu_p, xu_p, xu_p, cond_p, cond_p, cond_p, wconv, bconv, wfilm, bfilm, w5, b5)
    return out[:, :T]
