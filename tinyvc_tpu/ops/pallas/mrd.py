"""Fused MRD discriminator chain: one Pallas kernel per resolution.

Replaces ~30 XLA ops per resolution (six NCHW convs + glue, measured
~14.7 ms of the post-join GAN step at ~2 % MXU — per-op fixed cost, not
MACs) with a single VMEM-resident kernel evaluating the whole conv stack
in the phase-plane-major layout of `ops/mrd_planes.py`. Every conv tap is
a ``[cout, cin] @ [cin, rows*Wp]`` MXU matmul over a contiguous flat
slice — no gathers, no strided slices (the blocker that killed previous
fused-MRD attempts; see NOTES_NEXT_ROUND.md).

Feature maps are stored 2D ``[C, S * (G+4) * Wp]`` (channels on sublanes,
flattened plane blocks on lanes); plane/tap reads are lane-offset slices
(one vector rotate each — accepted; still orders of magnitude fewer ops
than the XLA lowering).

Faithful-quirk mode only (the reference discards its `F.leaky_relu`,
`discriminator.py:104`, so the chain is LINEAR); `DiscriminatorR` with
``mrd_fixed_activation=True`` falls back to the lax lowering.

Backward (`mrd_chain` is a custom_vjp) runs the exact transpose chain in
two kernels: a dx sweep (top-down, emitting the per-layer masked
cotangents) and a dW/db sweep (per-tap ``[cout, L] @ [L, cin]`` dots,
accumulated across the batch grid in revisited output blocks).
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mrd_planes import MrdPlan, _tap_slices


def _dtype(name: str):
    return jnp.bfloat16 if name == "bfloat16" else jnp.float32


def _mask_plane(L: int, Wp: int, W: int, valid_rows: int):
    """In-kernel 0/1 mask [1, L] for one output plane (valid rows, data
    cols). Built from iota arithmetic — Pallas kernels cannot capture
    array constants."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    row = idx // Wp
    col = idx - row * Wp
    ok = (row < valid_rows) & (col >= 1) & (col <= W)
    return ok.astype(jnp.float32)


def _mask_full(lp, plan):
    """In-kernel 0/1 mask [1, s_out*blk_out]: halo rows, invalid rows and
    pad columns of every output plane zeroed (closed-form valid_q)."""
    Wp, W = plan.Wp, plan.W
    blk = (lp.g_out + 4) * Wp
    F = lp.s_out * blk
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, F), 1)
    plane = idx // blk
    within = idx - plane * blk
    row = within // Wp - 2
    col = within - (row + 2) * Wp
    vq = jnp.where(
        plane < lp.h_out,
        (lp.h_out - plane + lp.s_out - 1) // lp.s_out,
        0,
    )
    ok = (row >= 0) & (row < vq) & (col >= 1) & (col <= W)
    return ok.astype(jnp.float32)


def _fwd_kernel(plan: MrdPlan, dtype, spec_ref, *refs):
    """refs = w_0..w_L, b_0..b_L, out_0..out_L (flat 2D buffers)."""
    nl = len(plan.layers)
    ws = refs[:nl]
    bs = refs[nl : 2 * nl]
    outs = refs[2 * nl :]
    Wp = plan.Wp

    src = spec_ref[0].astype(dtype)  # [1 or C, S0*(G0+4)*Wp]
    for li, lp in enumerate(plan.layers):
        taps = _tap_slices(lp, Wp)
        L = lp.g_out * Wp
        blk_in = (lp.g_in + 4) * Wp
        blk_out = (lp.g_out + 4) * Wp
        w = ws[li][...]  # [kh*kw, cin, cout]
        b = bs[li][...]  # [1, cout]
        planes = []
        for q in range(lp.s_out):
            acc = jnp.zeros((lp.cout, L), jnp.float32)
            for t_i, (phi, s0) in enumerate(taps[q]):
                off = phi * blk_in + s0
                xs = src[:, off : off + L]
                if lp.cin == 1:
                    # cast BEFORE inserting the minor dim: Mosaic only
                    # reshapes minor-dim inserts on 32-bit types
                    acc = acc + w[t_i, :, 0].astype(jnp.float32)[
                        :, None
                    ] * xs.astype(jnp.float32)
                else:
                    # canonical [cout, cin] @ [cin, L] (Mosaic's
                    # transposed-operand dot paths miscompile on bf16)
                    acc = acc + jax.lax.dot_general(
                        w[t_i],
                        xs,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            acc = acc + b.reshape(-1, 1).astype(jnp.float32)
            mask = _mask_plane(L, Wp, plan.W, lp.valid_out[q])
            planes.append((acc * mask).astype(dtype))
        # assemble [cout, s_out * blk_out]: halo rows are zeros
        zero = jnp.zeros((lp.cout, 2 * Wp), dtype)
        tail = jnp.zeros(
            (lp.cout, blk_out - 2 * Wp - L), dtype
        )
        row = jnp.concatenate(
            [jnp.concatenate([zero, p, tail], axis=1) for p in planes],
            axis=1,
        )  # [cout, s_out * blk_out]
        outs[li][0] = row
        src = row


def _out_shapes(plan: MrdPlan, B: int, dtype):
    shapes = []
    for lp in plan.layers:
        shapes.append(
            jax.ShapeDtypeStruct(
                (B, lp.cout, lp.s_out * (lp.g_out + 4) * plan.Wp), dtype
            )
        )
    return shapes


def _pack_w(w, transpose=False):
    kh, kw, cin, cout = w.shape
    p = w.reshape(kh * kw, cin, cout)
    return p.transpose(0, 2, 1) if transpose else p


def _fwd_pallas(spec_pm, ws, bs, plan: MrdPlan, dtype_name, interpret):
    """spec_pm [B, 1, S0, (G0+4)*Wp] -> list of flat fmaps
    [B, cout, s_out*(g_out+4)*Wp]."""
    B = spec_pm.shape[0]
    dt = _dtype(dtype_name)
    spec_flat = spec_pm.reshape(B, 1, -1)
    nl = len(plan.layers)
    w_in = [_pack_w(w, transpose=True).astype(dt) for w in ws]
    b_in = [b.reshape(1, -1).astype(jnp.float32) for b in bs]

    in_specs = [
        pl.BlockSpec(
            (1, 1, spec_flat.shape[-1]), lambda b_: (b_, 0, 0),
            memory_space=pltpu.VMEM,
        )
    ]
    for w in w_in:
        in_specs.append(
            pl.BlockSpec(w.shape, lambda b_: (0,) * w.ndim,
                         memory_space=pltpu.VMEM)
        )
    for b in b_in:
        in_specs.append(
            pl.BlockSpec(b.shape, lambda b_: (0, 0),
                         memory_space=pltpu.VMEM)
        )
    out_specs = [
        pl.BlockSpec(
            (1,) + s.shape[1:], lambda b_: (b_, 0, 0),
            memory_space=pltpu.VMEM,
        )
        for s in _out_shapes(plan, B, dt)
    ]
    fn = pl.pallas_call(
        functools.partial(_fwd_kernel, plan, dt),
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=_out_shapes(plan, B, dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=interpret,
    )
    return list(fn(spec_flat, *w_in, *b_in))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def mrd_chain(spec_pm, ws, bs, plan: MrdPlan, dtype_name="bfloat16",
              interpret=False):
    """Fused MRD conv chain. spec_pm [B, 1, S0, (G0+4)*Wp]; ws/bs are
    tuples of effective (weight-normalised) HWIO weights and biases.

    Returns the list of every layer's output as FLAT plane-major arrays
    ``[B, cout, s_out*(g_out+4)*Wp]`` (last entry = logits). Use
    ``plan.valid_count(i)`` / ``plan.out_mask(i)`` for reductions.
    """
    return _fwd_pallas(spec_pm, ws, bs, plan, dtype_name, interpret)


def _mrd_fwd(spec_pm, ws, bs, plan, dtype_name, interpret):
    outs = _fwd_pallas(spec_pm, ws, bs, plan, dtype_name, interpret)
    return outs, (spec_pm, tuple(ws), tuple(outs))


def _bwd_kernel_dx(plan: MrdPlan, dtype, *refs):
    """Top-down transpose sweep. refs = cot_0..cot_L (flat, bf16),
    w_0..w_L, dspec_out, dy_0..dy_L (masked accumulated cotangents)."""
    nl = len(plan.layers)
    cots = refs[:nl]
    ws = refs[nl : 2 * nl]
    dspec_ref = refs[2 * nl]
    dy_outs = refs[2 * nl + 1 :]
    Wp = plan.Wp

    dy = None
    for li in range(nl - 1, -1, -1):
        lp = plan.layers[li]
        taps = _tap_slices(lp, Wp)
        L = lp.g_out * Wp
        blk_in = (lp.g_in + 4) * Wp
        blk_out = (lp.g_out + 4) * Wp
        # dy_li = cot_li + transpose-from-above, masked
        cur = cots[li][0].astype(jnp.float32)
        if dy is not None:
            cur = cur + dy
        # mask: zero halos/invalid rows/pad cols per plane
        cur = cur * _mask_full(lp, plan)
        dy_outs[li][0] = cur.astype(dy_outs[li].dtype)

        # dx accumulation for the layer below (or dspec): the transpose of
        # the fwd tap read ``x_flat[o : o+L]`` is a zero-pad of the
        # contribution to offset o — static pads + sums, no scatter
        w = ws[li][...]
        per_plane = [[] for _ in range(lp.s_in)]
        for q in range(lp.s_out):
            off_q = q * blk_out + 2 * Wp
            dyq = cur[:, off_q : off_q + L].astype(dtype)
            for t_i, (phi, s0) in enumerate(taps[q]):
                contrib = jax.lax.dot_general(
                    w[t_i],
                    dyq,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [cin, L]
                per_plane[phi].append((s0, contrib))
        plane_vals = []
        for phi in range(lp.s_in):
            acc = jnp.zeros((lp.cin, blk_in), jnp.float32)
            for s0, contrib in per_plane[phi]:
                acc = acc + jnp.pad(
                    contrib, ((0, 0), (s0, blk_in - s0 - L))
                )
            plane_vals.append(acc)
        dx = jnp.concatenate(plane_vals, axis=1)  # [cin, s_in*blk_in]
        dy = dx if li > 0 else None
        if li == 0:
            dspec_ref[0] = dx.astype(dspec_ref.dtype)


def _bwd_kernel_dw(plan: MrdPlan, dtype, nb: int, *refs):
    """Per-tap weight/bias gradients, accumulated across the batch grid.

    refs = x-inputs (spec, fmap_0..fmap_{L-1}), dy_0..dy_L,
    dw_0..dw_L (fp32, revisited), db_0..db_L (fp32, revisited)."""
    nl = len(plan.layers)
    xs = refs[:nl]
    dys = refs[nl : 2 * nl]
    dws = refs[2 * nl : 3 * nl]
    dbs = refs[3 * nl :]
    Wp = plan.Wp
    b = pl.program_id(0)

    for li, lp in enumerate(plan.layers):
        taps = _tap_slices(lp, Wp)
        L = lp.g_out * Wp
        blk_in = (lp.g_in + 4) * Wp
        blk_out = (lp.g_out + 4) * Wp
        x = xs[li][0]
        dy = dys[li][0]
        # accumulate per-tap in Python lists (a value-level .at[].add would
        # lower to an unsupported scatter in Mosaic), stack at the end
        tap_accs = [
            jnp.zeros((lp.cin, lp.cout), jnp.float32)
            for _ in range(lp.kh * lp.kw)
        ]
        db_acc = jnp.zeros((1, lp.cout), jnp.float32)
        for q in range(lp.s_out):
            off_q = q * blk_out + 2 * Wp
            dyq = dy[:, off_q : off_q + L].astype(dtype)
            db_acc = db_acc + jnp.sum(
                dyq.astype(jnp.float32), axis=1
            ).reshape(1, -1)
            dyq_t = dyq.T  # [L, cout] — one relayout per plane, the tap
            # dots then stay canonical [cin, L] @ [L, cout]
            for t_i, (phi, s0) in enumerate(taps[q]):
                off = phi * blk_in + s0
                xsl = x[:, off : off + L].astype(dtype)
                g = jax.lax.dot_general(
                    xsl,
                    dyq_t,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [cin, cout]
                tap_accs[t_i] = tap_accs[t_i] + g
        dw_acc = jnp.stack(tap_accs)
        if nb > 1:
            # revisited output blocks: initialise on the first grid step
            # (reading uninitialised VMEM and multiplying by zero is NOT
            # safe — NaN bit patterns propagate), accumulate afterwards
            @pl.when(b == 0)
            def _():
                dws[li][...] = dw_acc
                dbs[li][...] = db_acc

            @pl.when(b != 0)
            def _():
                dws[li][...] = dws[li][...] + dw_acc
                dbs[li][...] = dbs[li][...] + db_acc
        else:
            dws[li][...] = dw_acc
            dbs[li][...] = db_acc


def _mrd_bwd(plan, dtype_name, interpret, res, cots):
    spec_pm, ws, outs = res
    B = spec_pm.shape[0]
    dt = _dtype(dtype_name)
    nl = len(plan.layers)
    spec_flat = spec_pm.reshape(B, 1, -1)
    w_in = [_pack_w(w).astype(dt) for w in ws]

    cot_flat = [
        c.reshape(B, c.shape[1], -1).astype(dt) for c in cots
    ]

    blk = lambda a: pl.BlockSpec(  # noqa: E731
        (1,) + a.shape[1:], lambda b_: (b_,) + (0,) * (a.ndim - 1),
        memory_space=pltpu.VMEM,
    )
    wblk = lambda w: pl.BlockSpec(  # noqa: E731
        w.shape, lambda b_: (0,) * w.ndim, memory_space=pltpu.VMEM
    )

    # ---- pass 1: dx sweep ----
    dy_shapes = [
        jax.ShapeDtypeStruct(o.shape, dt) for o in cot_flat
    ]
    # dspec leaves the kernel in the compute dtype (upcast outside): the
    # f32 block put the dx kernel 32 KB over the 16 MB scoped-VMEM limit
    dspec_shape = jax.ShapeDtypeStruct(spec_flat.shape, dt)
    outs1 = pl.pallas_call(
        functools.partial(_bwd_kernel_dx, plan, dt),
        grid=(B,),
        # the transpose sweep's double-buffered cot/dy blocks dominate;
        # v5e physical VMEM is well above the 16 MB default scoped budget
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        in_specs=[blk(c) for c in cot_flat] + [wblk(w) for w in w_in],
        out_specs=[blk_s for blk_s in (
            [pl.BlockSpec((1, 1, spec_flat.shape[-1]),
                          lambda b_: (b_, 0, 0), memory_space=pltpu.VMEM)]
            + [blk(c) for c in cot_flat]
        )],
        out_shape=[dspec_shape] + dy_shapes,
        interpret=interpret,
    )(*cot_flat, *w_in)
    dspec, dys = outs1[0].astype(jnp.float32), outs1[1:]

    # ---- pass 2: dW/db sweep (accumulated across the batch grid) ----
    x_in = [spec_flat.astype(dt)] + [o.astype(dt) for o in outs[:-1]]
    dw_shapes = [
        jax.ShapeDtypeStruct((lp.kh * lp.kw, lp.cin, lp.cout), jnp.float32)
        for lp in plan.layers
    ]
    db_shapes = [
        jax.ShapeDtypeStruct((1, lp.cout), jnp.float32)
        for lp in plan.layers
    ]
    outs2 = pl.pallas_call(
        functools.partial(_bwd_kernel_dw, plan, dt, B),
        grid=(B,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        in_specs=[blk(x) for x in x_in] + [blk(d) for d in dys],
        out_specs=[wblk(s) for s in dw_shapes]
        + [wblk(s) for s in db_shapes],
        out_shape=dw_shapes + db_shapes,
        interpret=interpret,
    )(*x_in, *dys)
    dws_p, dbs = outs2[:nl], outs2[nl:]
    dws = tuple(
        dw.reshape(lp.kh, lp.kw, lp.cin, lp.cout)
        for dw, lp in zip(dws_p, plan.layers)
    )
    dbs = tuple(db.reshape(-1) for db in dbs)
    return dspec.reshape(spec_pm.shape), dws, dbs


mrd_chain.defvjp(_mrd_fwd, _mrd_bwd)
