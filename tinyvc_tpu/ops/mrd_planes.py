"""Phase-plane formulation of the MRD discriminator conv stack.

The MRD (reference `module/tinyvc/discriminator.py:77-131`) is a chain of
six small 2D convs per resolution, strided 2 along the frequency-bin axis.
On TPU the straightforward lowering costs ~120 tiny ops (~14.7 ms of the
post-join GAN step at ~2 % MXU — fixed per-op dispatch cost, not MACs;
three unfold layouts and the NHWC 'hybrid' form all measured no better).
Only op-count reduction moves it, and a VMEM-resident Pallas chain was
previously blocked on the stride-2-H geometry: strided slices lower to
gathers, and parity planes double per layer.

This module embraces the doubling. Every feature map is stored in
**phase-plane-major layout**: the bin axis ``h`` is split into ``S``
planes, plane ``p`` holding rows ``h = S*g + p``. A stride-2 conv reading
``x[2h + i - ph]`` from planes at stride ``S_in = 2*S_out`` becomes, for
each output plane ``q`` and tap ``i``: a read of plane ``phi = t mod S_in``
at row offset ``delta = t // S_in`` with ``t = 2q + i - ph`` — a UNIT-step
slice. Plane counts halve layer by layer (32 -> 16 -> ... -> 1) while rows
per plane stay ~constant, so every tap is one ``[cout, cin] @ [cin, rows*W]``
matmul over a contiguous window. No gathers, no strided slices, anywhere.

Buffer layout per feature map: ``[B, C, S, (G + 4) * Wp]`` where each
plane block is ``G + 4`` rows of ``Wp = W + 2`` columns, flattened: rows
0-1 and ``G+2``..``G+3`` are zero halos (the conv's zero padding in h),
column 0 / ``W+1`` are the zero padding in w. A tap (delta, j) is the flat
slice ``[(2 + delta) * Wp + (j - 1), + G_out * Wp)`` — row crossings read
a neighbouring row's pad column, which is zero, and land in output
positions that the per-plane validity mask zeroes afterwards.

This file is pure XLA: the static plan (tap tables, masks), the spec
packing, and a reference plane implementation used to validate the Pallas
kernels (`ops/pallas/mrd.py`) and for CPU fallbacks in tests. The plan is
shared by the kernels, so a parity test of this implementation against the
'lax' DiscriminatorR validates every piece of static bookkeeping.

The chain is linear in the reference's faithful mode (the discarded
`F.leaky_relu`, `discriminator.py:104`); the fused path supports exactly
that mode (``mrd_fixed_activation=False``, the default).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LayerPlan:
    cin: int
    cout: int
    kh: int
    kw: int
    stride: int
    ph: int
    pw: int
    s_in: int
    s_out: int
    g_in: int
    g_out: int
    h_in: int
    h_out: int
    # taps[q][i] = (phi, delta) for output plane q, h-tap i
    taps: Tuple[Tuple[Tuple[int, int], ...], ...]
    # valid rows per output plane q
    valid_out: Tuple[int, ...]


@dataclasses.dataclass(frozen=True)
class MrdPlan:
    resolution: int
    T: int
    W: int  # STFT frames (torch center=True: 1 + T // hop)
    Wp: int  # W + 2 (zero pad columns)
    bins: int
    s0: int  # initial plane count (2 ** (num_layers + 1))
    layers: Tuple[LayerPlan, ...]

    def buf_len(self, layer_idx: int) -> int:
        """Flat per-plane buffer length of layer ``layer_idx``'s INPUT."""
        return (self.layers[layer_idx].g_in + 4) * self.Wp

    def out_shape(self, layer_idx: int, B: int) -> Tuple[int, ...]:
        lp = self.layers[layer_idx]
        return (B, lp.cout, lp.s_out, (lp.g_out + 4) * self.Wp)

    def valid_count(self, layer_idx: int) -> int:
        """Number of valid (h, w) positions in layer ``layer_idx``'s output
        (== h_out * W, the dense fmap element count per [B, c])."""
        lp = self.layers[layer_idx]
        return lp.h_out * self.W

    def out_mask(self, layer_idx: int) -> np.ndarray:
        """0/1 mask over the output buffer [s_out, (g_out+4)*Wp]."""
        lp = self.layers[layer_idx]
        m = np.zeros((lp.s_out, lp.g_out + 4, self.Wp), np.float32)
        for q in range(lp.s_out):
            m[q, 2 : 2 + lp.valid_out[q], 1 : 1 + self.W] = 1.0
        return m.reshape(lp.s_out, -1)


def make_plan(
    resolution: int,
    T: int,
    channels: int = 32,
    max_channels: int = 256,
    num_layers: int = 4,
) -> MrdPlan:
    n_fft = resolution * 4
    bins = n_fft // 2 + 1
    W = 1 + T // resolution  # torch.stft center=True frame count
    s0 = 2 ** (num_layers + 1)

    specs: List[Tuple[int, int, int, int, int, int, int]] = []
    c = channels
    specs.append((1, c, 7, 3, 2, 3, 1))  # conv_0
    for _ in range(num_layers):
        nxt = min(c * 2, max_channels)
        specs.append((c, nxt, 5, 3, 2, 2, 1))
        c = nxt
    specs.append((c, 1, 3, 3, 1, 1, 1))  # post

    layers: List[LayerPlan] = []
    h = bins
    s = s0
    for cin, cout, kh, kw, stride, ph, pw in specs:
        s_in = s
        s_out = s // 2 if stride == 2 else s
        h_out = (h + 2 * ph - kh) // stride + 1
        g_in = -(-h // s_in)
        g_out = -(-h_out // s_out)
        assert g_out <= g_in + 1, (resolution, h, s_in, g_in, g_out)
        taps = []
        for q in range(s_out):
            row = []
            for i in range(kh):
                t = stride * q + i - ph
                phi, delta = t % s_in, t // s_in
                assert -1 <= delta <= 1, (resolution, stride, q, i, delta)
                row.append((phi, delta))
            taps.append(tuple(row))
        valid = tuple(
            max(0, -(-(h_out - q) // s_out)) if q < h_out else 0
            for q in range(s_out)
        )
        layers.append(
            LayerPlan(
                cin=cin, cout=cout, kh=kh, kw=kw, stride=stride, ph=ph,
                pw=pw, s_in=s_in, s_out=s_out, g_in=g_in, g_out=g_out,
                h_in=h, h_out=h_out, taps=tuple(taps), valid_out=valid,
            )
        )
        h, s = h_out, s_out
    # the slice bound (3 + g_out) * Wp < (g_in + 4) * Wp needs g_out <= g_in
    for lp in layers:
        assert lp.g_out <= lp.g_in + 1
    return MrdPlan(
        resolution=resolution, T=T, W=W, Wp=W + 2, bins=bins, s0=s0,
        layers=tuple(layers),
    )


def pack_spec_planes(spec: jnp.ndarray, plan: MrdPlan) -> jnp.ndarray:
    """``spec [B, bins, W]`` -> plane-major ``[B, 1, S0, (G0+4)*Wp]``.

    Pure reshapes/pads (gather-free): row ``h = S0*g + p`` lands in plane
    ``p`` at row ``g`` via a ``[G, S]`` reshape + transpose of the padded
    bin axis.
    """
    B = spec.shape[0]
    S, G, W, Wp = plan.s0, plan.layers[0].g_in, plan.W, plan.Wp
    x = jnp.pad(spec, ((0, 0), (0, S * G - plan.bins), (0, 0)))
    x = x.reshape(B, G, S, W).transpose(0, 2, 1, 3)  # [B, S, G, W]
    x = jnp.pad(x, ((0, 0), (0, 0), (2, 2), (1, 1)))
    return x.reshape(B, 1, S, (G + 4) * Wp)


def unpack_planes(
    y: jnp.ndarray, plan: MrdPlan, layer_idx: int
) -> jnp.ndarray:
    """Plane-major layer output -> dense ``[B, c, H, W]`` (tests only)."""
    lp = plan.layers[layer_idx]
    B, c = y.shape[0], lp.cout
    y = y.reshape(B, c, lp.s_out, lp.g_out + 4, plan.Wp)
    y = y[:, :, :, 2 : 2 + lp.g_out, 1 : 1 + plan.W]  # [B,c,s,g,W]
    y = y.transpose(0, 1, 3, 2, 4).reshape(B, c, lp.s_out * lp.g_out, plan.W)
    return y[:, :, : lp.h_out]


def _tap_slices(lp: LayerPlan, Wp: int):
    """Static (q, i, j) -> (phi, flat_start) enumeration shared with the
    Pallas kernels. The slice length is always ``g_out * Wp``."""
    out = []
    for q in range(lp.s_out):
        row = []
        for i in range(lp.kh):
            phi, delta = lp.taps[q][i]
            for j in range(lp.kw):
                row.append((phi, (2 + delta) * Wp + (j - 1)))
        out.append(row)
    return out


def apply_layer_xla(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    layer_idx: int,
    plan: MrdPlan,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """One conv layer in plane-major layout, pure XLA.

    x [B, cin, s_in, (g_in+4)*Wp], w [kh, kw, cin, cout], b [cout]
    -> [B, cout, s_out, (g_out+4)*Wp].
    """
    lp = plan.layers[layer_idx]
    B = x.shape[0]
    Wp = plan.Wp
    L = lp.g_out * Wp
    mask = plan.out_mask(layer_idx)  # [s_out, (g_out+4)*Wp]
    taps = _tap_slices(lp, Wp)
    wf = w.reshape(lp.kh * lp.kw, lp.cin, lp.cout).astype(dtype)
    planes = []
    for q in range(lp.s_out):
        acc = jnp.zeros((B, lp.cout, L), jnp.float32)
        for t_i, (phi, s0) in enumerate(taps[q]):
            xs = jax.lax.slice_in_dim(
                x[:, :, phi, :], s0, s0 + L, axis=2
            ).astype(dtype)  # [B, cin, L]
            acc = acc + jnp.einsum(
                "bcl,cf->bfl", xs, wf[t_i],
                preferred_element_type=jnp.float32,
            )
        acc = acc + b.astype(jnp.float32)[None, :, None]
        # zero invalid rows/pad cols, then re-wrap with halo rows
        m = jnp.asarray(mask[q, 2 * Wp : 2 * Wp + L])
        planes.append(acc * m)
    y = jnp.stack(planes, axis=2)  # [B, cout, s_out, g_out*Wp]
    y = jnp.pad(y, ((0, 0), (0, 0), (0, 0), (2 * Wp, 2 * Wp)))
    return y.astype(dtype) if dtype != jnp.float32 else y


def mrd_chain_xla(
    spec_pm: jnp.ndarray,
    weights: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    plan: MrdPlan,
    dtype=jnp.float32,
) -> List[jnp.ndarray]:
    """Full plane-major chain; returns every layer's output (fmaps list,
    last = logits). Reference implementation for the Pallas kernels."""
    outs = []
    x = spec_pm
    for li, (w, b) in enumerate(zip(weights, biases)):
        x = apply_layer_xla(x, w, b, li, plan, dtype=dtype)
        outs.append(x)
    return outs
