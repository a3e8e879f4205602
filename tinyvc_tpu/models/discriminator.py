"""HiFi-GAN-style discriminators: multi-period (MPD) + multi-resolution (MRD).

Behavioural spec: `module/tinyvc/discriminator.py:10-144`. NCHW layout
(torch-matching; see WNConv2d for the TPU tiling rationale); all
MPD/MRD convs are weight-normalised (torch ``weight_norm`` with per-output-
channel norm, `discriminator.py:14,80`), implemented here as explicit
``v``/``g`` parameters so the normalisation is part of the traced graph.

Reference quirk, reproduced behind a flag: `discriminator.py:104` computes
``F.leaky_relu(x, 0.1)`` and discards the result, so the MRD conv stack is
effectively activation-free. ``DiscriminatorConfig.mrd_fixed_activation``
(default False) keeps the faithful behaviour; set True for the intended one.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import DiscriminatorConfig
from ..dsp.stft import stft_magnitude
from .layers import torch_bias_init, torch_kernel_init


class WNConv2d(nn.Module):
    """Conv2d with weight normalisation (w = g * v / ||v||_out).

    Two lowerings:

    - ``impl='lax'`` (MPD default): NCHW ``conv_general_dilated`` — on TPU
      the minor-most two dims are the tiled ones, so channels stay
      un-padded and the small W axis rides the sublane; the
      reference-shaped NHWC activations pad W->8 and C->128, a measured
      ~16x HBM bloat and 19 ms of the GAN step.
    - ``impl='unfold'`` (kept as an option, NOT engaged): windows ->
      ``[Cout, K] @ [K, W]`` MXU matmuls batched over (batch, output row),
      K = kh*kw*Cin, on the ``[B, H, C, W]`` layout (tap axis K on
      sublanes, W on lanes). Measured VERDICT for the MRD: every unfold
      variant LOSES to the lax conv end-to-end on chip — NHWC lane-K
      121 ms/step, NCHW major-K 104, this sublane-K form 105, vs 46 with
      lax convs — because XLA's backward materialises relayout copies for
      each window-construction transpose (58 ms of MRD bwd, profiled);
      a direct strided H slice additionally lowers to gathers/scatters.
    - ``impl='nhwc'``: ``conv_general_dilated`` on ``[B, H, W, C]`` with
      HWIO weights. For the MRD's DEEP layers (C in 128/256, spatial dims
      H in 3..17, W in 31..250 on the 8000-sample training crop) the NCHW
      form tiles (H, W) as (sublane, lane) at 10-25 % density (H pads
      8..3x, W pads up to 4x at resolution 256); NHWC instead puts W on
      sublanes (~1x pad) and C on lanes (1x at 128/256), so the dominant
      matmuls run near full tile density. The EARLY layers (C 1/32) are
      the mirror image — C on lanes pads 4-128x — so `DiscriminatorR`
      uses ``conv_impl='hybrid'``: NCHW for conv_0/conv_1, one transpose,
      NHWC for conv_2..post (the ~75 %-of-FLOPs layers).
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    pad_mode: str = "zeros"  # 'zeros' | 'replicate'
    compute_dtype: str = "float32"
    impl: str = "lax"  # 'lax' (NCHW) | 'unfold' (NHWC matmul)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        cin = {"unfold": 2, "nhwc": 3}.get(self.impl, 1)
        cin = x.shape[cin]
        # torch init: conv weight kaiming_uniform(a=sqrt(5)); weight_norm
        # then reparametrises the SAME tensor as v=w, g=||w|| per output
        # channel (`/root/reference/module/tinyvc/discriminator.py:14,80`),
        # so the effective initial weight equals the plain conv init.
        # Params and the weight-norm math are always fp32; ``compute_dtype``
        # casts only the conv operands (mixed precision, reference `-fp16`).
        v = self.param(
            "v", torch_kernel_init(), (kh, kw, cin, self.features),
            jnp.float32,
        )
        g = self.param(
            "g",
            lambda key, shape, dtype=jnp.float32: jnp.sqrt(
                jnp.sum(v * v, axis=(0, 1, 2))
            ).astype(dtype),
            (self.features,),
            jnp.float32,
        )
        bias = self.param(
            "bias", torch_bias_init(kh * kw * cin), (self.features,),
            jnp.float32,
        )
        norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2), keepdims=True) + 1e-12)
        dt = jnp.dtype(self.compute_dtype)
        if self.impl == "unfold":
            wn = v / norm * g  # [kh, kw, cin, cout]
            return self._unfold(x, wn, bias, dt)
        if self.impl == "nhwc":
            wn = v / norm * g  # already HWIO
            if dt != jnp.float32:
                x, wn, bias = x.astype(dt), wn.astype(dt), bias.astype(dt)
            ph, pw = self.padding
            if self.pad_mode == "replicate" and (ph or pw):
                x = jnp.pad(
                    x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode="edge"
                )
                padding = "VALID"
            else:
                padding = [(ph, ph), (pw, pw)]
            y = jax.lax.conv_general_dilated(
                x,
                wn,
                window_strides=self.strides,
                padding=padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias[None, None, None, :]
        w = (v / norm * g).transpose(3, 2, 0, 1)  # [cout, cin, kh, kw]
        if dt != jnp.float32:
            x, w, bias = x.astype(dt), w.astype(dt), bias.astype(dt)
        ph, pw = self.padding
        if self.pad_mode == "replicate" and (ph or pw):
            x = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)), mode="edge")
            padding = "VALID"
        else:
            padding = [(ph, ph), (pw, pw)]
        y = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=self.strides,
            padding=padding,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return y + bias[None, :, None, None]

    def _unfold(self, x, wn, bias, dt):
        """[B, H, C, W] windows -> batched sublane-contraction matmul.

        The stride-sh H taps use a polyphase block reshape — tap ``i`` of
        output row ``h`` is row ``sh*h + i`` of the padded input, i.e.
        phase plane ``i % sh`` at block ``h + i // sh`` — so every view is
        a unit-step slice."""
        kh, kw = self.kernel_size
        sh, sw = self.strides
        ph, pw = self.padding
        assert sw == 1, "W stride != 1 not needed by MRD"
        mode = "edge" if self.pad_mode == "replicate" else "constant"
        B, H, C, W = x.shape
        x = jnp.pad(x, ((0, 0), (ph, ph), (0, 0), (pw, pw)), mode=mode)
        Ho = (H + 2 * ph - kh) // sh + 1
        if sh == 1:
            hviews = [x[:, i : i + Ho] for i in range(kh)]
        else:
            nblk = (kh - 1) // sh + Ho
            tail = nblk * sh - x.shape[1]
            if tail > 0:
                x = jnp.pad(x, ((0, 0), (0, tail), (0, 0), (0, 0)))
            blocks = x[:, : nblk * sh].reshape(
                B, nblk, sh, C, x.shape[-1]
            )
            hviews = [
                blocks[:, i // sh : i // sh + Ho, i % sh] for i in range(kh)
            ]
        # sublane axis becomes [i, j, c] — matching
        # kernel.reshape(kh*kw*cin, cout)
        win = jnp.concatenate(
            [hv[..., j : j + W] for hv in hviews for j in range(kw)],
            axis=2,
        )
        wmat = wn.reshape(kh * kw * wn.shape[2], self.features)
        if dt != jnp.float32:
            win, wmat, bias = win.astype(dt), wmat.astype(dt), bias.astype(dt)
        y = jnp.einsum(
            "bhkw,kf->bhfw", win, wmat, preferred_element_type=jnp.float32
        ).astype(dt)
        return y + bias[None, None, :, None]


class WNConv2dWeights(nn.Module):
    """Parameter-only twin of :class:`WNConv2d`: creates the identical
    ``v``/``g``/``bias`` tree (same names, shapes, inits — checkpoints are
    interchangeable) and returns the effective weight-normalised HWIO
    kernel + bias instead of applying a conv. Used by the fused MRD chain
    (`ops/pallas/mrd.py`), which consumes effective weights directly; the
    weight-norm math stays in this XLA region so its gradient comes from
    autodiff."""

    features: int
    kernel_size: Tuple[int, int]

    @nn.compact
    def __call__(self, cin: int):
        kh, kw = self.kernel_size
        v = self.param(
            "v", torch_kernel_init(), (kh, kw, cin, self.features),
            jnp.float32,
        )
        g = self.param(
            "g",
            lambda key, shape, dtype=jnp.float32: jnp.sqrt(
                jnp.sum(v * v, axis=(0, 1, 2))
            ).astype(dtype),
            (self.features,),
            jnp.float32,
        )
        bias = self.param(
            "bias", torch_bias_init(kh * kw * cin), (self.features,),
            jnp.float32,
        )
        norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2), keepdims=True) + 1e-12)
        return v / norm * g, bias


class DiscriminatorP(nn.Module):
    """Period-folded 2D conv discriminator (reference `discriminator.py:10-45`)."""

    period: int
    channels: int = 32
    channels_mul: int = 2
    max_channels: int = 256
    num_layers: int = 4
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: [B, T] waveform -> (logits, feature maps)."""
        B, T = x.shape
        p = self.period
        if T % p != 0:
            n_pad = p - (T % p)
            x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
            T = T + n_pad
        x = x.reshape(B, 1, T // p, p)

        fmap: List[jnp.ndarray] = []
        c = self.channels
        x = WNConv2d(c, (5, 1), (3, 1), (2, 0), pad_mode="replicate",
                     compute_dtype=self.compute_dtype, name="conv_0")(x)
        x = nn.leaky_relu(x, 0.1)
        fmap.append(x)
        for i in range(self.num_layers):
            c = min(c * self.channels_mul, self.max_channels)
            x = WNConv2d(
                c, (5, 1), (3, 1), (2, 0), pad_mode="replicate",
                compute_dtype=self.compute_dtype, name=f"conv_{i + 1}"
            )(x)
            x = nn.leaky_relu(x, 0.1)
            fmap.append(x)
        x = WNConv2d(1, (3, 1), (1, 1), (1, 0), pad_mode="replicate",
                     compute_dtype=self.compute_dtype, name="post")(x)
        fmap.append(x)
        return x, fmap


class DiscriminatorR(nn.Module):
    """STFT-magnitude 2D conv discriminator (reference `discriminator.py:77-108`)."""

    resolution: int
    channels: int = 32
    max_channels: int = 256
    num_layers: int = 4
    fixed_activation: bool = False
    compute_dtype: str = "float32"
    conv_impl: str = "lax"  # see WNConv2d; 'unfold' measured slower e2e

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: [B, T] waveform -> (logits, feature maps)."""
        n_fft = self.resolution * 4
        # fp32 spectrogram, frame 0 kept (torch.stft default, `discriminator.py:91-96`)
        spec = stft_magnitude(x, n_fft, self.resolution, drop_first=False,
                              grad_safe=True)
        if self.conv_impl == "fused":
            return self._fused(spec, x.shape[-1])
        # torch layout is [B, bins, frames]; ours [B, frames, bins]. Bins are
        # the strided conv axis H. The 'unfold' chain runs [B, H, C, W]
        # (taps on sublanes, frames on lanes) with fmaps emitted in torch
        # NCHW via output-only transposes; 'lax' runs NCHW directly.
        # 'hybrid' runs conv_0/conv_1 in NCHW (C is 1/32: lane-hostile),
        # transposes ONCE, and runs conv_2..post — ~75 % of the MRD's
        # FLOPs, C 128/256 — in NHWC where channels ride the lanes at
        # full tile density (see WNConv2d docstring). Later fmaps are then
        # emitted in NHWC: every consumer (adversarial + feature-matching
        # losses) is an elementwise reduction, so the layout is internal;
        # param shapes/names are impl-invariant (checkpoints carry over).
        unfold = self.conv_impl == "unfold"
        if self.conv_impl == "hybrid":
            impls = ["lax", "lax"] + ["nhwc"] * (self.num_layers - 1) + ["nhwc"]
        else:
            impls = [self.conv_impl] * (self.num_layers + 2)
        h = jnp.swapaxes(spec, 1, 2)  # [B, bins, frames]
        h = h[:, :, None, :] if unfold else h[:, None]

        def emit(t):
            return t.swapaxes(1, 2) if unfold else t

        fmap: List[jnp.ndarray] = []
        c = self.channels
        h = WNConv2d(c, (7, 3), (2, 1), (3, 1), impl=impls[0],
                     compute_dtype=self.compute_dtype, name="conv_0")(h)
        if self.fixed_activation:
            h = nn.leaky_relu(h, 0.1)
        fmap.append(emit(h))
        for i in range(self.num_layers):
            c = min(c * 2, self.max_channels)
            if impls[i + 1] == "nhwc" and impls[i] != "nhwc":
                h = h.transpose(0, 2, 3, 1)  # NCHW -> NHWC, once
            h = WNConv2d(c, (5, 3), (2, 1), (2, 1), impl=impls[i + 1],
                         compute_dtype=self.compute_dtype,
                         name=f"conv_{i + 1}")(h)
            if self.fixed_activation:
                h = nn.leaky_relu(h, 0.1)
            fmap.append(emit(h))
        h = WNConv2d(1, (3, 3), (1, 1), (1, 1), impl=impls[-1],
                     compute_dtype=self.compute_dtype, name="post")(h)
        h = emit(h)
        fmap.append(h)
        return h, fmap

    def _fused(self, spec: jnp.ndarray, T: int):
        """Whole conv stack in ONE Pallas kernel (two for backward) via the
        phase-plane-major layout — see `ops/mrd_planes.py` /
        `ops/pallas/mrd.py`. Outputs (logits and fmaps) come back FLAT
        plane-major ``[B, c, s_out*(g_out+4)*Wp]`` with zeros at invalid
        positions; consumers must divide by ``plan.valid_count(i)`` (the
        losses take ``valid_counts`` — layout is internal, both real and
        fake run the same impl). Faithful-quirk mode only (the chain is
        linear); ``fixed_activation`` falls back to the lax lowering."""
        assert not self.fixed_activation, (
            "mrd_conv_impl='fused' supports the faithful (activation-free) "
            "MRD only; use 'lax' with mrd_fixed_activation=True"
        )
        from ..ops.mrd_planes import make_plan, pack_spec_planes
        from ..ops.pallas.mrd import mrd_chain

        plan = make_plan(
            self.resolution, T, self.channels, self.max_channels,
            self.num_layers,
        )
        spec_pm = pack_spec_planes(jnp.swapaxes(spec, 1, 2), plan)
        ws: List[jnp.ndarray] = []
        bs: List[jnp.ndarray] = []
        names = [f"conv_{i}" for i in range(self.num_layers + 1)] + ["post"]
        for lp, name in zip(plan.layers, names):
            w, b = WNConv2dWeights(lp.cout, (lp.kh, lp.kw), name=name)(
                lp.cin
            )
            ws.append(w)
            bs.append(b)
        on_cpu = jax.default_backend() in ("cpu", "gpu")
        outs = mrd_chain(
            spec_pm, tuple(ws), tuple(bs), plan,
            "float32" if on_cpu else "bfloat16", on_cpu,
        )
        return outs[-1], list(outs)


class _MRDWeights(nn.Module):
    """Parameter container scoped ``mrd_{r}``: creates the same
    ``conv_0..conv_n, post`` WNConv2dWeights children as DiscriminatorR, so
    the param tree (and checkpoints) are identical across lowerings. Returns
    the effective (HWIO weight, bias) per layer."""

    channels: int
    max_channels: int
    num_layers: int

    @nn.compact
    def __call__(self):
        specs = _mrd_layer_specs(self.channels, self.max_channels, self.num_layers)
        out = []
        for name, (kh, kw), _, _, cin, cout in specs:
            out.append(
                WNConv2dWeights(cout, (kh, kw), name=name)(cin)
            )
        return out


def _mrd_layer_specs(channels: int, max_channels: int, num_layers: int):
    """(name, kernel, strides, padding, cin, cout) for every MRD conv —
    the single source of truth shared by DiscriminatorR and CrossResMRD
    (reference `discriminator.py:80-89`)."""
    specs = [("conv_0", (7, 3), (2, 1), (3, 1), 1, channels)]
    c = channels
    for i in range(num_layers):
        cn = min(c * 2, max_channels)
        specs.append((f"conv_{i + 1}", (5, 3), (2, 1), (2, 1), c, cn))
        c = cn
    specs.append(("post", (3, 3), (1, 1), (1, 1), c, 1))
    return specs


def cross_res_mrd_apply(
    x: jnp.ndarray,
    wb,
    resolutions: Sequence[int],
    channels: int = 32,
    max_channels: int = 256,
    num_layers: int = 4,
    fixed_activation: bool = False,
    compute_dtype: str = "float32",
):
    """All MRD resolutions batched per layer: ONE vmapped NCHW conv per
    layer over a zero-padded ``[R, B, C, H_max, W_max]`` canvas stack
    (24 -> 6 conv dispatches for 4 resolutions x 6 layers; VERDICT r3 item
    7 — dispatch, not MACs, is the measured MRD cost at ~2 % MXU).

    Exactness: the MRD convs zero-pad, so placing each resolution's map
    top-left on a zeroed canvas reproduces its padding for free — but conv
    bias makes invalid output positions nonzero, so each layer multiplies
    by a static mask that re-zeroes beyond each resolution's valid
    ``(H_rl, W_r)`` (the phantom-value failure of the effective-kernel
    dead-end, solved by 6 cheap fused elementwise masks). Outputs are
    sliced back per resolution: logits/fmaps match DiscriminatorR's 'lax'
    lowering exactly, losses and checkpoints need no changes.

    ``wb``: per-resolution lists of (HWIO weight, bias) from
    :class:`_MRDWeights` — created in the caller's flax scope so the param
    tree stays ``mrd_{r}/conv_i`` (checkpoint-identical to DiscriminatorR).

    x: [B, T] waveform -> (list of logits, list of per-resolution fmap
    lists).
    """
    specs = _mrd_layer_specs(channels, max_channels, num_layers)
    R = len(resolutions)

    # per-resolution spectrograms, zero-padded onto the shared canvas
    hs, ws = [], []
    planes = []
    for r in resolutions:
        spec = stft_magnitude(x, r * 4, r, drop_first=False,
                              grad_safe=True)  # [B, W_r, H_r]
        plane = jnp.swapaxes(spec, 1, 2)[:, None]  # [B, 1, H_r, W_r]
        hs.append(plane.shape[2])
        ws.append(plane.shape[3])
        planes.append(plane)
    H, W = max(hs), max(ws)
    stack = jnp.stack(
        [
            jnp.pad(p, ((0, 0), (0, 0), (0, H - p.shape[2]), (0, W - p.shape[3])))
            for p in planes
        ]
    )  # [R, B, 1, H, W]

    dt = jnp.dtype(compute_dtype)
    valid = [list(zip(hs, ws))]  # per layer: [(H_rl, W_r)] per resolution
    fmaps_stacked = []
    for li, (name, (kh, kw), (sh, sw), (ph, pw), cin, cout) in enumerate(specs):
        w_l = jnp.stack([wb[r][li][0] for r in range(R)])  # [R,kh,kw,cin,cout]
        b_l = jnp.stack([wb[r][li][1] for r in range(R)])  # [R,cout]
        if dt != jnp.float32:
            stack, w_l, b_l = (
                stack.astype(dt), w_l.astype(dt), b_l.astype(dt)
            )

        def conv_one(xx, ww, sh=sh, sw=sw, ph=ph, pw=pw):
            return jax.lax.conv_general_dilated(
                xx,
                ww.transpose(3, 2, 0, 1),
                window_strides=(sh, sw),
                padding=[(ph, ph), (pw, pw)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )

        stack = jax.vmap(conv_one)(stack, w_l)
        stack = stack + b_l[:, None, :, None, None]
        if fixed_activation and li < len(specs) - 1:  # no activation on post
            stack = nn.leaky_relu(stack, 0.1)
        # valid sizes after this layer, per resolution and for the canvas
        valid.append(
            [
                ((h + 2 * ph - kh) // sh + 1, (w + 2 * pw - kw) // sw + 1)
                for (h, w) in valid[-1]
            ]
        )
        Hc, Wc = stack.shape[-2], stack.shape[-1]
        mask = np.zeros((R, 1, 1, Hc, Wc), np.float32)
        for r, (hv, wv) in enumerate(valid[-1]):
            mask[r, :, :, :hv, :wv] = 1.0
        stack = stack * jnp.asarray(mask, dtype=stack.dtype)
        fmaps_stacked.append(stack)

    logits, fmaps = [], []
    for r in range(R):
        per_res = [
            s[r, :, :, :hv, :wv]
            for s, layer_valid in zip(fmaps_stacked, valid[1:])
            for (hv, wv) in [layer_valid[r]]
        ]
        logits.append(per_res[-1])
        fmaps.append(per_res)
    return logits, fmaps


def fused_mrd_valid_counts(cfg: DiscriminatorConfig, T: int):
    """Static (logit_counts, fmap_counts) aligned with Discriminator's
    output lists when ``mrd_conv_impl == 'fused'``: MPD entries are None
    (dense tensors), fused-MRD entries are the plane-major valid-position
    counts the masked losses divide by. T = waveform length (the disc
    crop)."""
    from ..ops.mrd_planes import make_plan

    logit_counts, fmap_counts = [], []
    n_mpd_fmaps = cfg.num_layers + 2
    for _ in cfg.periods:
        logit_counts.append(None)
        fmap_counts += [None] * n_mpd_fmaps
    for r in cfg.resolutions:
        plan = make_plan(r, T, cfg.channels, cfg.max_channels,
                         cfg.num_layers)
        n = len(plan.layers)
        logit_counts.append(plan.valid_count(n - 1))
        fmap_counts += [plan.valid_count(i) for i in range(n)]
    return logit_counts, fmap_counts


class Discriminator(nn.Module):
    """MPD + MRD ensemble (reference `discriminator.py:134-144`)."""

    cfg: DiscriminatorConfig = DiscriminatorConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: [B, T] -> (list of logits, list of feature maps)."""
        logits: List[jnp.ndarray] = []
        feats: List[jnp.ndarray] = []
        for p in self.cfg.periods:
            logit, fmap = DiscriminatorP(
                p,
                channels=self.cfg.channels,
                max_channels=self.cfg.max_channels,
                num_layers=self.cfg.num_layers,
                compute_dtype=self.cfg.compute_dtype,
                name=f"mpd_{p}",
            )(x)
            logits.append(logit)
            feats.extend(fmap)
        if self.cfg.mrd_conv_impl == "xres":
            # cross-resolution batching: one conv dispatch per layer over
            # all resolutions; weights created HERE so the param tree stays
            # mrd_{r}/conv_i (checkpoint-identical to the other lowerings)
            wb = [
                _MRDWeights(
                    self.cfg.channels, self.cfg.max_channels,
                    self.cfg.num_layers, name=f"mrd_{r}",
                )()
                for r in self.cfg.resolutions
            ]
            mrd_logits, mrd_fmaps = cross_res_mrd_apply(
                x,
                wb,
                self.cfg.resolutions,
                channels=self.cfg.channels,
                max_channels=self.cfg.max_channels,
                num_layers=self.cfg.num_layers,
                fixed_activation=self.cfg.mrd_fixed_activation,
                compute_dtype=self.cfg.compute_dtype,
            )
            for logit, fmap in zip(mrd_logits, mrd_fmaps):
                logits.append(logit)
                feats.extend(fmap)
            return logits, feats
        for r in self.cfg.resolutions:
            logit, fmap = DiscriminatorR(
                r,
                channels=self.cfg.channels,
                max_channels=self.cfg.max_channels,
                num_layers=self.cfg.num_layers,
                fixed_activation=self.cfg.mrd_fixed_activation,
                compute_dtype=self.cfg.compute_dtype,
                conv_impl=self.cfg.mrd_conv_impl,
                name=f"mrd_{r}",
            )(x)
            logits.append(logit)
            feats.extend(fmap)
        return logits, feats
