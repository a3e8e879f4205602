"""Time-sharded (sequence-parallel) long-utterance conversion.

The role ring-attention/Ulysses play for attention models (SURVEY §5.7) is
played here by overlap-save sharding along time: the utterance is split into
equal frame segments across the mesh axis, each shard processes its segment
plus a receptive-field halo, and three things make the result match the
single-device pipeline:

1. **GRN statistics** — the only unbounded-receptive-field op — are computed
   over each shard's core (halo-cropped) and ``psum``-reduced to the global
   value (`models/layers.py::GRN`).
2. **Harmonic phase continuity**: the per-frame phase increment of the
   (shifted) f0 track has a closed form at frame rate — ``frame_sum[p] =
   (c_prev*f0[p-1] + c_cur*f0[p] + c_next*f0[p+1]) / sr`` with constants
   derived from the interpolation weights — so each shard all-gathers core
   f0, computes the global exclusive phase prefix, and seeds its oscillator
   with the exact offset (``oscillate_harmonics(phase0=...)``).
3. **Noise determinism**: the per-frame noise phase is drawn from the frame's
   *global* index (vmapped fold_in), so shard boundaries don't change it.

Guarantees: the output is invariant to the shard count (up to fp32
collective-ordering noise — GRN psums and boundary phase seeds cancel
bit-for-bit by construction) and agrees with the single-device pipeline at
the mel level (the official parity metric). Waveform-level equality with the
single-device pipeline is NOT a goal: the utterance's edge frames see
replicated-halo context instead of each op's own edge padding, and the
absolute harmonic phase depends on those edge frames (a constant,
perceptually irrelevant offset). The segment count must divide the frame
count — bucket lengths to ``shards * bucket`` frames.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import TinyVCConfig
from ..dsp import estimate_energy, shift_frequency, spectrogram
from ..dsp.phase import wrapped_exclusive_prefix
from ..dsp.interp import linear_interp_last, upsample_frames_to_samples
from ..models import Decoder, Encoder
from ..models.decoder import oscillate_harmonics, oscillate_noise
from ..ops import match_features


def _frame_sum_constants(frame_size: int):
    """Per-frame sample-sum of the linear interpolation as a 3-tap filter."""
    a = (np.arange(frame_size) + 0.5) / frame_size - 0.5
    neg, pos = a < 0, a >= 0
    c_prev = float((-a[neg]).sum())
    c_cur = float((1.0 + a[neg]).sum() + (1.0 - a[pos]).sum())
    c_next = float(a[pos].sum())
    return c_prev, c_cur, c_next


def _per_frame_angles(key: jax.Array, frame_indices: jnp.ndarray, bins: int):
    """Deterministic per-global-frame noise phase: [F, bins] in (-pi, pi)."""

    def one(i):
        return jax.random.uniform(
            jax.random.fold_in(key, i), (bins,), minval=-np.pi, maxval=np.pi
        )

    return jax.vmap(one)(frame_indices)


def _prepare_overlap_save(
    enc_params: Dict[str, Any],
    dec_params: Dict[str, Any],
    wave: jnp.ndarray,
    pitch_shift: jnp.ndarray,
    key: jax.Array,
    cfg: TinyVCConfig,
    S: int,
    halo_frames: int,
    filter_halo: int,
    axis: str,
):
    """Shared core of the sharded and batched long-utterance converters:
    builds the [S, win] halo windows and the per-shard function. The
    per-shard function uses only named-axis collectives (psum / all_gather /
    axis_index), so it runs identically under ``shard_map`` over a mesh axis
    and under ``jax.vmap(axis_name=...)`` on a single device."""
    hop = cfg.audio.hop_size
    L = wave.shape[-1]
    assert L % (S * hop) == 0, "bucket utterance length to shards*hop multiples"
    F = L // hop
    seg = F // S
    H = halo_frames
    M = filter_halo + 4  # source/filter margin (+4 for ISTFT overlap-add)
    assert H >= M + 2, "halo must cover the filter margin"

    encoder = Encoder(cfg.encoder, time_axis_name=axis, time_halo=H)
    decoder = Decoder(
        cfg.decoder, cfg.audio, time_axis_name=axis, time_halo=M
    )

    # utterance-level halo padding. Reflect (torch-stft center=True
    # convention) keeps the edge shards' core spectrogram frames identical
    # to the standard unsharded pipeline — a constant pad perturbs the
    # outermost encoder frames, and an edge-frame f0 difference shifts the
    # GLOBAL harmonic phase constant (the prefix integrates from frame 0).
    pad = H * hop
    if pad < L:
        wave_p = jnp.pad(wave, (pad, pad), mode="reflect")
    else:  # degenerate: utterance shorter than the halo
        wave_p = jnp.concatenate(
            [
                jnp.broadcast_to(wave[:1], (pad,)),
                wave,
                jnp.broadcast_to(wave[-1:], (pad,)),
            ]
        )
    win = (seg + 2 * H) * hop
    windows = jnp.stack(
        [
            jax.lax.dynamic_slice(wave_p, (i * seg * hop,), (win,))
            for i in range(S)
        ]
    )  # [S, win]

    c_prev, c_cur, c_next = _frame_sum_constants(hop)
    fft_bin = cfg.audio.fft_bin

    def shard_fn(windows_l, target_l, angle_l):
        # windows_l: [1, win]; target_l [N, C]; angle_l [1, seg+2M, bins] or None-like
        i = jax.lax.axis_index(axis)
        w = windows_l  # [1, win]
        spec = spectrogram(w, cfg.audio.n_fft, hop)  # [1, seg+2H, 961]
        energy = estimate_energy(w, cfg.audio.energy_frame_size)  # [1, win]
        content, f0 = encoder.apply(enc_params, spec, method=encoder.infer)
        matched = match_features(
            content,
            jnp.broadcast_to(target_l[None], (1,) + target_l.shape),
            k=cfg.retrieval.k,
            alpha=cfg.retrieval.alpha,
            metric=cfg.retrieval.metric,
        )
        f0 = shift_frequency(f0, pitch_shift)  # [1, seg+2H]

        # ---- global phase prefix from stitched core f0 ----
        f0_core = jax.lax.dynamic_slice(f0, (0, H), (1, seg))  # [1, seg]
        f0_all = jax.lax.all_gather(f0_core[0], axis)  # [S, seg]
        f0_glob = f0_all.reshape(S * seg)  # [F]
        f0_pad = jnp.concatenate([f0_glob[:1], f0_glob, f0_glob[-1:]])
        frame_sums = (
            c_prev * f0_pad[:-2] + c_cur * f0_pad[1:-1] + c_next * f0_pad[2:]
        ) / cfg.audio.sample_rate  # [F]
        # hierarchical mod-1 prefix (same scheme as oscillate_harmonics):
        # accurate over multi-hour signals, bit-identical to a flat cumsum
        # within the first 256-frame group (the seed cancellation below
        # integrates < 256 margin frames, so it stays exact)
        frame_sums = jnp.mod(frame_sums, 1.0)
        prefix = wrapped_exclusive_prefix(frame_sums[None])[0]

        # ---- source window [H-M, H+seg+M) ----
        sw0 = H - M
        swf = seg + 2 * M
        content_w = jax.lax.dynamic_slice(
            matched, (0, sw0, 0), (1, swf, matched.shape[-1])
        )
        f0_w = jax.lax.dynamic_slice(f0, (0, sw0), (1, swf))
        energy_w = jax.lax.dynamic_slice(
            energy, (0, sw0 * hop), (1, swf * hop)
        )
        amps, kernel = decoder.apply(
            dec_params, content_w, f0_w, energy_w,
            method=lambda m, c, f_, e: m.source_net(c, f_, e),
        )

        # harmonics over [sw0-1, sw0+swf+1) with the exact global phase seed:
        # the local oscillator integrates through the margin frames
        # [sw0-1, H), so the seed is the global prefix at the core start MINUS
        # the local margin sums (phase at original frame i*seg must equal
        # prefix[i*seg] mod 1)
        f0_h = jax.lax.dynamic_slice(f0, (0, sw0 - 1), (1, swf + 2))
        # Seed the oscillator so the phase at the start of the SECOND core
        # frame equals the global prefix. The subtraction replicates the
        # oscillator's own two-level mod-1 integration bit-for-bit over the
        # frames it integrates before that point (f0_h frames [0, M+2) =
        # window frames [sw0-1, H]), so the cancellation is exact in fp32 and
        # the result is invariant to the shard count. (The first core frame's
        # samples can deviate on edge shards: the standard pipeline clips the
        # interpolation at the sequence edge where shards see a halo frame.)
        margin_f0 = f0_h[:, : M + 4]
        f0w_m = linear_interp_last(margin_f0, (M + 4) * hop)
        d_m = (f0w_m / cfg.audio.sample_rate).reshape(1, M + 4, hop)
        msums = jnp.cumsum(d_m, axis=-1)[..., -1]  # [1, M+4]
        ms_mod = msums - jnp.floor(msums)
        # replicate the oscillator's own wrapped-scan prefix at frame M+2
        # (bit-exact: same helper, same inputs, margin < one prefix group)
        local_off = wrapped_exclusive_prefix(ms_mod)[0, M + 2]
        phase0 = jnp.mod(prefix[i * seg + 1] - local_off, 1.0)
        harm = oscillate_harmonics(
            f0_h, hop, cfg.audio.sample_rate, cfg.decoder.num_harmonics,
            phase0=phase0,
        )[:, hop:-hop]  # [1, swf*hop, H1]
        amps_w = upsample_frames_to_samples(amps.astype(jnp.float32), hop)
        harm = harm * amps_w

        # noise over the same window, phases indexed by global frame
        if angle_l is not None:
            angle = angle_l
        else:
            frames_g = i * seg - M + jnp.arange(swf)
            angle = _per_frame_angles(key, frames_g, fft_bin)[None]
        noise = oscillate_noise(
            kernel, key, hop, cfg.audio.n_fft, angle=angle
        )  # [1, swf*hop]
        source = jnp.concatenate([harm, noise[..., None]], axis=-1)

        out = decoder.apply(
            dec_params, content_w, f0_w, energy_w, source,
            method=lambda m, c, f_, e, s: m.filter_net(c, f_, e, s),
        )  # [1, swf*hop]
        core = jax.lax.dynamic_slice(out, (0, M * hop), (1, seg * hop))
        return core

    return windows, shard_fn, seg, M, fft_bin


def _angle_shards(noise_angle, S, seg, M, fft_bin):
    """Per-shard windows of the [F, bins] deterministic noise-phase table."""
    sw0s = [i * seg - M for i in range(S)]
    pad_a = jnp.pad(noise_angle, ((M, M), (0, 0)), mode="edge")
    return jnp.stack(
        [
            jax.lax.dynamic_slice(pad_a, (s + M, 0), (seg + 2 * M, fft_bin))
            for s in sw0s
        ]
    )  # [S, seg+2M, bins]


def time_sharded_convert(
    mesh: Mesh,
    enc_params: Dict[str, Any],
    dec_params: Dict[str, Any],
    wave: jnp.ndarray,
    target: jnp.ndarray,
    pitch_shift: jnp.ndarray,
    key: jax.Array,
    cfg: TinyVCConfig,
    halo_frames: int = 96,
    filter_halo: int = 32,
    axis: str = "data",
    noise_angle: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """wave [L] -> converted [L], sharded along ``axis`` of ``mesh``.

    L must be a multiple of ``shards * hop``. ``noise_angle`` ([F, fft_bin])
    overrides the per-frame noise phases (deterministic tests).
    """
    S = mesh.shape[axis]
    L = wave.shape[-1]
    windows, shard_fn, seg, M, fft_bin = _prepare_overlap_save(
        enc_params, dec_params, wave, pitch_shift, key, cfg,
        S, halo_frames, filter_halo, axis,
    )

    if noise_angle is not None:
        # slice per-shard angle windows on the host side of the shard_map
        angle_shards = _angle_shards(noise_angle, S, seg, M, fft_bin)
        fn = shard_map(
            lambda w, t, a: shard_fn(w, t, a),
            mesh=mesh,
            in_specs=(P(axis, None), P(None, None), P(axis, None, None)),
            out_specs=P(axis, None),
            check_vma=False,
        )
        cores = fn(windows, target, angle_shards)
    else:
        fn = shard_map(
            lambda w, t: shard_fn(w, t, None),
            mesh=mesh,
            in_specs=(P(axis, None), P(None, None)),
            out_specs=P(axis, None),
            check_vma=False,
        )
        cores = fn(windows, target)
    return cores.reshape(L)


def time_batched_convert(
    enc_params: Dict[str, Any],
    dec_params: Dict[str, Any],
    wave: jnp.ndarray,
    target: jnp.ndarray,
    pitch_shift: jnp.ndarray,
    key: jax.Array,
    cfg: TinyVCConfig,
    shards: int = 4,
    halo_frames: int = 96,
    filter_halo: int = 32,
    noise_angle: Optional[jnp.ndarray] = None,
    native: bool = True,
) -> jnp.ndarray:
    """Single-device chunked long-utterance conversion: wave [L] -> [L].

    The exact overlap-save math of :func:`time_sharded_convert` with the
    shard axis on the *batch* dimension of one device. Chunk joins stay
    exact the same three ways (GRN statistics globalised, harmonic phase
    prefix-seeded, noise indexed by global frame); naive chunking breaks
    all three (the reference parses ``--chunk-size``/``--no-chunking`` but
    never implements chunking — `infer.py:27-29,40-41`, vestigial).

    ``native=True`` (default): the chunks are a REAL batch — every op sees
    an ordinary ``[S, ...]`` tensor, GRN's global statistic is a batch-axis
    sum, the phase prefix is a plain reshape across rows, and noise phases
    come from a precomputed global-frame table. No ``vmap``, so the
    manual-DMA fused Pallas serving kernels engage (round-4's chunked mode
    lost them to Mosaic's whole-array ANY-memspec constraint and measured
    1730 vs 5964 audio-s/s; this is NOTES item 5's fix).

    ``native=False``: the round-4 lowering — ``jax.vmap(axis_name=...)``
    over the per-shard function with collectives resolved intra-array,
    fused kernels forced off (`ops/dispatch.py::force_xla`). Kept as the
    measured A/B ablation and as the exact vmap twin of the mesh path.

    Not a memory bound either way: all ``S`` chunk lanes run concurrently,
    so activations scale with the whole utterance plus halo recompute. Its
    other use stands: bounded jit buckets for arbitrarily long inputs (one
    compile per chunk count S instead of one per utterance-length bucket).
    """
    if native:
        return _time_batched_native(
            enc_params, dec_params, wave, target, pitch_shift, key, cfg,
            shards, halo_frames, filter_halo, noise_angle,
        )
    L = wave.shape[-1]
    axis = "tschunk"
    windows, shard_fn, seg, M, fft_bin = _prepare_overlap_save(
        enc_params, dec_params, wave, pitch_shift, key, cfg,
        shards, halo_frames, filter_halo, axis,
    )
    windows = windows[:, None, :]  # [S, 1, win] — shard_fn expects [1, win]
    # vmap over chunks cannot batch manual-DMA Pallas kernels (Mosaic's
    # ANY-memspace blocks must cover the whole array); force the XLA
    # lowerings while tracing — the chunk batch amortises their dispatch
    from ..ops.dispatch import force_xla

    with force_xla():
        if noise_angle is not None:
            angle_shards = _angle_shards(noise_angle, shards, seg, M, fft_bin)
            fn = jax.vmap(shard_fn, in_axes=(0, None, 0), axis_name=axis)
            cores = fn(windows, target, angle_shards[:, None])
        else:
            fn = jax.vmap(
                lambda w, t: shard_fn(w, t, None), in_axes=(0, None),
                axis_name=axis,
            )
            cores = fn(windows, target)
    return cores.reshape(L)


def _time_batched_native(
    enc_params, dec_params, wave, target, pitch_shift, key, cfg,
    S, halo_frames, filter_halo, noise_angle,
) -> jnp.ndarray:
    """Batch-native body of :func:`time_batched_convert`: identical
    overlap-save math, expressed as ordinary batched ops over [S, ...]."""
    hop = cfg.audio.hop_size
    L = wave.shape[-1]
    assert L % (S * hop) == 0, "bucket utterance length to shards*hop multiples"
    F = L // hop
    seg = F // S
    H = halo_frames
    M = filter_halo + 4
    assert H >= M + 2, "halo must cover the filter margin"
    fft_bin = cfg.audio.fft_bin

    # time_batch=True: GRN statistics sum over the chunk rows (the
    # un-vmapped equivalent of the vmap path's psum), halo-cropped so
    # overlap frames aren't double-counted
    encoder = Encoder(cfg.encoder, time_halo=H, time_batch=True)
    decoder = Decoder(cfg.decoder, cfg.audio, time_halo=M, time_batch=True)

    pad = H * hop
    if pad < L:
        wave_p = jnp.pad(wave, (pad, pad), mode="reflect")
    else:
        wave_p = jnp.concatenate([
            jnp.broadcast_to(wave[:1], (pad,)),
            wave,
            jnp.broadcast_to(wave[-1:], (pad,)),
        ])
    win = (seg + 2 * H) * hop
    windows = jnp.stack([
        jax.lax.dynamic_slice(wave_p, (i * seg * hop,), (win,))
        for i in range(S)
    ])  # [S, win]

    # the chunk rows are an ordinary batch, so the SERVING kernel routes
    # engage exactly as in the whole-utterance pipeline (this is the point
    # of the native lowering — the vmap path had to force XLA): fused
    # bf16x3 DFT-matmul spectrogram (S*(seg+2H) frames clears the >=2048
    # engagement bound at production chunk sizes) and the VMEM-resident
    # kNN kernel
    from ..infer.generator import serving_match_features, serving_spectrogram

    spec = serving_spectrogram(windows, cfg)  # [S, seg+2H, 961]
    energy = estimate_energy(windows, cfg.audio.energy_frame_size)
    content, f0 = encoder.apply(enc_params, spec, method=encoder.infer)
    matched = serving_match_features(content, target, cfg)
    f0 = shift_frequency(f0, pitch_shift)  # [S, seg+2H]

    # ---- global phase prefix: stitch core f0 by a plain reshape ----
    c_prev, c_cur, c_next = _frame_sum_constants(hop)
    f0_glob = f0[:, H: H + seg].reshape(S * seg)  # [F]
    f0_pad = jnp.concatenate([f0_glob[:1], f0_glob, f0_glob[-1:]])
    frame_sums = (
        c_prev * f0_pad[:-2] + c_cur * f0_pad[1:-1] + c_next * f0_pad[2:]
    ) / cfg.audio.sample_rate
    frame_sums = jnp.mod(frame_sums, 1.0)
    prefix = wrapped_exclusive_prefix(frame_sums[None])[0]  # [F]

    # ---- source window [H-M, H+seg+M) ----
    sw0 = H - M
    swf = seg + 2 * M
    content_w = matched[:, sw0: sw0 + swf]
    f0_w = f0[:, sw0: sw0 + swf]
    energy_w = energy[:, sw0 * hop: (sw0 + swf) * hop]
    amps, kernel = decoder.apply(
        dec_params, content_w, f0_w, energy_w,
        method=lambda m, c, f_, e: m.source_net(c, f_, e),
    )

    # per-row oscillator phase seeds (same cancellation as the vmap path,
    # vectorised over rows)
    f0_h = f0[:, sw0 - 1: sw0 + swf + 1]  # [S, swf+2]
    margin_f0 = f0_h[:, : M + 4]
    f0w_m = linear_interp_last(margin_f0, (M + 4) * hop)
    d_m = (f0w_m / cfg.audio.sample_rate).reshape(S, M + 4, hop)
    msums = jnp.cumsum(d_m, axis=-1)[..., -1]  # [S, M+4]
    ms_mod = msums - jnp.floor(msums)
    local_off = wrapped_exclusive_prefix(ms_mod)[:, M + 2]  # [S]
    starts = jnp.arange(S) * seg + 1
    phase0 = jnp.mod(prefix[starts] - local_off, 1.0)  # [S]
    harm = oscillate_harmonics(
        f0_h, hop, cfg.audio.sample_rate, cfg.decoder.num_harmonics,
        phase0=phase0,
    )[:, hop:-hop]  # [S, swf*hop, H1]
    amps_w = upsample_frames_to_samples(amps.astype(jnp.float32), hop)
    harm = harm * amps_w

    # noise phases from the global frame table (identical indices to the
    # vmap path's per-shard fold_in, so the two modes agree bit-for-bit
    # up to op ordering)
    if noise_angle is not None:
        angle = _angle_shards(noise_angle, S, seg, M, fft_bin)
    else:
        frames_g = (
            jnp.arange(S)[:, None] * seg - M + jnp.arange(swf)[None, :]
        ).reshape(-1)
        angle = _per_frame_angles(key, frames_g, fft_bin).reshape(S, swf, fft_bin)
    noise = oscillate_noise(kernel, key, hop, cfg.audio.n_fft, angle=angle)
    source = jnp.concatenate([harm, noise[..., None]], axis=-1)

    # waveform-rate U-Net: the fused VMEM-resident serving kernels when the
    # profile enables them (`decode_infer`'s route), flax otherwise
    from ..infer.generator import _on_cpu_backend

    flag = cfg.decoder.use_fused_filter
    if flag == "on" or (flag == "auto" and not _on_cpu_backend()):
        from ..ops.fused_filternet import filternet_fused_apply

        out = filternet_fused_apply(
            dec_params["params"]["filter_net"], cfg.decoder,
            content_w, f0_w, energy_w, source,
            interpret=_on_cpu_backend(),
            # small-batch chunk rows VMEM-place the frame-rate stages'
            # whole operands and blow the scoped budget (see the param's
            # docstring); keep the kernels on the waveform-rate stages
            # where their ~2x lives
            kernel_min_len=8192,
        )
    else:
        out = decoder.apply(
            dec_params, content_w, f0_w, energy_w, source,
            method=lambda m, c, f_, e, s: m.filter_net(c, f_, e, s),
        )  # [S, swf*hop]
    core = out[:, M * hop: (M + seg) * hop]
    return core.reshape(L)
