"""Pallas kernel correctness (interpret mode on CPU) vs the XLA reference
implementations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tinyvc_tpu.dsp.interp import upsample_frames_to_samples
from tinyvc_tpu.models import oscillate_harmonics
from tinyvc_tpu.ops.pallas.oscillator import oscillator_bank


def _truth_f64(f0, amps, frame=480, sr=24000, fmin=20.0):
    """float64 ground truth of oscillate_harmonics * interp(amps)."""
    B, F = f0.shape
    H1 = amps.shape[-1]
    L = F * frame

    def interp(x):  # [B, F] -> [B, L], torch align_corners=False
        src = np.clip((np.arange(L) + 0.5) / frame - 0.5, 0, F - 1)
        j = np.floor(src).astype(int)
        j1 = np.minimum(j + 1, F - 1)
        fr = src - j
        return x[:, j] * (1 - fr) + x[:, j1] * fr

    f0w = interp(f0.astype(np.float64))
    uv = interp((f0 > fmin).astype(np.float64))
    phase = np.cumsum(f0w / sr, axis=1)
    k = np.arange(1, H1 + 1)
    harm = np.sin(2 * np.pi * np.mod(phase[:, :, None] * k, 1.0)) * uv[:, :, None]
    amps_w = np.stack(
        [interp(amps[:, :, h].astype(np.float64)) for h in range(H1)], axis=-1
    )
    return harm * amps_w


def test_oscillator_bank_accuracy_vs_f64_truth(rng):
    """The fused kernel must match the float64 ground truth at least as well
    as the XLA fp32 path does (its mod-1 carry is strictly more precise than
    an unbounded fp32 phase accumulator)."""
    B, F, H1 = 2, 50, 16
    f0 = (np.abs(rng.standard_normal((B, F))) * 200 + 40).astype(np.float32)
    f0[0, :10] = 0.0  # unvoiced run
    amps = (np.abs(rng.standard_normal((B, F, H1))) + 0.2).astype(np.float32)
    truth = _truth_f64(f0, amps)

    xla = oscillate_harmonics(jnp.asarray(f0), 480, 24000, H1 - 1, 20.0)
    xla = np.asarray(xla * upsample_frames_to_samples(jnp.asarray(amps), 480))

    out = oscillator_bank(
        jnp.asarray(f0), jnp.asarray(amps), 480, 24000, 20.0, interpret=True
    )
    out = np.asarray(out)
    assert out.shape == (B, F * 480, H1)

    err_kernel = np.abs(out - truth).max()
    err_xla = np.abs(xla - truth).max()
    assert err_kernel < 2e-2
    assert err_kernel <= err_xla * 1.5 + 1e-3, (err_kernel, err_xla)


def test_oscillator_bank_grad_matches_xla(rng):
    """The GAN step backprops through `decoder.dsp` into SourceNet's amps
    head; the kernel's custom_vjp routes the backward pass through the XLA
    chain, so grads must match differentiating the XLA chain directly."""
    B, F, H1 = 2, 16, 8
    f0 = (np.abs(rng.standard_normal((B, F))) * 200 + 40).astype(np.float32)
    amps = (np.abs(rng.standard_normal((B, F, H1))) + 0.2).astype(np.float32)
    # a non-trivial cotangent: weighted sum of the output
    w = rng.standard_normal((B, F * 480, H1)).astype(np.float32)

    def loss_kernel(a):
        out = oscillator_bank(
            jnp.asarray(f0), a, 480, 24000, 20.0, interpret=True
        )
        return jnp.sum(out * w)

    def loss_xla(a):
        harm = oscillate_harmonics(jnp.asarray(f0), 480, 24000, H1 - 1, 20.0)
        return jnp.sum(harm * upsample_frames_to_samples(a, 480) * w)

    g_kernel = np.asarray(jax.grad(loss_kernel)(jnp.asarray(amps)))
    g_xla = np.asarray(jax.grad(loss_xla)(jnp.asarray(amps)))
    # the fused backward kernel recomputes phase with the forward kernel's
    # own two-level mod-1 scheme; vs the XLA chain the difference is fp32
    # phase rounding amplified by sin' — bounded relative to the grad scale
    scale = np.abs(g_xla).max()
    np.testing.assert_allclose(g_kernel, g_xla, rtol=1e-3, atol=1e-3 * scale)


def test_oscillator_bank_carry_across_blocks(rng):
    """Phase must stay continuous across grid blocks: every block size must
    track the float64 ground truth to fp32 phase-jitter level (~1e-4 cycles
    over 0.8 s; no discontinuities at block boundaries)."""
    B, F, H1 = 1, 40, 4
    f0 = np.full((B, F), 220.0, np.float32)
    amps = np.ones((B, F, H1), np.float32)
    truth = _truth_f64(f0, amps)
    for P in (40, 8, 5):
        out = np.asarray(
            oscillator_bank(
                jnp.asarray(f0), jnp.asarray(amps), 480, 24000, 20.0,
                frames_per_block=P, interpret=True,
            )
        )
        err = np.abs(out - truth)
        assert err.max() < 2e-2, (P, err.max())
        # no jump at block boundaries: error grows smoothly, so the max over
        # the first block is far below the global bound
        assert err[0, : 5 * 480].max() < 5e-3, (P, err[0, : 5 * 480].max())


def test_pallas_spectrogram_fp32_exact(rng):
    """Fused window+DFT-matmul kernel vs the XLA rfft spectrogram:
    fp32 operands are numerically exact; bf16 within ~3e-3 relative."""
    from tinyvc_tpu.dsp.stft import spectrogram
    from tinyvc_tpu.ops.pallas.spectrogram import pallas_spectrogram

    for B, L in [(2, 48000), (1, 13440)]:
        x = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.3)
        ref = np.asarray(spectrogram(x))
        got = np.asarray(
            pallas_spectrogram(x, interpret=True, dtype_name="float32")
        )
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=5e-4)
        got16 = np.asarray(
            pallas_spectrogram(x, interpret=True, dtype_name="bfloat16")
        )
        rel = np.abs(got16 - ref).max() / np.abs(ref).max()
        assert rel < 3e-3, rel
        # bf16x3 (the serving default) must stay inside the measured
        # kNN-stability budget (1e-4 flips nothing; see kernel docstring)
        got3 = np.asarray(
            pallas_spectrogram(x, interpret=True, dtype_name="bf16x3")
        )
        rel3 = np.abs(got3 - ref).max() / np.abs(ref).max()
        assert rel3 < 2e-5, rel3


def test_pallas_knn_matches_xla(rng):
    """Fused VMEM-resident kNN kernel vs ops/retrieval.py: fp32 exact on
    all metrics + alpha blend; bf16x3 keeps the SELECTION bit-stable (its
    only deviation is bf16 quantisation of the gathered dictionary rows,
    bounded far below a neighbour flip's O(1) error)."""
    from tinyvc_tpu.ops.pallas.knn import pallas_match_features
    from tinyvc_tpu.ops.retrieval import match_features

    B, T, C, N = 2, 100, 768, 300
    src = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    ref = jnp.asarray(rng.standard_normal((N, C)).astype(np.float32))
    for metric in ("cos", "IP", "L2"):
        for alpha in (0.0, 0.5):
            want = np.asarray(
                match_features(
                    src, jnp.broadcast_to(ref[None], (B, N, C)),
                    k=4, alpha=alpha, metric=metric,
                )
            )
            got = np.asarray(
                pallas_match_features(
                    src, ref, k=4, alpha=alpha, metric=metric,
                    interpret=True, dtype_name="float32",
                )
            )
            np.testing.assert_allclose(
                got, want, atol=5e-4, err_msg=f"{metric}/{alpha}"
            )
            got3 = np.asarray(
                pallas_match_features(
                    src, ref, k=4, alpha=alpha, metric=metric,
                    interpret=True, dtype_name="bf16x3",
                )
            )
            # bf16 dictionary-row quantisation only — no neighbour flips
            assert np.abs(got3 - want).max() < 0.02, (metric, alpha)


def test_pallas_noise_matches_istft(rng):
    """Fused noise kernel vs oscillate_noise given the same explicit
    angles: exact (fp32). Hash-phase mode: correct scale + determinism."""
    import math

    from tinyvc_tpu.models.decoder import oscillate_noise
    from tinyvc_tpu.ops.pallas.noise import pallas_oscillate_noise

    B, F, bins = 2, 100, 961
    mag = jnp.asarray(
        np.abs(rng.standard_normal((B, F, bins))).astype(np.float32)
    )
    ang = jnp.asarray(
        rng.uniform(-math.pi, math.pi, (B, F, bins)).astype(np.float32)
    )
    want = np.asarray(
        oscillate_noise(mag, jax.random.PRNGKey(0), 480, 1920, angle=ang)
    )
    got = np.asarray(
        pallas_oscillate_noise(
            mag, 7, angle=ang, interpret=True, dtype_name="float32"
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5)

    h1 = np.asarray(
        pallas_oscillate_noise(mag, 7, interpret=True, dtype_name="float32")
    )
    h2 = np.asarray(
        pallas_oscillate_noise(mag, 7, interpret=True, dtype_name="float32")
    )
    h3 = np.asarray(
        pallas_oscillate_noise(mag, 8, interpret=True, dtype_name="float32")
    )
    np.testing.assert_array_equal(h1, h2)  # same seed -> same stream
    assert np.abs(h1 - h3).max() > 1e-3  # different seed -> different noise
    assert 0.9 < h1.std() / want.std() < 1.1  # same synthesis scale
