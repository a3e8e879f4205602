"""Procedural raw-audio generator for training burn-ins.

Emits voice-like WAVs with time-varying f0 (glides and vibrato across
80-400 Hz) so `cli/preprocess.py` can build a real dataset cache with no
external data — the input side of the reference's `preprocess.py:29-70`
workflow. Used by the round-4 on-chip 10k-step burn-in (TRAIN_RUN_r04.json).

``--formants`` shapes the harmonic source through a sequence of two-formant
vowel resonators (a/e/i/o/u-like F1/F2 pairs, 4 Hz "syllable" rate, gentle
consonant-ish noise bursts at vowel boundaries) — still fully procedural,
but with the spectral-envelope structure a vocoder actually has to learn.

Usage: python benchmarks/gen_synth_dataset.py OUT_DIR [n_files]
       [secs_per_file] [--formants]
"""

import os
import sys

import numpy as np

SR = 24000

# two-formant vowel targets (F1, F2) in Hz — coarse a/e/i/o/u
VOWELS = [(800, 1200), (500, 1900), (300, 2300), (450, 900), (350, 750)]


def _resonator(x: np.ndarray, freq: float, bw: float) -> np.ndarray:
    """Two-pole resonator (digital formant filter)."""
    from scipy.signal import lfilter

    r = np.exp(-np.pi * bw / SR)
    theta = 2 * np.pi * freq / SR
    a = [1.0, -2 * r * np.cos(theta), r * r]
    b = [1.0 - r]
    return lfilter(b, a, x)


def synth_voiced_utterance(rng: np.random.Generator, seconds: float) -> np.ndarray:
    """Formant-filtered glottal-ish source: vowel sequence at ~4 Hz with
    noise bursts at transitions."""
    n = int(seconds * SR)
    t = np.arange(n) / SR
    knots = rng.uniform(90.0, 280.0, size=8)
    f0 = np.interp(t, np.linspace(0, seconds, 8), knots)
    f0 = f0 * (1.0 + 0.015 * np.sin(2 * np.pi * 5.0 * t + rng.uniform(0, 6.28)))
    voiced = np.ones(n, bool)
    for _ in range(rng.integers(1, 4)):
        s = rng.integers(0, max(n - SR // 4, 1))
        voiced[s : s + rng.integers(SR // 10, SR // 4)] = False
    phase = 2 * np.pi * np.cumsum(f0 * voiced) / SR
    # impulse-train-ish glottal source: rich harmonics with 1/h rolloff
    src = np.zeros(n)
    for h in range(1, 20):
        src += (1.0 / h) * np.sin(h * phase)
    src *= voiced

    # ~4 syllables/s vowel sequence; crossfaded formant tracks
    syl = max(int(seconds * 4), 1)
    bounds = np.linspace(0, n, syl + 1).astype(int)
    out = np.zeros(n)
    for i in range(syl):
        f1, f2 = VOWELS[rng.integers(0, len(VOWELS))]
        j1 = f1 * rng.uniform(0.9, 1.1)
        j2 = f2 * rng.uniform(0.9, 1.1)
        s, e = bounds[i], bounds[i + 1]
        seg = np.zeros(n)
        seg[s:e] = src[s:e]
        out += 0.6 * _resonator(seg, j1, 80.0) + 0.4 * _resonator(seg, j2, 120.0)
        # consonant-ish aspiration burst at the boundary
        if i and rng.random() < 0.7:
            bl = rng.integers(SR // 50, SR // 16)
            burst = rng.normal(0, 1, bl) * np.hanning(bl)
            out[s : s + bl] += 0.15 * _resonator(
                np.pad(burst, (0, 0)), rng.uniform(1500, 4000), 600.0
            )[:bl]
    out += 0.01 * rng.normal(0, 1, n)  # breath floor
    env = np.interp(t, np.linspace(0, seconds, 6), rng.uniform(0.4, 1.0, 6))
    out *= env
    peak = np.abs(out).max()
    return (0.6 * out / max(peak, 1e-6)).astype(np.float32)


def synth_utterance(rng: np.random.Generator, seconds: float) -> np.ndarray:
    n = int(seconds * SR)
    t = np.arange(n) / SR
    # piecewise-linear f0 contour through random targets in 80-400 Hz,
    # plus 5 Hz vibrato; short unvoiced gaps where f0 -> 0
    knots = rng.uniform(80.0, 400.0, size=8)
    f0 = np.interp(t, np.linspace(0, seconds, 8), knots)
    f0 = f0 * (1.0 + 0.02 * np.sin(2 * np.pi * 5.0 * t + rng.uniform(0, 6.28)))
    voiced = np.ones(n, bool)
    for _ in range(rng.integers(1, 4)):
        s = rng.integers(0, max(n - SR // 4, 1))
        voiced[s : s + rng.integers(SR // 10, SR // 4)] = False
    phase = 2 * np.pi * np.cumsum(f0 * voiced) / SR
    wave = np.zeros(n)
    for h in range(1, 9):
        amp = 0.5 / h * rng.uniform(0.5, 1.0)
        wave += amp * np.sin(h * phase)
    wave *= voiced
    # breath noise, lowpassed by a crude moving average
    noise = rng.normal(0, 1, n)
    k = 9
    noise = np.convolve(noise, np.ones(k) / k, mode="same")
    wave += 0.03 * noise + 0.1 * noise * (~voiced)
    # slow amplitude envelope
    env = np.interp(t, np.linspace(0, seconds, 6), rng.uniform(0.3, 1.0, 6))
    wave *= env
    peak = np.abs(wave).max()
    return (0.6 * wave / max(peak, 1e-6)).astype(np.float32)


def main():
    args = [a for a in sys.argv[1:] if a != "--formants"]
    formants = "--formants" in sys.argv
    out_dir = args[0]
    n_files = int(args[1]) if len(args) > 1 else 32
    seconds = float(args[2]) if len(args) > 2 else 16.0
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tinyvc_tpu.utils.audio_io import save_wav

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(2024)
    synth = synth_voiced_utterance if formants else synth_utterance
    for i in range(n_files):
        save_wav(os.path.join(out_dir, f"utt{i:03d}.wav"),
                 synth(rng, seconds), SR)
    kind = "formant-voiced" if formants else "harmonic"
    print(f"wrote {n_files} x {seconds}s {kind} utterances to {out_dir}")


if __name__ == "__main__":
    main()
