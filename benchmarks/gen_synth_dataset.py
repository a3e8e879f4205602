"""Procedural raw-audio generator for training burn-ins.

Emits harmonic+noise WAVs with time-varying f0 (glides and vibrato across
80-400 Hz) so `cli/preprocess.py` can build a real dataset cache with no
external data — the input side of the reference's `preprocess.py:29-70`
workflow. Used by the round-4 on-chip 10k-step burn-in (TRAIN_RUN_r04.json).

Usage: python benchmarks/gen_synth_dataset.py OUT_DIR [n_files] [secs_per_file]
"""

import os
import sys

import numpy as np

SR = 24000


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
    out_dir = sys.argv[1]
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    seconds = float(sys.argv[3]) if len(sys.argv) > 3 else 16.0
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tinyvc_tpu.utils.audio_io import save_wav

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(2024)
    for i in range(n_files):
        save_wav(os.path.join(out_dir, f"utt{i:03d}.wav"),
                 synth_utterance(rng, seconds), SR)
    print(f"wrote {n_files} x {seconds}s synthetic utterances to {out_dir}")


if __name__ == "__main__":
    main()
