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


# ---------------------------------------------------------------------------
# Two-speaker mode (round 5): procedurally DISTINCT speakers for the A->B
# voice-conversion experiment. Speaker identity = disjoint f0 range +
# warped formant table (vocal-tract-length-style scale) + bandwidth/breath
# character + speaking rate. "Content" (vowel sequence, timing, relative
# f0 contour, noise realisation) is sampled separately from the speaker, so
# the SAME content can be rendered by BOTH speakers — giving ground-truth
# parallel utterances for target-similarity metrics (the reference's
# any-to-one kNN-VC task, /root/reference/README.md:1-16, has no such
# oracle; procedural data buys it for free).
# ---------------------------------------------------------------------------

SPEAKERS = {
    # low voice: slow, darker formants, cleaner phonation
    "A": dict(f0_lo=90.0, f0_hi=150.0, formant_scale=1.0, bw_scale=1.0,
              syllable_rate=3.2, vibrato_hz=4.5, vibrato_depth=0.012,
              breath=0.008, rolloff=1.0),
    # high voice: fast, formants warped up 1.28x (shorter vocal tract),
    # breathier, steeper harmonic rolloff
    "B": dict(f0_lo=195.0, f0_hi=285.0, formant_scale=1.28, bw_scale=1.15,
              syllable_rate=4.8, vibrato_hz=5.6, vibrato_depth=0.022,
              breath=0.02, rolloff=1.35),
}


def sample_content(rng: np.random.Generator, seconds: float,
                   syllable_rate: float) -> dict:
    """Speaker-independent utterance plan. Every stochastic decision lives
    here so ``render_utterance(content, spk)`` is deterministic — rendering
    one content with two speakers yields PARALLEL utterances (same vowels,
    same timing, same relative f0 contour, same noise realisation)."""
    n_syl = max(int(round(seconds * syllable_rate)), 1)
    return dict(
        seconds=float(seconds),
        # relative position of the f0 contour inside the speaker's log-f0
        # range, 8 knots in [0, 1]
        f0_knots=rng.uniform(0.0, 1.0, size=8).tolist(),
        vib_phase=float(rng.uniform(0, 6.28)),
        unvoiced=[
            (float(rng.uniform(0.0, 0.85)), float(rng.uniform(0.08, 0.2)))
            for _ in range(int(rng.integers(1, 4)))
        ],  # (relative start, relative length in seconds/seconds units)
        vowels=[int(rng.integers(0, len(VOWELS))) for _ in range(n_syl)],
        vowel_jit=[(float(rng.uniform(0.95, 1.05)), float(rng.uniform(0.95, 1.05)))
                   for _ in range(n_syl)],
        bursts=[
            (bool(rng.random() < 0.7), int(rng.integers(SR // 50, SR // 16)),
             float(rng.uniform(1500, 4000)))
            for _ in range(n_syl)
        ],
        env_knots=rng.uniform(0.4, 1.0, size=6).tolist(),
        noise_seed=int(rng.integers(0, 2**31 - 1)),
    )


def render_utterance(content: dict, spk: dict):
    """Deterministically render ``content`` in a speaker's voice.

    Returns (wave float32 [n], meta dict). ``meta`` records the oracle
    truth the conversion metrics need: per-vowel spans with rendered
    (F1, F2), the f0 contour at 50 fps, and the unvoiced spans."""
    seconds = content["seconds"]
    n = int(seconds * SR)
    t = np.arange(n) / SR
    nrng = np.random.default_rng(content["noise_seed"])

    # f0: log-interpolate the relative contour into this speaker's range
    rel = np.interp(t, np.linspace(0, seconds, len(content["f0_knots"])),
                    content["f0_knots"])
    f0 = spk["f0_lo"] * (spk["f0_hi"] / spk["f0_lo"]) ** rel
    f0 = f0 * (1.0 + spk["vibrato_depth"]
               * np.sin(2 * np.pi * spk["vibrato_hz"] * t + content["vib_phase"]))
    voiced = np.ones(n, bool)
    for rs, rl in content["unvoiced"]:
        s = int(rs * n)
        voiced[s: s + int(rl * SR)] = False
    phase = 2 * np.pi * np.cumsum(f0 * voiced) / SR
    src = np.zeros(n)
    for h in range(1, 20):
        src += (1.0 / h ** spk["rolloff"]) * np.sin(h * phase)
    src *= voiced

    vowels = content["vowels"]
    n_syl = len(vowels)
    bounds = np.linspace(0, n, n_syl + 1).astype(int)
    out = np.zeros(n)
    spans = []
    # two-pole resonators ring down below -80 dB within ~2k samples at
    # these bandwidths; filtering each syllable segment + tail (instead of
    # a full-length zero-padded copy per syllable) is numerically the same
    # utterance at a fraction of the cost
    tail = 4096
    for i in range(n_syl):
        f1, f2 = VOWELS[vowels[i]]
        j1, j2 = content["vowel_jit"][i]
        f1r = f1 * j1 * spk["formant_scale"]
        f2r = f2 * j2 * spk["formant_scale"]
        s, e = bounds[i], bounds[i + 1]
        seg = np.concatenate([src[s:e], np.zeros(min(tail, n - e))])
        out[s: s + len(seg)] += (
            0.6 * _resonator(seg, f1r, 80.0 * spk["bw_scale"])
            + 0.4 * _resonator(seg, f2r, 120.0 * spk["bw_scale"]))
        spans.append(dict(start=s / SR, end=e / SR, vowel=vowels[i],
                          f1=float(f1r), f2=float(f2r)))
        has_burst, blen, bfreq = content["bursts"][i]
        if i and has_burst:
            burst = nrng.normal(0, 1, blen) * np.hanning(blen)
            out[s: s + blen] += 0.15 * _resonator(burst, bfreq, 600.0)[:blen]
    out += spk["breath"] * nrng.normal(0, 1, n)
    env = np.interp(t, np.linspace(0, seconds, len(content["env_knots"])),
                    content["env_knots"])
    out *= env
    peak = np.abs(out).max()
    wave = (0.6 * out / max(peak, 1e-6)).astype(np.float32)

    hop = SR // 50  # 50 fps, matches the model frame rate
    f0_frames = np.where(voiced, f0, 0.0)[::hop][: n // hop]
    meta = dict(
        seconds=seconds,
        vowel_spans=spans,
        unvoiced=[(float(rs), float(rl)) for rs, rl in content["unvoiced"]],
        f0_fps=50,
        f0=np.round(f0_frames, 2).tolist(),
    )
    return wave, meta


def write_speaker_set(out_dir: str, speaker: str, n_files: int,
                      seconds: float, seed: int, rate: float = None):
    """n_files utterances of one speaker, with oracle uttXXX.json metadata."""
    import json

    from tinyvc_tpu.utils.audio_io import save_wav

    spk = SPEAKERS[speaker]
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n_files):
        content = sample_content(rng, seconds, rate or spk["syllable_rate"])
        wave, meta = render_utterance(content, spk)
        meta["speaker"] = speaker
        save_wav(os.path.join(out_dir, f"utt{i:03d}.wav"), wave, SR)
        with open(os.path.join(out_dir, f"utt{i:03d}.json"), "w") as f:
            json.dump(meta, f)
    print(f"wrote {n_files} x {seconds}s speaker-{speaker} utterances to {out_dir}")


def write_parallel_set(out_a: str, out_b: str, n_files: int, seconds: float,
                       seed: int, rate: float = 4.0):
    """Parallel eval pairs: the SAME content rendered by A and by B at a
    shared syllable rate (so frames align across renditions). These are the
    ground-truth targets for the conversion metrics: convert(A_i) should
    move toward B_i."""
    import json

    from tinyvc_tpu.utils.audio_io import save_wav

    os.makedirs(out_a, exist_ok=True)
    os.makedirs(out_b, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n_files):
        content = sample_content(rng, seconds, rate)
        for name, out_dir in (("A", out_a), ("B", out_b)):
            wave, meta = render_utterance(content, SPEAKERS[name])
            meta["speaker"] = name
            meta["pair_id"] = i
            save_wav(os.path.join(out_dir, f"utt{i:03d}.wav"), wave, SR)
            with open(os.path.join(out_dir, f"utt{i:03d}.json"), "w") as f:
                json.dump(meta, f)
    print(f"wrote {n_files} parallel A/B pairs ({seconds}s, shared rate "
          f"{rate}/s) to {out_a} / {out_b}")


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    argv = sys.argv[1:]
    if "--pair" in argv:  # gen_synth_dataset.py --pair OUT_A OUT_B [n] [secs] [--seed N]
        seed = int(argv[argv.index("--seed") + 1]) if "--seed" in argv else 777
        skip = {argv.index("--seed") + 1} if "--seed" in argv else set()
        pos = [a for i, a in enumerate(argv)
               if not a.startswith("--") and i not in skip]
        out_a, out_b = pos[0], pos[1]
        n_files = int(pos[2]) if len(pos) > 2 else 8
        seconds = float(pos[3]) if len(pos) > 3 else 6.0
        write_parallel_set(out_a, out_b, n_files, seconds, seed)
        return
    if "--speaker" in argv:  # gen_synth_dataset.py OUT [n] [secs] --speaker A [--seed N]
        speaker = argv[argv.index("--speaker") + 1]
        seed = int(argv[argv.index("--seed") + 1]) if "--seed" in argv else 2024
        skip = {argv.index("--speaker") + 1}
        if "--seed" in argv:
            skip.add(argv.index("--seed") + 1)
        pos = [a for i, a in enumerate(argv)
               if not a.startswith("--") and i not in skip]
        out_dir = pos[0]
        n_files = int(pos[1]) if len(pos) > 1 else 32
        seconds = float(pos[2]) if len(pos) > 2 else 16.0
        write_speaker_set(out_dir, speaker, n_files, seconds, seed)
        return

    # legacy single-voice modes (kept byte-identical: the r4 runs of record
    # and demo/ provenance cite these with seed 2024)
    args = [a for a in argv if a != "--formants"]
    formants = "--formants" in argv
    out_dir = args[0]
    n_files = int(args[1]) if len(args) > 1 else 32
    seconds = float(args[2]) if len(args) > 2 else 16.0
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
