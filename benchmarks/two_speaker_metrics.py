"""Target-similarity metrics for the two-speaker A->B conversion experiment.

Every prior quality number in this repo was log-mel L1 *vs the source* — a
metric a perfect identity function would ace, incapable of distinguishing
voice CONVERSION from resynthesis (round-4 verdict, Missing #1). This
script measures movement *toward the target speaker* using the procedural
corpus' oracle ground truth (benchmarks/gen_synth_dataset.py writes
per-utterance vowel spans + f0 contours, and the eval set is PARALLEL:
the same content rendered by both speakers):

1. f0: median voiced f0 of the converted output vs speaker A (source) and
   speaker B (target) corpus statistics, in semitones.
2. Speaker envelope proximity: raw low-order MFCCs (NO cepstral mean
   normalisation — here the per-speaker envelope bias IS the signal) of
   each converted voiced frame, nearest-neighbour distance into disjoint-
   content A-corpus vs B-corpus frame sets. A converted utterance must sit
   closer to B's frames than to A's; the unconverted source (copy-input
   baseline) sits closer to A's.
3. Parallel-rendition mel-L1: log-mel L1 of the output against the TARGET
   speaker's own rendition of the same content (frame-aligned by
   construction) vs against the source rendition, with the A-vs-B
   rendition distance as the scale calibration the old "vs source" numbers
   never had.
4. Content preservation: each output frame is labelled by its nearest
   neighbour in the (oracle-vowel-labelled) B training corpus, in the
   speaker-normalised content space (train/teacher.py::MFCCTeacher), and
   compared to the SOURCE utterance's oracle vowel track.
5. Formants: median voiced F1/F2 via LPC root-finding — the output's
   formants should land on B's warped table, not A's.

Usage:
  python benchmarks/two_speaker_metrics.py \
      --eval-a runs_r05/data/eval_A --eval-b runs_r05/data/eval_B \
      --converted runs_r05/out_shift --corpus-a runs_r05/data/raw_A \
      --corpus-b runs_r05/data/raw_B -o runs_r05/metrics_shift.json
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SR = 24000
HOP = 480  # 50 fps — matches the generator metadata and the model frame rate


# ---------------------------------------------------------------------------
# feature helpers
# ---------------------------------------------------------------------------

def _frame(x, n_fft=1024, hop=HOP):
    pad = n_fft // 2
    x = np.pad(x.astype(np.float64), (pad, pad), mode="reflect")
    n = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n)[:, None]
    return x[idx]


def speaker_mfcc(wave, n_mels=40, n_mfcc=13):
    """Raw (un-normalised) low-order MFCCs: the SPEAKER-axis feature.
    c1..c12 carry the spectral envelope incl. the per-speaker formant
    bias that CMVN would remove."""
    from tinyvc_tpu.dsp.mel import mel_filterbank

    fb = mel_filterbank(SR, 1024, n_mels, 0.0, 12000.0).astype(np.float64)
    frames = _frame(wave) * np.hanning(1025)[:-1]
    lm = np.log(np.abs(np.fft.rfft(frames, axis=-1)) ** 2 @ fb + 1e-6)
    k = np.arange(n_mels)
    dct = np.cos(np.pi / n_mels * (k[None, :] + 0.5) * np.arange(n_mfcc)[:, None])
    dct[0] *= 1 / np.sqrt(2)
    dct = dct * np.sqrt(2.0 / n_mels)
    return (lm @ dct[1:].T).astype(np.float32)  # [F, n_mfcc-1]


def lpc_formants(wave, f0_track):
    """Median (F1, F2) over voiced frames via LPC root-finding at 8 kHz."""
    from scipy.signal import decimate, lfilter
    from scipy.linalg import solve_toeplitz

    x = decimate(wave.astype(np.float64), 3)
    sr = SR // 3
    x = lfilter([1.0, -0.97], [1.0], x)
    win, hop = int(0.025 * sr), sr // 50  # 50 fps to match f0_track
    order = 10
    f1s, f2s = [], []
    for fi in range(min(len(f0_track), (len(x) - win) // hop)):
        if f0_track[fi] <= 0:
            continue
        seg = x[fi * hop: fi * hop + win] * np.hamming(win)
        if (seg ** 2).sum() < 1e-8:
            continue
        r = np.correlate(seg, seg, "full")[win - 1: win + order]
        if r[0] <= 0:
            continue
        try:
            a = solve_toeplitz((r[:-1], r[:-1]), -r[1:])
        except np.linalg.LinAlgError:
            continue
        roots = np.roots(np.concatenate([[1.0], a]))
        roots = roots[np.imag(roots) > 0.01]
        freqs = np.angle(roots) * sr / (2 * np.pi)
        bws = -np.log(np.abs(roots)) * sr / np.pi
        cand = sorted(f for f, b in zip(freqs, bws) if 150 < f < 3500 and b < 600)
        if len(cand) >= 2:
            f1s.append(cand[0])
            f2s.append(cand[1])
    if not f1s:
        return None, None
    return float(np.median(f1s)), float(np.median(f2s))


def yin_f0(waves):
    """Batched YIN through the framework's own estimator (CPU)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tinyvc_tpu.dsp.f0 import estimate_f0

    return np.asarray(estimate_f0(jnp.asarray(np.stack(waves))))


def mel_l1(a, b):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tinyvc_tpu.train.losses import log_mel_loss

    n = min(len(a), len(b))
    return float(log_mel_loss(jnp.asarray(a[None, :n]), jnp.asarray(b[None, :n])))


# ---------------------------------------------------------------------------
# corpus loading
# ---------------------------------------------------------------------------

def load_utts(d):
    from tinyvc_tpu.utils.audio_io import load_audio

    out = []
    for wav in sorted(glob.glob(os.path.join(d, "*.wav"))):
        w, sr = load_audio(wav)
        assert sr == SR, (wav, sr)
        meta_path = wav[:-4] + ".json"
        meta = json.load(open(meta_path)) if os.path.exists(meta_path) else None
        out.append((os.path.basename(wav), w.mean(axis=0), meta))
    return out


def vowel_track(meta, n):
    v = np.full(n, -1, np.int32)
    hop_s = HOP / SR
    for s in meta["vowel_spans"]:
        lo, hi = int(s["start"] / hop_s), int(s["end"] / hop_s)
        v[lo:min(hi, n)] = s["vowel"]
    return v


def corpus_frames(utts, feat_fn, stride=1, max_frames=60000):
    """Stack per-frame features + oracle vowel labels + voiced mask."""
    feats, vows = [], []
    for _, w, meta in utts:
        f = feat_fn(w)
        v = vowel_track(meta, len(f))
        f0 = np.array(meta["f0"], np.float32)
        voiced = np.zeros(len(f), bool)
        n = min(len(f0), len(f))
        voiced[:n] = f0[:n] > 0
        keep = voiced & (v >= 0)
        feats.append(f[keep][::stride])
        vows.append(v[keep][::stride])
    feats = np.concatenate(feats)[:max_frames]
    vows = np.concatenate(vows)[:max_frames]
    return feats, vows


def nn_dist(queries, keys, chunk=2048):
    """Mean euclidean NN distance from each query into the key set."""
    best = np.full(len(queries), np.inf, np.float64)
    nn = np.zeros(len(queries), np.int64)
    k2 = (keys.astype(np.float64) ** 2).sum(1)
    for lo in range(0, len(queries), chunk):
        q = queries[lo: lo + chunk].astype(np.float64)
        d2 = (q ** 2).sum(1)[:, None] - 2 * q @ keys.T.astype(np.float64) + k2[None]
        j = d2.argmin(1)
        nn[lo: lo + chunk] = j
        best[lo: lo + chunk] = np.sqrt(np.maximum(d2[np.arange(len(q)), j], 0))
    return best, nn


# ---------------------------------------------------------------------------
# main
# ---------------------------------------------------------------------------

def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--eval-a", required=True)
    p.add_argument("--eval-b", required=True)
    p.add_argument("--converted", required=True)
    p.add_argument("--corpus-a", required=True)
    p.add_argument("--corpus-b", required=True)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--corpus-stride", type=int, default=2)
    args = p.parse_args(argv)

    from tinyvc_tpu.train.teacher import MFCCTeacher

    eval_a = load_utts(args.eval_a)
    eval_b = load_utts(args.eval_b)
    conv = {name: w for name, w, _ in load_utts(args.converted)}
    corpus_a = load_utts(args.corpus_a)
    corpus_b = load_utts(args.corpus_b)
    assert len(eval_a) == len(eval_b) and conv, "need parallel eval + output"

    teacher = MFCCTeacher()
    content_fn = lambda w: teacher(w[None])[0]  # noqa: E731

    print("[metrics] building corpus frame sets ...")
    spk_a, _ = corpus_frames(corpus_a, speaker_mfcc, args.corpus_stride)
    spk_b, _ = corpus_frames(corpus_b, speaker_mfcc, args.corpus_stride)
    cont_b, vow_b = corpus_frames(corpus_b, content_fn, args.corpus_stride)

    # corpus f0 medians (oracle)
    def corpus_f0(utts):
        f0 = np.concatenate([np.array(m["f0"]) for _, _, m in utts])
        return float(np.median(f0[f0 > 0]))

    med_a, med_b = corpus_f0(corpus_a), corpus_f0(corpus_b)

    per_utt = []
    for (name, wa, ma), (_, wb, mb) in zip(eval_a, eval_b):
        if name not in conv:
            continue
        wo = conv[name][: len(wa)]
        f0s = yin_f0([wa, wo, wb])
        f0 = {}
        for key, track in zip(("source", "converted", "target_rendition"), f0s):
            v = track[track > 0]
            f0[key] = float(np.median(v)) if v.size else 0.0

        # speaker-axis NN distances (voiced frames only, YIN-gated)
        def voiced_feats(w, track, fn):
            f = fn(w)
            n = min(len(track), len(f))
            return f[:n][track[:n] > 0]

        qo = voiced_feats(wo, f0s[1], speaker_mfcc)
        qa = voiced_feats(wa, f0s[0], speaker_mfcc)
        do_b, _ = nn_dist(qo, spk_b)
        do_a, _ = nn_dist(qo, spk_a)
        da_b, _ = nn_dist(qa, spk_b)
        da_a, _ = nn_dist(qa, spk_a)

        # content preservation: NN vowel decode in the content space
        co = voiced_feats(wo, f0s[1], content_fn)
        _, nn_idx = nn_dist(co, cont_b)
        vo = vowel_track(ma, len(content_fn(wo)))
        n = min(len(f0s[1]), len(vo))
        src_vow = vo[:n][f0s[1][:n] > 0]
        decoded = vow_b[nn_idx]
        mask = src_vow >= 0
        content_acc = float((decoded[: len(src_vow)][mask] == src_vow[mask]).mean())

        f1o, f2o = lpc_formants(wo, f0s[1])
        f1a, f2a = lpc_formants(wa, f0s[0])
        f1b, f2b = lpc_formants(wb, f0s[2])

        per_utt.append(dict(
            utt=name,
            f0_median=f0,
            speaker_nn_dist=dict(
                converted_to_B=float(do_b.mean()),
                converted_to_A=float(do_a.mean()),
                source_to_B=float(da_b.mean()),
                source_to_A=float(da_a.mean()),
            ),
            mel_l1=dict(
                converted_vs_target_rendition=mel_l1(wo, wb),
                converted_vs_source=mel_l1(wo, wa),
                source_vs_target_rendition=mel_l1(wa, wb),
            ),
            content_vowel_acc=content_acc,
            formants=dict(
                converted=[f1o, f2o], source=[f1a, f2a],
                target_rendition=[f1b, f2b],
            ),
        ))
        print(f"[metrics] {name}: f0 {f0['source']:.0f}->{f0['converted']:.0f} "
              f"(B {f0['target_rendition']:.0f}); "
              f"dNN B {do_b.mean():.2f} vs A {do_a.mean():.2f}; "
              f"content acc {content_acc:.2f}")

    def agg(path):
        vals = []
        for u in per_utt:
            v = u
            for k in path:
                v = v[k]
            if v is not None:
                vals.append(v)
        return float(np.mean(vals)) if vals else None

    summary = dict(
        n_utts=len(per_utt),
        corpus_f0_median=dict(A=med_a, B=med_b),
        f0_median=dict(
            source=agg(("f0_median", "source")),
            converted=agg(("f0_median", "converted")),
            target_rendition=agg(("f0_median", "target_rendition")),
        ),
        speaker_nn_dist=dict(
            converted_to_B=agg(("speaker_nn_dist", "converted_to_B")),
            converted_to_A=agg(("speaker_nn_dist", "converted_to_A")),
            source_to_B=agg(("speaker_nn_dist", "source_to_B")),
            source_to_A=agg(("speaker_nn_dist", "source_to_A")),
        ),
        mel_l1=dict(
            converted_vs_target_rendition=agg(("mel_l1", "converted_vs_target_rendition")),
            converted_vs_source=agg(("mel_l1", "converted_vs_source")),
            source_vs_target_rendition=agg(("mel_l1", "source_vs_target_rendition")),
        ),
        content_vowel_acc=agg(("content_vowel_acc",)),
    )
    # headline verdicts
    summary["verdicts"] = dict(
        converted_closer_to_B_than_A=bool(
            summary["speaker_nn_dist"]["converted_to_B"]
            < summary["speaker_nn_dist"]["converted_to_A"]
        ),
        source_closer_to_A_than_B=bool(
            summary["speaker_nn_dist"]["source_to_A"]
            < summary["speaker_nn_dist"]["source_to_B"]
        ),
        converted_mel_closer_to_target_rendition=bool(
            summary["mel_l1"]["converted_vs_target_rendition"]
            < summary["mel_l1"]["converted_vs_source"]
        ),
    )
    out = dict(summary=summary, per_utterance=per_utt)
    with open(args.output, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
